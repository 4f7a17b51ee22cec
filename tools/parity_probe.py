"""One-off probe: verify Spark vs DuckDB parity for the primitives the
oracle queries rely on (md5, regex split, percentile interpolation,
rounding, ln, cosine). Not part of the test suite; kept for documentation."""
import duckdb
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
)

CASES = [
    # (name, spark_sql, duck_sql)
    ("md5int",
     "select cast(conv(substr(md5('hello'),1,15),16,10) as bigint) v",
     "select ('0x'||substr(md5('hello'),1,15))::bigint v"),
    ("split_ws",
     r"select split(trim('  a b   c '), '\\s+') v",
     r"select regexp_split_to_array(trim('  a b   c '), '\s+') v"),
    ("pct_linear",
     "select percentile(x, 0.1) v from (select explode(array(1,2,3,4,5,6,7,8,9,10)) x)",
     "select quantile_cont(x, 0.1) v from (select unnest([1,2,3,4,5,6,7,8,9,10]) x)"),
    ("pct_odd",
     "select percentile(x, 0.37) v from (select explode(array(5,1,9,2,7)) x)",
     "select quantile_cont(x, 0.37) v from (select unnest([5,1,9,2,7]) x)"),
    ("round_half",
     "select round(2.675, 2) v, round(0.12345678, 4) w, round(1.5, 0) u",
     "select round(2.675, 2) v, round(0.12345678, 4) w, round(1.5, 0) u"),
    ("ln_ent",
     "select round(-1.0*(0.25*ln(0.25)+0.75*ln(0.75)), 6) v",
     "select round(-1.0*(0.25*ln(0.25)+0.75*ln(0.75)), 6) v"),
    ("regex_email",
     r"select regexp_replace('hi user1@example.com x', '[A-Za-z0-9._%+\\-]+@[A-Za-z0-9.\\-]+\\.[A-Za-z]{2,}', '<EMAIL>') v",
     r"select regexp_replace('hi user1@example.com x', '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') v"),
    ("date_trunc",
     "select date_trunc('hour', timestamp'2026-01-02 03:45:11') v",
     "select date_trunc('hour', timestamp'2026-01-02 03:45:11') v"),
    ("int_div_double",
     "select cast(7 as double)/cast(13 as double) v",
     "select 7::double/13::double v"),
    ("ngrams",
     # char 5-grams of a string via sequence+substr
     "select transform(sequence(1, length('abcdefg')-4), i -> substr('abcdefg', i, 5)) v",
     "select list_transform(range(1, length('abcdefg')-3), i -> substr('abcdefg', i, 5)) v"),
]

for name, ssql, dsql in CASES:
    sv = [tuple(r) for r in spark.sql(ssql).collect()]
    dv = [tuple(r) for r in duckdb.sql(dsql).fetchall()]
    ok = sv == dv
    print(f"{name:14s} {'OK ' if ok else 'MISMATCH'} spark={sv!r} duck={dv!r}")

spark.stop()
