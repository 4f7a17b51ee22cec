"""FineWeb-style custom quality filters (Penedo et al. 2024, the public
HF FineWeb recipe), re-expressed as native Spark relational algebra.

FineWeb's three published additions beyond Gopher/C4 (thresholds are the
paper's, tuned on real web pages):

* fraction of lines ending in punctuation < 0.12 -> drop;
* fraction of characters inside duplicated lines > 0.10 -> drop
  (ALL occurrences of a line whose content appears more than once — a
  deliberately different mass than Gopher's occurrences-after-first in
  ``signals.duplicate_line_signals``);
* fraction of lines shorter than 30 characters >= 0.67 -> drop.

Plan shape: one posexplode of the line split, one two-level grouped
aggregation (map-side combinable, single shuffle on the doc id) that
yields all three fractions together — the same relational idiom as
``duplicate_line_signals``, chosen over per-row higher-order functions
because a nested filter-inside-aggregate formulation is O(lines^2) per
doc and evaluates interpreted. Contract (mirrored by the DuckDB twin
``oracle.q_fineweb_filter``): lines = split(text, '\\n') INCLUDING
empties; empty docs score 0.0 on every fraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .signals import ratio6
from .text import lines

FW_PUNCT_FRAC_MIN = 0.12
FW_DUP_CHAR_FRAC_MAX = 0.10
FW_SHORT_LINE_LEN = 30
FW_SHORT_FRAC_MAX = 0.67
_TERMINAL = r'[.!?"]\s*$'


def fineweb_filter(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """DF(id, punct_line_frac, short_line_frac, dup_line_char_frac,
    keep): every doc with its FineWeb signals and the composite keep
    verdict — signals stay in the output so drops are auditable (the
    same emit-then-filter shape as quality_filter)."""
    ln = df.select(
        F.col(id_col).alias("id"), F.explode(lines(F.col(text_col))).alias("_l")
    )
    grouped = ln.groupBy("id", "_l").agg(
        F.count("*").alias("_c"),
        F.length("_l").alias("_len"),
        F.max(F.col("_l").rlike(_TERMINAL).cast("int")).alias("_punct"),
    )
    agg = grouped.groupBy("id").agg(
        F.sum("_c").alias("_n"),
        F.sum(F.col("_c") * F.col("_punct")).alias("_np"),
        F.sum(F.col("_c") * (F.col("_len") < FW_SHORT_LINE_LEN).cast("int")).alias("_ns"),
        F.sum(F.col("_len") * F.col("_c")).alias("_tchar"),
        F.sum(
            F.when(F.col("_c") > 1, F.col("_len") * F.col("_c")).otherwise(F.lit(0))
        ).alias("_dchar"),
    )
    sig = agg.select(
        "id",
        ratio6(F.col("_np"), F.col("_n")).alias("punct_line_frac"),
        ratio6(F.col("_ns"), F.col("_n")).alias("short_line_frac"),
        ratio6(F.col("_dchar"), F.col("_tchar")).alias("dup_line_char_frac"),
    )
    ids = df.select(F.col(id_col).alias("id"))
    filled = ids.join(sig, "id", "left").select(
        "id",
        F.coalesce("punct_line_frac", F.lit(0.0)).alias("punct_line_frac"),
        F.coalesce("short_line_frac", F.lit(0.0)).alias("short_line_frac"),
        F.coalesce("dup_line_char_frac", F.lit(0.0)).alias("dup_line_char_frac"),
    )
    keep = (
        (F.col("punct_line_frac") >= FW_PUNCT_FRAC_MIN)
        & (F.col("dup_line_char_frac") <= FW_DUP_CHAR_FRAC_MAX)
        & (F.col("short_line_frac") < FW_SHORT_FRAC_MAX)
    )
    return filled.select("*", keep.alias("keep"))
