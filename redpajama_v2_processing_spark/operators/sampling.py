"""Sampling / repartitioning utilities.

The reference downsamples with python `random.sample` over row-group
slices (src/downsample_parquet.py:15-47) and "shuffles" by rewriting files
(src/shuffle_dataset.py:31-45). Spark-side:

* ``hash_sample`` — deterministic, engine-portable sampling by hash-mod on
  a key (used by oracle-checked queries and for reproducible threshold
  sampling);
* ``seeded_sample`` — Bernoulli `df.sample` (statistical path);
* ``spread`` — `repartition(n, rand-free key)`: the reference's manual
  127-shard fan-out (src/shard_parquet.py:50) is just a partition count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5int


def hash_sample(df: DataFrame, key_col: str, one_in: int, salt: str = "s") -> DataFrame:
    """Keep rows where md5int(salt || key) % one_in == 0 (deterministic)."""
    h = md5int(F.concat(F.lit(salt), F.lit(":"), F.col(key_col).cast("string")))
    return df.where(F.pmod(h, F.lit(one_in)) == 0)


def lang_ratio_downsample(
    df: DataFrame,
    ratios: dict[str, float] | None = None,
    key_col: str = "doc_id",
    lang_col: str = "lang",
    salt: str = "ds",
    default_ratio: float | None = None,
    denom: int = 1_000_000,
) -> DataFrame:
    """Per-language ratio downsample (the reference's per-lang seeded
    random.sample, src/downsample_parquet.py:16-20,40) — deterministic by
    key hash instead of RNG state: keep iff hash(key) mod denom falls below
    ratio*denom for the row's language. Engine-portable, shard-count
    independent, and resumable (re-runs keep the identical rows).
    """
    from ..config import DOWNSAMPLE_DEFAULT_RATIO, LANG_DOWNSAMPLE_RATIOS

    if ratios is None:
        ratios = LANG_DOWNSAMPLE_RATIOS
    if default_ratio is None:
        default_ratio = DOWNSAMPLE_DEFAULT_RATIO
    h = F.pmod(
        md5int(F.concat(F.lit(salt), F.lit(":"), F.col(key_col).cast("string"))),
        F.lit(denom),
    )
    thr = F.lit(int(round(default_ratio * denom)))
    for lang, r in sorted(ratios.items()):
        thr = F.when(F.col(lang_col) == lang, F.lit(int(round(r * denom)))).otherwise(thr)
    return df.where(h < thr)


def seeded_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def spread(df: DataFrame, n: int, key_col: str | None = None) -> DataFrame:
    return df.repartition(n, F.col(key_col)) if key_col else df.repartition(n)


def shuffle_rows(df: DataFrame, seed: int = 66) -> DataFrame:
    """Seeded full-row shuffle (the reference's buffered HF shuffle,
    src/shuffle_dataset.py:31-45, seed=66). Only needed when downstream
    consumers are order-sensitive — the engine's own operators are not."""
    return df.orderBy(F.rand(seed))


def domain_cap(
    df: DataFrame,
    id_col: str,
    domain_col: str = "source",
    cap: int = 40,
    n_salts: int = 32,
) -> DataFrame:
    """Keep at most ``cap`` documents per domain (smallest ids win) —
    the crawl-bias control that stops one hot host from dominating a
    training mix.

    Skew-safe plan (no full-row window over the domain key, which would
    push every row of the hottest host through one reducer):

    1. pre-aggregate per-domain counts; the over-cap domain list is tiny
       (bounded by distinct hosts / cap) and BROADCASTS;
    2. rows of under-cap domains pass through untouched (broadcast
       anti-join — the bulk of a web corpus, zero shuffle);
    3. over-cap rows rank inside (domain, hash-salt) groups — ``n_salts``
       parallel reducers per hot domain, each emitting at most ``cap``
       survivors (the global top-cap is a subset of the union of per-salt
       top-caps, so this prune is exact);
    4. the final window ranks <= n_salts * cap rows per domain — constant
       work regardless of how hot the domain is.

    Result is identical to the naive single-window formulation (rank by
    id is deterministic); only the physical plan differs.
    """
    from pyspark.sql import Window

    counts = df.groupBy(domain_col).agg(F.count("*").alias("_n"))
    over = counts.where(F.col("_n") > cap).select(domain_col)

    under_rows = df.join(F.broadcast(over), domain_col, "left_anti")
    hot_rows = df.join(F.broadcast(over), domain_col, "left_semi")

    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts))
    w_salt = Window.partitionBy(domain_col, "_salt").orderBy(F.col(id_col).asc())
    pruned = (
        hot_rows.withColumn("_salt", salt)
        .withColumn("_srk", F.row_number().over(w_salt))
        .where(F.col("_srk") <= cap)
        .drop("_srk", "_salt")
    )
    w_final = Window.partitionBy(domain_col).orderBy(F.col(id_col).asc())
    capped = (
        pruned.withColumn("_rk", F.row_number().over(w_final))
        .where(F.col("_rk") <= cap)
        .drop("_rk")
    )
    return under_rows.unionByName(capped)


def domain_blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    domain_col: str = "source",
    block_domain_col: str = "domain",
) -> DataFrame:
    """Drop documents whose domain appears in a blocklist table (the
    UT1-adult-list-style control). Left-anti join; the blocklist is tiny
    so AQE broadcasts it — the corpus never shuffles."""
    b = blocklist.select(F.col(block_domain_col).alias(domain_col)).distinct()
    return df.join(F.broadcast(b), domain_col, "left_anti")
