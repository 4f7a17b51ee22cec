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
) -> DataFrame:
    """Keep at most ``cap`` documents per domain (smallest ids win) —
    the crawl-bias control that stops one hot host from dominating a
    training mix. One window shuffle keyed on the domain; a skew-heavy
    corpus at 100 TB would pre-aggregate per-domain counts and only
    window the over-cap domains (the rank is deterministic either way)."""
    from pyspark.sql import Window

    w = Window.partitionBy(domain_col).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= cap)
        .drop("_rk")
    )


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
