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


def seeded_sample(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def spread(df: DataFrame, n: int, key_col: str | None = None) -> DataFrame:
    return df.repartition(n, F.col(key_col)) if key_col else df.repartition(n)


def shuffle_rows(df: DataFrame, seed: int = 66) -> DataFrame:
    """Seeded full-row shuffle (the reference's buffered HF shuffle,
    src/shuffle_dataset.py:31-45, seed=66). Only needed when downstream
    consumers are order-sensitive — the engine's own operators are not."""
    return df.orderBy(F.rand(seed))
