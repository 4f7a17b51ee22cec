"""Interop with RedPajama-v2 precomputed MinHash signature parquet.

The reference's actual dedup input is NOT raw text: it is parquet of
pre-banded MinHash signatures, schema
``(shard_id: string, id: string, id_int: uint64, signature: list<binary>)``
(/root/reference/src/minhashlsh_partial.py:148), where the raw files carry
one column per similarity level, ``signature_sim{0.7,0.8,0.9,1.0}``, with
band counts {0.7: 14, 0.8: 9, 0.9: 5, 1.0: 1}
(/root/reference/src/minhashlsh.py:83-101). Element b of the list is band
b's digest; two docs are LSH candidates iff any band position holds the
same digest.

This module reads that layout and runs the engine's band-bucket shuffle +
connected components over the PRE-BANDED signatures — the first thing a
real RPv2 user needs to switch engines without recomputing signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.connected_components import connected_components
from ..operators.minhash_lsh import candidate_edges, salted_bucket_edges

# reference band counts per similarity level (src/minhashlsh.py:101)
RPV2_BAND_COUNTS: dict[str, int] = {"0.7": 14, "0.8": 9, "0.9": 5, "1.0": 1}


def read_rpv2_signatures(
    spark: SparkSession, path: str, sim_level: str = "0.8"
) -> DataFrame:
    """DF(id, id_int, signature) from RPv2 minhash parquet at one sim level.

    Mirrors the reference's rename/select
    (src/minhashlsh.py:83-85: rename signature_sim{level} -> signature,
    select [signature, id, id_int]) as a pruned parquet scan — only the
    chosen level's column is read.
    """
    # backticks: the level's dot would otherwise parse as a struct accessor
    col = f"`signature_sim{sim_level}`"
    return spark.read.parquet(path).select(
        "id", "id_int", F.col(col).alias("signature")
    )


def pre_banded_bands(signatures: DataFrame) -> DataFrame:
    """DF(id, band_idx, band_hash) from DF(..., id_int, signature).

    posexplode over the band list: position = band index (band identity is
    positional in the reference layout). Null signatures (the reference's
    null-signature guard, src/minhashlsh.py:112) produce no band rows, so
    unsignable docs are never candidates — and survive dedup.
    """
    return signatures.select(
        F.col("id_int").alias("id"),
        F.posexplode("signature").alias("band_idx", "band_hash"),
    )


def rpv2_keep_ids(signatures: DataFrame, salted: bool = False) -> DataFrame:
    """DF(id): keep-list (component min id per LSH cluster + singletons)
    over pre-banded signatures — the reference's UnionFind keep rule
    (src/minhashlsh.py:140,169) via distributed CC."""
    bands = pre_banded_bands(signatures)
    edges = salted_bucket_edges(bands) if salted else candidate_edges(bands)
    cc = connected_components(edges)
    ids = signatures.select(F.col("id_int").alias("id"))
    return (
        ids.join(cc, "id", "left")
        .where(F.coalesce("root", F.col("id")) == F.col("id"))
        .select("id")
    )
