"""Hash families: portable (md5-based, reproducible in any engine) and
fast (xxhash64, JVM-native) — used by MinHash, SimHash and fingerprints.

The reference consumes precomputed MinHash signatures
(/root/reference/src/minhashlsh.py:83-101, signature_sim0.8 = 9 band
hashes); this engine computes signatures natively inside Spark SQL
expressions — no UDF, no Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5int(col: Column) -> Column:
    """60-bit bigint from the first 15 hex chars of md5 — the portable
    hash shared with the DuckDB oracle (('0x'||substr(md5(x),1,15))::bigint).
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5int_seeded(seed: Column | int, col: Column) -> Column:
    """Hash family indexed by ``seed``: md5int(seed || ':' || value)."""
    s = F.lit(seed) if isinstance(seed, int) else seed
    return md5int(F.concat(s.cast("string"), F.lit(":"), col))


def xxhash_seeded(seed: Column | int, col: Column) -> Column:
    """Fast JVM-native hash family for the production path."""
    s = F.lit(seed) if isinstance(seed, int) else seed
    return F.xxhash64(s, col)


def minhash_signature(
    shingles: Column, num_perm: int, portable: bool = False
) -> Column:
    """array<bigint> of ``num_perm`` min-hashes over the shingle array.

    Single nested-lambda expression: for each permutation p,
    min over shingles of hash_p(shingle). NULL signature for empty input
    (mirrors the reference's null-signature guard, src/minhashlsh.py:112).
    """
    fam = md5int_seeded if portable else xxhash_seeded
    perms = F.sequence(F.lit(0), F.lit(num_perm - 1))
    sig = F.transform(perms, lambda p: F.array_min(F.transform(shingles, lambda s: fam(p, s))))
    return F.when(F.size(shingles) == 0, F.lit(None).cast("array<bigint>")).otherwise(sig)


def band_hashes(sig: Column, bands: int, rows: int, portable: bool = False) -> Column:
    """array<bigint>: one LSH band hash per band (hash of that band's slice).

    Mirrors the reference's banding (9 bands at sim0.8,
    src/minhashlsh.py:101) but as a native expression. Band b covers
    sig[b*rows+1 .. (b+1)*rows] (1-indexed slice).
    """
    def one(b: Column) -> Column:
        joined = F.concat_ws("|", F.transform(F.slice(sig, b * rows + 1, rows), lambda x: x.cast("string")))
        payload = F.concat(b.cast("string"), F.lit("#"), joined)
        return md5int(payload) if portable else F.xxhash64(payload)

    return F.when(sig.isNull(), F.lit(None).cast("array<bigint>")).otherwise(
        F.transform(F.sequence(F.lit(0), F.lit(bands - 1)), one)
    )


# NOTE: the per-row SimHash is implemented as an explode + hash-aggregate
# plan in operators/simhash_dedup.py (whole-stage codegen), not as a nested
# higher-order expression: Spark evaluates array lambdas interpreted, and
# F.shiftright/shiftleft only take Python-int shift amounts.
