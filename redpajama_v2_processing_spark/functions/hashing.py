"""Hash families: portable (md5-based, reproducible in any engine) and
fast (xxhash64, JVM-native) — used by MinHash, SimHash and fingerprints.

The reference consumes precomputed MinHash signatures
(/root/reference/src/minhashlsh.py:83-101, signature_sim0.8 = 9 band
hashes); this engine computes signatures natively inside Spark SQL
expressions — no UDF, no Python per row.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

# Universal-hash permutation family for MinHash: perm_i(h) =
# (a_i * (h mod 2^32) + b_i) mod P over a 32-bit prime. One base hash per
# shingle string; every permutation is then pure 64-bit integer arithmetic
# (codegen-friendly, ANSI-overflow-safe: a < 2^31 so a*h32 < 2^63), and the
# identical arithmetic runs in DuckDB — so the production plan shape is
# oracle-checkable with an md5 base hash swapped in for xxhash64.
PERM_PRIME = 4294967291  # largest 32-bit prime
_PERM_A_MAX = (1 << 31) - 1


@lru_cache(maxsize=8)
def perm_coeffs(num_perm: int) -> tuple[tuple[int, int], ...]:
    """Deterministic (a_i, b_i) pairs derived from md5 (driver-side, once)."""
    def h(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    return tuple(
        (h(f"a:{i}") % _PERM_A_MAX + 1, h(f"b:{i}") % PERM_PRIME)
        for i in range(num_perm)
    )


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
