"""PII / toxicity scrubbing as a chain of native regexp_replace calls.

JVM-side, codegen-friendly; patterns live in config.PII_PATTERNS and use
the regex-dialect subset common to Java regex (Spark) and RE2 (DuckDB),
so the oracle reproduces the output byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import FLAGGED_WORDS, PII_PATTERNS


def scrub_pii(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    for pattern, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, repl)
    return c


def mask_flagged_words(col: Column | str) -> Column:
    """Replace flagged lexicon words (word-boundary, case-insensitive)."""
    c = F.col(col) if isinstance(col, str) else col
    pattern = r"(?i)\b(" + "|".join(FLAGGED_WORDS) + r")\b"
    return F.regexp_replace(c, pattern, "<FLAGGED>")
