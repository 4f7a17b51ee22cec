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


#: candidate pattern shared with PII_PATTERNS' <CC> rule (Java + RE2 subset)
CC_CANDIDATE = r"\b(?:\d[ \-]?){13,16}\b"


def luhn_valid(cand: Column) -> Column:
    """Boolean: does a card-number candidate pass the Luhn checksum?

    Pure expression arithmetic over the digit string (right-to-left,
    double every second digit, subtract 9 when the double exceeds 9,
    total divisible by 10). Array lambdas evaluate interpreted — fine
    here because they run per CANDIDATE (rare), never per corpus row.
    """
    clean = F.regexp_replace(cand, r"[ \-]", "")
    n = F.length(clean)

    def contrib(i: Column) -> Column:
        d = F.ascii(clean.substr(n - i + 1, F.lit(1))) - 48
        return F.when(i % 2 == 0, 2 * d - F.when(d >= 5, 9).otherwise(0)).otherwise(d)

    total = F.aggregate(
        F.transform(F.sequence(F.lit(1), n), contrib),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (n >= 13) & (total % 10 == 0)


def scrub_cc_luhn(col: Column | str) -> Column:
    """Replace ONLY Luhn-VALID card-number candidates with ``<CC>``.

    The naive ``scrub_pii`` <CC> rule masks every 13-16-digit run —
    order ids, timestamps and tracking numbers included. Real PII
    pipelines validate the checksum first; this keeps non-validating
    digit runs intact (the false-positive control). Replacement is an
    ``aggregate`` fold of ``replace`` over the distinct valid
    candidates — all native expressions, no Python, no join.
    """
    c = F.col(col) if isinstance(col, str) else col
    # the candidate regex (?:\d[ \-]?){13,16} can consume a TRAILING
    # separator ("4242… 4242 " before "or") — trim it so the <CC> mask
    # never eats the character after the number
    cands = F.transform(
        F.regexp_extract_all(c, F.lit(CC_CANDIDATE), 0),
        lambda s: F.regexp_replace(s, r"[ \-]+$", ""),
    )
    valid = F.filter(F.array_distinct(cands), luhn_valid)

    # DIGIT-boundary replacement: a plain string replace would mask an
    # equal digit substring INSIDE a longer non-validated run elsewhere
    # in the doc, while \b anchors would MISS a letter-glued copy
    # ('ref A4242…' — 'A' and '4' are both word chars) and leak a full
    # valid card number. The boundary that matters is digits only:
    # (^|[^0-9]) … ([^0-9]|$), with the boundary chars captured and
    # reinserted. RE2 (the oracle) has no lookarounds, so the captured-
    # group form is the portable spelling; because group 2 CONSUMES the
    # following char, a second occurrence separated by a single
    # character is invisible to the first pass — two passes are exact
    # (after pass one the survivor's left neighbor is '>', a non-digit).
    # Candidates are [0-9 -] only (guaranteed by the extraction
    # pattern), so concatenating them into a pattern is injection-safe.
    def _rep(acc, cand):
        pat = F.concat(F.lit("(^|[^0-9])"), cand, F.lit("([^0-9]|$)"))
        return F.regexp_replace(acc, pat, F.lit("$1<CC>$2"))

    return F.aggregate(valid, c, lambda acc, cand: _rep(_rep(acc, cand), cand))
