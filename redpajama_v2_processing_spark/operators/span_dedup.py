"""Corpus-wide duplicated-span removal (C4's "three-sentence span" rule).

C4 (Raffel et al. 2020, public paper) removes every occurrence but one of
any span of three consecutive sentences duplicated anywhere in the corpus
— the cross-document complement of the within-doc line dedup
(``functions/signals.dedup_lines``) and the document-level keep-lists
(MinHash / SimHash / winnowing families), operating at sub-document
granularity WITHOUT dropping whole documents.

Units here are LINES (the engine's portable text unit — a production
deployment plugs a sentence splitter into ``lines`` upstream; the fixture
corpus carries no sentence punctuation, so queries synthesize page-shaped
text exactly like ``queries.q_c4_filter``). A span is ``n`` consecutive
lines.

Deterministic rule (engine-portable, oracle-checked):

* span hash = md5int over the ``n`` lines joined with a 0x01 separator;
* the GLOBAL FIRST occurrence of a duplicated span is min doc id, then
  min start position inside that doc;
* every line belonging to any NON-FIRST occurrence of a duplicated span
  is removed; survivors are rejoined in original order.

Plan shape (all JVM-native, no windows, no per-row Python):

* posexplode lines -> zip_with span frame (linear, same formulation as
  ``word_ngrams``) -> one grouped count + one grouped two-level min (the
  duplicated-span table, tiny vs the corpus: bounded by the duplicated
  mass, and broadcast by AQE);
* one join back marks removed occurrences; ``explode(sequence(p, p+n-1))``
  expands them to line positions (<= n rows per removed span);
* one anti-join + per-doc rebuild aggregation (map-side combinable).

At 100 TB: the span frame is the corpus-sized side and is shuffled once
for the count (map-side partial agg on the hash); the duplicated-span
list is the only state that persists — the same asymptotics as exact
dedup. A hot boilerplate span (cookie banners) produces ONE duplicated
hash row regardless of its millions of occurrences; the removal join keys
on the hash, so AQE's skew split handles the fan-out side.

Reference scope note: the reference pipeline dedups whole documents only
(minhashlsh_*.py); span-level hygiene is part of the engine-native
LLM-pipeline tier (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5int
from ..functions.text import lines

SPAN_N = 3  # C4's span length (three sentences; three lines here)
_SEP = "\x01"


def span_frame(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = SPAN_N
) -> DataFrame:
    """DF(id, p, h): one row per n-line span — start position ``p`` (0-based
    line index) and span hash ``h``. Docs with fewer than ``n`` lines emit
    nothing."""
    from ..functions.text import _zip_ngrams

    ln = df.select(
        F.col(id_col).alias("id"),
        lines(F.col(text_col)).alias("_ls"),
    ).where(F.size("_ls") >= n)
    # n-line spans via the shared zip_with n-gram helper (linear under
    # Catalyst; see functions/text._zip_ngrams for why)
    spans = ln.select(
        "id", F.posexplode(_zip_ngrams(F.col("_ls"), n, _SEP)).alias("p", "_s")
    )
    return spans.select("id", "p", md5int(F.col("_s")).alias("h"))


def duplicated_spans(spans: DataFrame) -> DataFrame:
    """DF(h, fid, fp): spans occurring >= 2 times corpus-wide, with the
    global first occurrence (min doc id, then min position in that doc).

    ONE aggregation: min(struct(id, p)) is lexicographic — smallest id,
    ties to the smallest p — exactly the first-occurrence rule; the
    previous two-pass form (grouped min id, join back, grouped min p)
    re-scanned and re-shuffled the span frame (guide §2.4)."""
    return (
        spans.groupBy("h")
        .agg(F.count("*").alias("_n"), F.min(F.struct("id", "p")).alias("_f"))
        .where(F.col("_n") >= 2)
        .select("h", F.col("_f.id").alias("fid"), F.col("_f.p").alias("fp"))
    )


def _remove_and_rebuild(
    df: DataFrame,
    id_col: str,
    units,
    spans: DataFrame,
    n: int,
    joiner: str,
    removed_name: str,
) -> DataFrame:
    """Shared back half of the span/substring dedups: mark every unit
    position covered by a non-first occurrence of a duplicated span,
    anti-join it away, and rejoin survivors in original order.
    ``units`` is the array<string> unit expression (lines or tokens);
    ``spans`` must come from the matching frame builder."""
    dup = duplicated_spans(spans)
    # non-first occurrences -> the n unit positions they cover
    removed = (
        spans.join(dup, "h")
        .where((F.col("id") != F.col("fid")) | (F.col("p") != F.col("fp")))
        .select("id", F.explode(F.sequence(F.col("p"), F.col("p") + n - 1)).alias("pos"))
        .distinct()
    )
    un = df.select(
        F.col(id_col).alias("id"), F.posexplode(units).alias("pos", "_l")
    )
    kept = un.join(removed, ["id", "pos"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "_l"))),
                lambda s: s["_l"],
            ),
            joiner,
        ).alias("clean_text"),
        F.count("*").alias("_kept"),
    )
    # total unit count is size(units) — a narrow projection on the ids
    # frame; the old per-unit groupBy re-aggregated the whole exploded
    # frame and joined it back (one exchange + one join for a value the
    # array length already carries). Null units (null text) -> 0, same as
    # the old left-join coalesce.
    ids = df.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.size(units), F.lit(0)).alias("_all"),
    )
    return (
        ids.join(rebuilt, "id", "left")
        .select(
            "id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            (
                F.col("_all") - F.coalesce("_kept", F.lit(0))
            ).cast("long").alias(removed_name),
        )
    )


def span_dedup(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = SPAN_N
) -> DataFrame:
    """DF(id, clean_text, n_removed_lines): every non-first occurrence of
    a corpus-duplicated n-line span removed, survivors rejoined in order.

    The span frame feeds the duplicate detection AND the removal join, so
    it is checkpointed once (Catalyst does not share subplans)."""
    spans = span_frame(df, id_col, text_col, n).localCheckpoint(eager=True)
    return _remove_and_rebuild(
        df, id_col, lines(F.col(text_col)), spans, n, "\n", "n_removed_lines"
    )


SUBSTR_N = 25  # token-window length (Lee et al. 2022 use 50 BPE tokens;
#                25 whitespace tokens spans comparable text mass)


def substring_frame(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = SUBSTR_N
) -> DataFrame:
    """DF(id, p, h): one row per n-TOKEN window — the ExactSubstr unit
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better"). Docs shorter than n tokens emit nothing."""
    from ..functions.text import _zip_ngrams, tokens

    tk = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_ls")
    ).where(F.size("_ls") >= n)
    spans = tk.select(
        "id", F.posexplode(_zip_ngrams(F.col("_ls"), n, _SEP)).alias("p", "_s")
    )
    return spans.select("id", "p", md5int(F.col("_s")).alias("h"))


def substring_dedup(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = SUBSTR_N
) -> DataFrame:
    """DF(id, clean_text, n_removed_tokens): exact-substring dedup at
    token granularity — every token covered by a non-first occurrence of
    a corpus-duplicated n-token window is removed and the survivors are
    rejoined with single spaces (token-normalized text, same normal form
    the dedup hashed).

    The suffix-array formulation of Lee et al. finds duplicated
    substrings of ANY length >= n; the window formulation marks the same
    token mass for maximal duplicates (a duplicated run of m >= n tokens
    is covered by its m - n + 1 duplicated windows) without a
    corpus-wide suffix sort — each window is one row in an aggregation,
    the same asymptotics as exact dedup. Same scale shape as
    ``span_dedup``; the span frame is checkpointed once.

    Caveat stated, not hidden: a duplicated run shorter than n inside
    otherwise-unique context is below the detection floor (true of the
    suffix-array method at its length threshold too)."""
    from ..functions.text import tokens

    spans = substring_frame(df, id_col, text_col, n).localCheckpoint(eager=True)
    return _remove_and_rebuild(
        df, id_col, tokens(F.col(text_col)), spans, n, " ", "n_removed_tokens"
    )
