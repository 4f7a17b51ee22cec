"""Hypothesis property gates for the text primitives: the Spark
expressions must agree with an independent pure-Python model of the
contract on arbitrary (ASCII) inputs — catching regex-dialect and
empty/edge-case drift that example tests miss. ASCII alphabet on purpose:
Java's \\s is ASCII-only while Python's str.split is unicode-aware, and
the engine's tokenization contract is defined over the ASCII class."""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from redpajama_v2_processing_spark.config import PII_PATTERNS
from redpajama_v2_processing_spark.functions.scrub import scrub_pii
from redpajama_v2_processing_spark.functions.text import (
    SUBWORD_PATTERN, fingerprint_int, subword_count, tokens, ws_token_count,
)

ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=60,
)
TEXTS = st.lists(ASCII | st.just("") | ASCII.map(lambda s: f" {s}\n\t{s} "),
                 min_size=1, max_size=25)
SETTINGS = dict(max_examples=4, deadline=None)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )


@given(texts=TEXTS)
@settings(**SETTINGS)
def test_tokens_match_python_split(spark, texts):
    got = _df(spark, texts).select("i", F.size(tokens("t")).alias("n")).collect()
    for r in got:
        assert r.n == len(texts[r.i].split()), repr(texts[r.i])


@given(texts=TEXTS)
@settings(**SETTINGS)
def test_token_counts_match_python(spark, texts):
    got = _df(spark, texts).select(
        "i", ws_token_count("t").alias("ws"), subword_count("t").alias("sw")
    ).collect()
    for r in got:
        assert r.ws == len(texts[r.i].split())
        assert r.sw == len(re.findall(SUBWORD_PATTERN, texts[r.i]))


@given(texts=TEXTS)
@settings(**SETTINGS)
def test_scrub_is_idempotent(spark, texts):
    once = scrub_pii(F.col("t"))
    got = _df(spark, texts).select(
        once.alias("a"), scrub_pii(once).alias("b")
    ).collect()
    for r in got:
        assert r.a == r.b


@given(texts=TEXTS)
@settings(**SETTINGS)
def test_scrub_matches_python_re(spark, texts):
    def model(s: str) -> str:
        for pat, repl in PII_PATTERNS:
            s = re.sub(pat, repl, s)
        return s

    got = _df(spark, texts).select("i", scrub_pii(F.col("t")).alias("s")).collect()
    for r in got:
        assert r.s == model(texts[r.i]), repr(texts[r.i])


@given(texts=TEXTS)
@settings(**SETTINGS)
def test_fingerprint_normalization_invariance(spark, texts):
    """fingerprint = md5int of lowercased, whitespace-collapsed text: case
    and whitespace-run changes must not alter it, and it must equal the
    python model of the same contract."""
    def model(s: str) -> int:
        n = re.sub(r"\s+", " ", s.lower()).strip()
        return int(hashlib.md5(n.encode()).hexdigest()[:15], 16)

    df = _df(spark, texts).select(
        "i",
        fingerprint_int(F.col("t")).alias("a"),
        fingerprint_int(F.upper("t")).alias("b"),
        fingerprint_int(F.regexp_replace("t", " ", "   ")).alias("c"),
    )
    for r in df.collect():
        assert r.a == r.b == r.c == model(texts[r.i]), repr(texts[r.i])


@given(
    kind=st.sampled_from(["png", "gif", "jpeg"]),
    w=st.integers(min_value=1, max_value=65535),
    h=st.integers(min_value=1, max_value=65535),
)
@settings(max_examples=40, deadline=None)
def test_image_meta_roundtrip_property(kind, w, h):
    """parse(synth(kind, w, h)) must recover (kind, w, h) exactly for the
    full uint16 dimension range of the GIF/JPEG containers (PNG capped:
    its pixel payload is materialized). Pure Python — no Spark session."""
    from redpajama_v2_processing_spark.operators.multimodal import (
        parse_image_meta, synth_image_bytes,
    )

    if kind == "png":
        w, h = w % 64 + 1, h % 48 + 1  # cap payload size; header logic identical
    assert parse_image_meta(synth_image_bytes(kind, w, h)) == (kind, w, h, True)


def _encode_gray8_png(pixels: list[list[int]], filters: list[int]) -> bytes:
    """Reference gray8 PNG ENCODER applying a chosen filter type per row
    (the exact inverse of png_gray8_pixels' reconstruction) — exists only
    to prove the decoder handles every filter type, since the fixture
    generator always writes filter 0."""
    import struct
    import zlib

    h, w = len(pixels), len(pixels[0])
    out = bytearray()
    prev = [0] * w
    for y, row in enumerate(pixels):
        f = filters[y]
        out.append(f)
        for x in range(w):
            a = row[x - 1] if x else 0
            b = prev[x] if y else 0
            c = prev[x - 1] if (y and x) else 0
            if f == 0:
                v = row[x]
            elif f == 1:
                v = row[x] - a
            elif f == 2:
                v = row[x] - b
            elif f == 3:
                v = row[x] - (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = row[x] - pred
            out.append(v & 0xFF)
        prev = row

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(out))) + chunk(b"IEND", b""))


@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=60, deadline=None)
def test_png_pixel_decode_all_filter_types(w, h, seed):
    """png_gray8_pixels must reconstruct the exact pixel plane under
    EVERY per-row filter type (None/Sub/Up/Average/Paeth chosen
    pseudo-randomly per row), not just the filter-0 stream the fixture
    generator emits; corrupt CRCs and truncation must report None."""
    import random

    from redpajama_v2_processing_spark.operators.multimodal import (
        png_gray8_pixels,
    )

    rng = random.Random(seed)
    pixels = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
    filters = [rng.randrange(5) for _ in range(h)]
    raw = _encode_gray8_png(pixels, filters)
    dec = png_gray8_pixels(raw)
    assert dec is not None
    dw, dh, flat = dec
    assert (dw, dh) == (w, h)
    assert list(flat) == [p for row in pixels for p in row]
    # corrupt one IDAT byte -> CRC check must reject
    bad = bytearray(raw)
    bad[41] ^= 0xFF
    assert png_gray8_pixels(bytes(bad)) is None
    assert png_gray8_pixels(raw[: len(raw) // 2]) is None


@given(
    rate=st.integers(min_value=8000, max_value=48000),
    n=st.integers(min_value=0, max_value=400),
    extra=st.booleans(),
)
@settings(max_examples=40, deadline=None)
def test_wav_pcm_roundtrip(rate, n, extra):
    """parse_wav_pcm must recover the exact sample stream from generated
    WAV bytes, survive an extra (odd-length) chunk before data with spec
    word-alignment, and reject truncation / non-PCM formats."""
    import struct

    from redpajama_v2_processing_spark.operators.multimodal import (
        parse_wav_pcm, synth_wav_bytes,
    )

    raw = synth_wav_bytes(rate, n)
    expect = [((i * 37) % 20001) - 10000 for i in range(n)]
    if extra:
        # splice an odd-length LIST chunk between fmt and data; the
        # walker must skip it via the pad byte
        fmt_end = 12 + 8 + 16
        chunk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
        body = raw[12:]
        # declared RIFF size counts the WAVE fourcc + all chunks (the
        # walker is spec-strict now: chunks past the declared payload are
        # rejected, so an under-declared size would fail the data chunk)
        raw = (b"RIFF"
               + struct.pack("<I", 4 + len(body) + len(chunk))
               + raw[8:fmt_end] + chunk + raw[fmt_end:])
    dec = parse_wav_pcm(raw)
    assert dec is not None and dec[0] == rate and dec[1] == expect
    if n > 0:
        assert parse_wav_pcm(raw[: len(raw) - 1]) is None  # truncated data
    bad = bytearray(synth_wav_bytes(rate, max(n, 1)))
    bad[20] = 3  # format tag != PCM
    assert parse_wav_pcm(bytes(bad)) is None


@given(texts=TEXTS)
@settings(**SETTINGS)
def test_ngram_jaccard_matches_python_model(spark, texts):
    """ngram_jaccard_pairs with the df cap lifted must equal brute-force
    pairwise Jaccard of the Python-modeled shingle sets (same normalize/
    token/whole-text-fallback contract), rounded at 6."""
    from redpajama_v2_processing_spark.operators.jaccard_dedup import (
        ngram_jaccard_pairs,
    )

    def py_norm(t):
        return re.sub(r"\s+", " ", t.lower()).strip()

    def py_shingles(t, n=3):
        nm = py_norm(t)
        toks = nm.split(" ") if nm else []
        if len(toks) < n:
            return set() if nm == "" else {nm}
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    sets = {i: py_shingles(t) for i, t in enumerate(texts)}
    expected = {}
    for a in sets:
        for b in sets:
            if a < b and sets[a] & sets[b]:
                inter = len(sets[a] & sets[b])
                expected[(a, b)] = round(
                    inter / (len(sets[a]) + len(sets[b]) - inter), 6
                )
    got = {
        (r.src, r.dst): r.jaccard
        for r in ngram_jaccard_pairs(
            _df(spark, texts), "i", "t", threshold=0.0, max_df=10**6
        ).collect()
    }
    assert got == expected


def test_substring_dedup_conservation_properties(spark):
    """Output never gains tokens; removal count + kept count == input
    token count per doc (conservation over the sf0.001 corpus)."""
    from redpajama_v2_processing_spark.functions.text import normalize, tokens
    from redpajama_v2_processing_spark.operators.span_dedup import substring_dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = substring_dedup(docs, "doc_id")
    joined = out.join(
        docs.select(
            F.col("doc_id").alias("id"),
            F.size(F.coalesce(tokens(normalize(F.col("text"))),
                              F.array().cast("array<string>"))).alias("n_in"),
        ),
        "id",
    )
    bad = joined.where(
        F.size(F.coalesce(tokens(F.col("clean_text")),
                          F.array().cast("array<string>")))
        + F.col("n_removed_tokens") != F.col("n_in")
    ).count()
    assert bad == 0


def test_vocab_coverage_monotonicity(spark):
    """Coverage is non-decreasing in rank and bounded by 1; counts are
    non-increasing in rank."""
    from redpajama_v2_processing_spark.operators.vocab import vocab_coverage

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = sorted(vocab_coverage(docs).collect(), key=lambda r: r.rank)
    assert all(rows[i].coverage <= rows[i + 1].coverage + 1e-9
               for i in range(len(rows) - 1))
    assert all(rows[i].cnt >= rows[i + 1].cnt for i in range(len(rows) - 1))
    assert rows[-1].coverage <= 1.0


def test_script_ratios_bounded_and_additive(spark):
    """Every ratio lies in [0, 1] and the disjoint script ratios sum to
    letter_ratio within per-column rounding error."""
    from redpajama_v2_processing_spark.functions.encoding import (
        SCRIPT_RANGES, with_script_ratios,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sig = with_script_ratios(docs)
    cols = [f"{n}_ratio" for n in SCRIPT_RANGES] + ["letter_ratio"]
    for c in cols:
        assert sig.where((F.col(c) < 0) | (F.col(c) > 1)).count() == 0
    tol = 5e-7 * (len(SCRIPT_RANGES) + 1)
    drift = sig.where(
        F.abs(sum(F.col(f"{n}_ratio") for n in SCRIPT_RANGES)
              - F.col("letter_ratio")) > tol
    ).count()
    assert drift == 0


def test_incremental_exact_keep_disjoint_from_history(spark):
    """No kept crawl doc shares a fingerprint with history (the defining
    invariant of the incremental tier), checked on the real corpus."""
    from redpajama_v2_processing_spark.functions.text import fingerprint_int
    from redpajama_v2_processing_spark.operators.exact_dedup import (
        incremental_exact_keep,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    history = docs.where(F.col("doc_id") % 4 == 0)
    new = docs.where(F.col("doc_id") % 4 != 0)
    kept = incremental_exact_keep(new, history, "doc_id")
    overlap = (
        new.join(kept, "doc_id", "left_semi")
        .select(fingerprint_int(F.col("text")).alias("fp"))
        .join(history.select(fingerprint_int(F.col("text")).alias("fp")), "fp")
        .count()
    )
    assert overlap == 0
