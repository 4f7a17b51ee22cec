"""Golden per-row invariant: extract_text(html) == text byte-identically
for every fixture page (BASELINE.json input_hint), plus PII scrub units."""

from __future__ import annotations

from pyspark.sql import functions as F

from redpajama_v2_processing_spark.functions.extract import extract_text, wrap_html
from redpajama_v2_processing_spark.functions.scrub import (
    mask_flagged_words, scrub_pii,
)


def test_extract_byte_identical_on_fixture(pages_small):
    bad = (
        pages_small.withColumn("ext", extract_text(F.col("html").cast("string")))
        .where(F.col("ext") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_extract_inverts_wrapping_with_entities(spark):
    texts = [
        "a < b & c > d",
        "tags <not> stripped & kept: &amp; stays doubled",
        "multi\nline\ntext & more",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = (
        df.withColumn("html", wrap_html(F.col("text")))
        .withColumn("ext", extract_text(F.col("html")))
    )
    assert out.where(F.col("ext") != F.col("text")).count() == 0


def test_extract_strips_script_style(spark):
    html = (
        "<html><head><title>t</title></head><body>"
        "<script>var x = 1;\nalert(x);</script>keep"
        "<style>.a { color: red }</style></body></html>"
    )
    df = spark.createDataFrame([(html,)], "html string")
    assert df.select(extract_text(F.col("html"))).collect()[0][0] == "keep"


def test_scrub_each_pattern(spark):
    raw = (
        "mail a.b+c@x-y.org phone 555-123-4567 ssn 123-45-6789 "
        "ip 10.1.2.3 card 4111 1111 1111 1111 end"
    )
    df = spark.createDataFrame([(raw,)], "text string")
    out = df.select(scrub_pii(F.col("text"))).collect()[0][0]
    assert "<EMAIL>" in out and "a.b+c@x-y.org" not in out
    assert "<SSN>" in out and "123-45-6789" not in out
    assert "<PHONE>" in out or "<CC>" in out  # phone matches one of the number rules
    assert "<IP>" in out and "10.1.2.3" not in out
    assert "<CC>" in out and "4111 1111 1111 1111" not in out
    assert out.endswith("end")


def test_scrub_fixture_pii_pages_clean(pages_small):
    from pyspark.sql import functions as F

    scrubbed = pages_small.select(scrub_pii(F.col("text")).alias("s"))
    leaks = scrubbed.where(
        F.col("s").rlike(r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}")
        | F.col("s").rlike(r"\b\d{3}-\d{2}-\d{4}\b")
    ).count()
    assert leaks == 0


def test_mask_flagged(spark):
    df = spark.createDataFrame([("clean ViAgRa here dup end",)], "text string")
    out = df.select(mask_flagged_words(F.col("text"))).collect()[0][0]
    assert out == "clean <FLAGGED> here <FLAGGED> end"


def test_luhn_scrub_validates_checksum(spark):
    """Only Luhn-valid candidates are masked; invalid digit runs and
    digit-free text pass through untouched. Checksum cross-checked
    against a Python Luhn model on the same candidates."""
    from redpajama_v2_processing_spark.functions.scrub import (
        luhn_valid, scrub_cc_luhn,
    )
    from pyspark.sql import functions as F

    def py_luhn(s):
        ds = [int(c) for c in s if c.isdigit()][::-1]
        return len(ds) >= 13 and sum(
            d if i % 2 == 0 else (2 * d - 9 if d >= 5 else 2 * d)
            for i, d in enumerate(ds)
        ) % 10 == 0

    cands = ["4242424242424242", "4111 1111 1111 1111", "378282246310005",
             "4242424242424241", "1234567890123456", "5555555555554444"]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cands)],
                               "i long, c string")
    got = {r.i: r.v for r in df.select("i", luhn_valid(F.col("c")).alias("v")).collect()}
    assert got == {i: py_luhn(c) for i, c in enumerate(cands)}

    txt = spark.createDataFrame(
        [(0, "pay 4242424242424242 or order 1234567890123456 done")],
        "i long, t string")
    out = txt.select(scrub_cc_luhn("t").alias("s")).first().s
    # trailing-separator trim: the mask must NOT absorb the space after
    # the number (the candidate regex alone would consume it)
    assert out == "pay <CC> or order 1234567890123456 done"

    # digit-boundary replace: a valid candidate appearing as a SUBSTRING
    # of a longer (non-validating, hence unextractable) digit run must
    # not be masked inside that run — but a LETTER-glued copy of the
    # same valid number ('A' is not a digit boundary) must be masked, or
    # a full card number leaks
    txt2 = spark.createDataFrame(
        [(0, "card 4242424242424242 ref 94242424242424242605"
             " alt A4242424242424242")],
        "i long, t string")
    out2 = txt2.select(scrub_cc_luhn("t").alias("s")).first().s
    assert out2 == "card <CC> ref 94242424242424242605 alt A<CC>"

    # single-separator adjacency: the captured boundary char is consumed,
    # so the exactness of the two-pass replace is what masks BOTH copies
    txt3 = spark.createDataFrame(
        [(0, "x 4242424242424242 4242424242424242 y")], "i long, t string")
    out3 = txt3.select(scrub_cc_luhn("t").alias("s")).first().s
    assert out3 == "x <CC> <CC> y"
