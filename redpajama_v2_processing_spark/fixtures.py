"""Deterministic synthetic Common-Crawl-style ``pages`` generator.

Canonical engine input per BASELINE.json input_hint:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Content mix per FIXTURES.md §1: clean prose, too-short docs, flagged-word
docs, high-repetition docs, low-entropy docs, PII docs, near-duplicate
pairs (>=0.8 shingle Jaccard), exact duplicate pairs, cross-language
contamination, hot-host URL skew (~20 % of rows on one host), warc_ts
spread over multiple days. Seeded & pure-python-deterministic: same seed
-> byte-identical table, so goldens are stable.
"""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, StringType, StructField, StructType, TimestampType,
)

from .functions.extract import wrap_html

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

_LANGS = ["en", "de", "fr", "es", "it"]

_WORDS = {
    "en": ("the quick brown fox jumps over lazy dog and runs through green "
           "fields with great speed while birds sing in morning light").split(),
    "de": ("der schnelle braune fuchs springt über den faulen hund und läuft "
           "durch grüne felder mit großer geschwindigkeit während vögel singen").split(),
    "fr": ("le renard brun rapide saute par dessus le chien paresseux et "
           "court dans les champs verts avec une grande vitesse pour chanter").split(),
    "es": ("el zorro marrón rápido salta sobre el perro perezoso y corre por "
           "los campos verdes con gran velocidad mientras cantan las aves").split(),
    "it": ("il volpe marrone veloce salta sopra il cane pigro e corre per i "
           "campi verdi con grande velocità mentre gli uccelli cantano").split(),
}

_HOSTS = ["hot-portal.example.com"] + [f"site{i}.example.org" for i in range(40)]


def _sentence(rng: random.Random, lang: str, n: int) -> str:
    return " ".join(rng.choice(_WORDS[lang]) for _ in range(n)) + "."


def _make_text(rng: random.Random, lang: str, kind: str, idx: int) -> str:
    if kind == "short":
        return _sentence(rng, lang, rng.randint(1, 5))
    if kind == "flagged":
        base = _sentence(rng, lang, 30)
        return base + " viagra casino xxx spam " + _sentence(rng, lang, 10)
    if kind == "repetitive":
        phrase = _sentence(rng, lang, 6)
        return " ".join([phrase] * rng.randint(8, 15))
    if kind == "low_entropy":
        w = rng.choice(_WORDS[lang])
        return " ".join([w] * rng.randint(40, 80))
    if kind == "pii":
        return (
            _sentence(rng, lang, 20)
            + f"\nreach me at user{idx}@mail.example.com or 555-{100 + idx % 900:03d}-4567 "
            + f"ssn 123-45-{1000 + idx % 9000:04d} host 192.168.1.{idx % 255}\n"
            + _sentence(rng, lang, 15)
        )
    # clean prose: multi-line, punctuated
    lines = [_sentence(rng, lang, rng.randint(8, 20)) for _ in range(rng.randint(3, 8))]
    return "\n".join(lines)


def generate_pages_pdf(n_rows: int, seed: int = 42) -> pd.DataFrame:
    """Deterministic pandas frame of pages; see module doc for the mix."""
    rng = random.Random(seed)
    base_ts = dt.datetime(2026, 3, 1, 0, 0, 0)
    kinds = (
        ["clean"] * 55 + ["short"] * 10 + ["flagged"] * 8 + ["repetitive"] * 8
        + ["low_entropy"] * 5 + ["pii"] * 14
    )
    rows: list[dict] = []
    i = 0
    while len(rows) < n_rows:
        lang = rng.choice(_LANGS)
        kind = rng.choice(kinds)
        text = _make_text(rng, lang, kind, i)
        # cross-language contamination: ~3 % carry a wrong lang tag
        tagged_lang = rng.choice(_LANGS) if rng.random() < 0.03 else lang
        host = _HOSTS[0] if rng.random() < 0.20 else rng.choice(_HOSTS[1:])
        url = f"https://{host}/{tagged_lang}/doc-{i}.html"
        ts = base_ts + dt.timedelta(
            days=rng.randint(0, 4), hours=rng.randint(0, 23), minutes=rng.randint(0, 59)
        )
        rows.append({"url": url, "warc_ts": ts, "text": text, "lang": tagged_lang, "_i": i})
        i += 1
        if len(rows) >= n_rows:
            break
        r = rng.random()
        if kind == "clean" and r < 0.12:
            # exact duplicate on a different url
            rows.append({
                "url": f"https://{rng.choice(_HOSTS)}/dup/{i}.html",
                "warc_ts": ts + dt.timedelta(hours=1),
                "text": text, "lang": tagged_lang, "_i": i,
            })
            i += 1
        elif kind == "clean" and r < 0.24:
            # near duplicate: append one short sentence (high shingle overlap)
            rows.append({
                "url": f"https://{rng.choice(_HOSTS)}/near/{i}.html",
                "warc_ts": ts + dt.timedelta(hours=2),
                "text": text + "\n" + _sentence(rng, lang, 4),
                "lang": tagged_lang, "_i": i,
            })
            i += 1
    return pd.DataFrame(rows[:n_rows]).drop(columns=["_i"])


def pages_df(spark: SparkSession, n_rows: int = 200, seed: int = 42) -> DataFrame:
    """Spark pages DataFrame with the html column derived from text via the
    canonical wrapper (so extract_text(html) == text byte-identically)."""
    pdf = generate_pages_pdf(n_rows, seed)
    base = spark.createDataFrame(
        pdf, "url string, warc_ts timestamp, text string, lang string"
    )
    return base.select(
        "url", "warc_ts",
        F.encode(wrap_html(F.col("text")), "utf-8").alias("html"),
        "text", "lang",
    )


def write_pages(spark: SparkSession, path: str, n_rows: int = 200,
                seed: int = 42, partitions: int = 4) -> None:
    (
        pages_df(spark, n_rows, seed)
        .repartition(partitions, "url")
        .write.mode("overwrite").parquet(path)
    )
