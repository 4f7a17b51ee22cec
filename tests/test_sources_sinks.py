"""JSONL round-trip source/sink, compression codecs, seeded shuffle."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from redpajama_v2_processing_spark.operators.sampling import shuffle_rows
from redpajama_v2_processing_spark.sources.pages import read_pages_json
from redpajama_v2_processing_spark.tableio import write_jsonl


def test_jsonl_roundtrip_with_timestamps(spark, tmp_path, pages_small):
    out = str(tmp_path / "pages_jsonl")
    write_jsonl(pages_small.select("url", "warc_ts", "text", "lang"), out)
    assert glob.glob(f"{out}/*.json.gz")  # gzip codec applied
    back = read_pages_json(spark, out)
    assert back.count() == pages_small.count()
    # timestamps survive the ISO round trip exactly
    a = pages_small.select("url", "warc_ts")
    b = back.select("url", "warc_ts")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_commit_compression_codec(spark, tmp_path, pages_small):
    from redpajama_v2_processing_spark.tableio import commit_table

    tdir = str(tmp_path / "zstd_table")
    commit_table(pages_small.select("url", "lang"), tdir, compression="zstd")
    files = glob.glob(f"{tdir}/data/*.zstd.parquet") + glob.glob(
        f"{tdir}/data/*zstd*.parquet"
    )
    assert files


def test_shuffle_rows_seeded(spark):
    df = spark.range(100)
    a = [r.id for r in shuffle_rows(df, seed=66).collect()]
    b = [r.id for r in shuffle_rows(df, seed=66).collect()]
    assert a == b and sorted(a) == list(range(100))
