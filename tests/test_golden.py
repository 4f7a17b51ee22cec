"""Golden-shard gate (BASELINE.json): keep/drop labels and scrubbed text
must match the frozen goldens exactly (F1 = 1.0 >= 0.99; scrub compared by
md5 => byte-identical). Regenerate deliberately with tools/make_goldens.py
if semantics change on purpose."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from redpajama_v2_processing_spark.fixtures import pages_df
from redpajama_v2_processing_spark.plans.pipeline import label_documents

GOLDEN = Path(__file__).parent / "golden" / "labels.jsonl"


def test_labels_match_golden(spark):
    # hard failure (not skip) when the golden file is absent: the F1 gate
    # must not be able to silently disappear from the suite
    if not GOLDEN.exists():
        pytest.fail(
            "tests/golden/labels.jsonl missing - run tools/make_goldens.py"
        )
    want = {}
    with open(GOLDEN) as f:
        for line in f:
            d = json.loads(line)
            want[d["url"]] = d
    pages = pages_df(spark, n_rows=200, seed=42)
    got = label_documents(pages, id_col="url").select(
        "url", "keep", "drop_reason", "langid",
        F.md5("scrubbed_text").alias("scrub_md5"), "fingerprint",
    ).collect()
    assert len(got) == len(want)
    mismatches = []
    for r in got:
        w = want[r.url]
        if (r.keep != w["keep"] or r.drop_reason != w["drop_reason"]
                or r.scrub_md5 != w["scrub_md5"] or r.langid != w["langid"]
                or r.fingerprint != w["fingerprint"]):
            mismatches.append(r.url)
    # F1 >= 0.99 gate; we require exact agreement (F1 == 1.0)
    assert not mismatches, f"{len(mismatches)} golden mismatches: {mismatches[:5]}"
