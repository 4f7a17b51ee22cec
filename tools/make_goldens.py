"""Generate (once) the frozen golden labels for the pages fixture.

Run manually; output is committed to git. Tests recompute the pipeline and
compare against these frozen rows — the keep/drop-F1 / byte-identical-scrub
gate of BASELINE.json, with the golden file pinning today's semantics so
any future drift fails loudly.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from redpajama_v2_processing_spark.fixtures import pages_df
from redpajama_v2_processing_spark.plans.pipeline import label_documents
from redpajama_v2_processing_spark.session import get_spark

OUT = Path(__file__).resolve().parent.parent / "tests" / "golden" / "labels.jsonl"


def main() -> None:
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    pages = pages_df(spark, n_rows=200, seed=42)
    labeled = label_documents(pages, id_col="url").select(
        "url", "keep", "drop_reason", "langid",
        F.md5("scrubbed_text").alias("scrub_md5"),
        F.col("fingerprint"),
    )
    rows = sorted(
        (r.asDict() for r in labeled.collect()), key=lambda d: d["url"]
    )
    OUT.parent.mkdir(parents=True, exist_ok=True)
    with open(OUT, "w") as f:
        for d in rows:
            f.write(json.dumps(d, sort_keys=True) + "\n")
    print(f"wrote {len(rows)} golden rows -> {OUT}")


if __name__ == "__main__":
    main()
