"""Driver contract for the spark-graft builder (PySpark target).

Backed by the ``redpajama_v2_processing_spark`` package: a from-scratch
PySpark-native quality-filter / dedup engine with the semantics of
rakseli/redpajama-v2-processing (see SURVEY.md). Every oracle-checked
query has a DuckDB SQL twin generated from the same config constants.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from redpajama_v2_processing_spark.queries import ORACLES, QUERIES  # noqa: E402
from redpajama_v2_processing_spark.plans.pipeline import flagship  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full quality-filter pipeline (signals -> langid -> quality
    keep/drop labels -> PII scrub -> exact-dedup flag) over the sf0.001
    documents table."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
