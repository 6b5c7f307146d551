"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship seed-replay crawl (BSP frontier + politeness
+ Arrow extraction) over a deterministic mini-web derived from the
sf0.001 documents table. ``queries``/``oracle_sql`` expose the operator
inventory (SURVEY.md §2 + the training-data ops) with DuckDB oracles.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from reffy_spark.plans import entry_queries as EQ  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: 3-round crawl replay."""
    return EQ.q_crawl_replay(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(EQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(EQ.ORACLES)
