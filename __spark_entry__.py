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

_SHIPPED: set[str] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the package to Python workers of a session we did not create.

    The driver builds its own SparkSession (no PYTHONPATH export), so
    worker-side unpickling of our Arrow UDFs needs the package delivered
    via addPyFile — the runtime equivalent of spark-submit --py-files.
    """
    key = spark.sparkContext.applicationId
    if key in _SHIPPED:
        return
    try:
        from reffy_spark.session import build_pyfiles_zip

        spark.sparkContext.addPyFile(build_pyfiles_zip())
    except Exception:
        pass  # already added, or local path import suffices
    _SHIPPED.add(key)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: 3-round crawl replay."""
    _ensure_shipped(spark)
    return EQ.q_crawl_replay(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable) -> Callable:
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in EQ.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(EQ.ORACLES)
