"""Catalyst plan-statistics probes shared by size-routing operators."""

from __future__ import annotations

from pyspark.sql import DataFrame

# Catalyst reports UNKNOWN-size leaves as spark.sql.defaultSizeInBytes,
# which defaults to Long.MaxValue (so unknown sides never broadcast);
# anything at or above this cutoff is "no estimate", not "huge"
SIZE_UNKNOWN_CUTOFF = 1 << 62


def estimated_bytes(df: DataFrame) -> "int | None":
    """Catalyst's optimized-plan size estimate (file sizes for scans,
    propagated through operators). None when the JVM call fails or the
    estimate is the unknown-size sentinel (local/python-backed or
    lineage-truncated frames) — callers choose their own unknown-size
    default; see asof_join (unknown = small) vs anti_join_scan
    (unknown = the growing side)."""
    try:
        b = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        return None if b >= SIZE_UNKNOWN_CUTOFF else b
    except Exception:  # pragma: no cover
        return None
