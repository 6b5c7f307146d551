"""Session windows — the built-in scale path for sessionization.

``operators/temporal.sessionize`` is the exact batch operator (lag +
running sum, deterministic session_idx, oracle-checked).
``F.session_window`` is Spark's native gap-session aggregate: it runs
in Structured Streaming with watermarks (state store-backed merge of
overlapping windows) and is the right primitive when sessions must
close incrementally over an unbounded event stream.

Boundary semantics differ by ONE edge: ``sessionize`` keeps an event
exactly ``gap`` after its predecessor in the same session (strict
``>`` test); ``session_window`` opens [ts, ts+gap) per event and merges
on OVERLAP, so an exact-``gap`` successor starts a new session. On
timestamp data with sub-second precision the disagreement set is
measure-zero; the parity test runs both over the events table and
asserts identical session profiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def session_stats_native(
    events: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session rollup via the built-in session_window aggregate —
    same output shape as ``temporal.session_stats`` minus the ordinal
    ``session_idx`` (a streaming session has no stable global index):
    (by, n_events, start_ts, end_ts, duration_us)."""
    t_us = F.unix_micros(F.col(ts).cast("timestamp"))
    return (
        events.groupBy(
            by, F.session_window(ts, f"{gap_minutes} minutes").alias("_w")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts).alias("start_ts"),
            F.max(ts).alias("end_ts"),
            (F.max(t_us) - F.min(t_us)).cast("long").alias("duration_us"),
        )
        .drop("_w")
    )


def streaming_session_stats(
    spark: SparkSession,
    source_dir: str,
    schema_ddl: str,
    by: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming variant: session windows close once the watermark
    passes their end — late events inside the watermark re-open and
    merge state-store sessions; events beyond it are dropped. Append
    output mode (a session row is emitted exactly once, on close)."""
    ev = spark.readStream.schema(schema_ddl).parquet(source_dir)
    return (
        ev.withWatermark(ts, watermark)
        .groupBy(by, F.session_window(ts, f"{gap_minutes} minutes").alias("_w"))
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts).alias("start_ts"),
            F.max(ts).alias("end_ts"),
        )
        .drop("_w")
    )


def run_streaming_sessions(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    schema_ddl: str = "event_id long, user_id long, ts timestamp",
) -> None:
    """Drain everything currently available through the stateful session
    aggregate, exactly once (Trigger.AvailableNow — the
    run_incremental_batch pattern from incremental.py)."""
    stats = streaming_session_stats(spark, source_dir, schema_ddl)
    q = (
        stats.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
