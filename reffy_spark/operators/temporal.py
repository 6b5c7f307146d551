"""Temporal operators: as-of join and gap sessionization.

Both are standard analytics-engine primitives Spark lacks as built-ins
(kdb aj / DuckDB ASOF JOIN / Flink temporal join; sessionization per
the classic web-log literature). Implemented as compositions of
DataFrame ops — the union+running-last trick for as-of, a bounded
per-key window for sessions — no UDFs anywhere.

Float caveat: these operators only MOVE stored values (last-non-null,
min/max, counts); they never sum floats across rows, so results are
bit-portable to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the LATEST right row with
    ``right.ts <= left.ts`` in the same ``by`` group (DuckDB
    ``ASOF LEFT JOIN`` / kdb ``aj`` semantics; ties on ts match).

    Plan: tag + union + one running ``last(struct, ignorenulls)`` over a
    per-key window ordered (ts, tag) with right rows sorting before left
    at equal ts. The struct carry is load-bearing: a right row whose
    value is legitimately NULL must still win over an older non-null row,
    and a struct is non-null whenever the row exists.

    Right rows are deduplicated to one per (by, ts) (greatest struct
    wins) — without it, equal-timestamp duplicates make "the" as-of row
    ambiguous and no engine pair would agree.

    Scale shape: ONE shuffle on ``by`` and a per-key sort — the
    sort-merge as-of every distributed engine uses. The window is
    running (unbounded preceding → current), which Spark evaluates
    streamingly per key — no per-key buffering of the whole group. Hot
    ``by`` keys are the skew caveat, as for any keyed temporal join.
    """
    rstruct = F.struct(
        F.col(ts).alias("_ts"), *[F.col(c).alias(c) for c in value_cols]
    )
    r = (
        right.groupBy(by, ts)
        .agg(F.max(rstruct).alias("_r"))
        .select(by, ts, "_r", F.lit(0).alias("_tag"))
    )
    lcols = left.columns
    l = left.select(
        *lcols, F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
        F.lit(1).alias("_tag"),
    )
    # align schemas: right side carries nulls for the left payload
    for c in lcols:
        if c not in (by, ts):
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = l.unionByName(r.select(*lcols, "_r", "_tag"))
    w = (
        Window.partitionBy(by)
        .orderBy(ts, "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u.withColumn("_last", F.last("_r", ignorenulls=True).over(w)).filter(
        F.col("_tag") == 1
    )
    proj = [*lcols, F.col("_last._ts").alias(f"{prefix}ts")]
    proj += [F.col(f"_last.{c}").alias(f"{prefix}{c}") for c in value_cols]
    return out.select(*proj)


def sessionize(
    events: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessions: a new session starts when the inter-event gap
    within a ``by`` group exceeds ``gap_minutes``. Adds ``session_idx``
    (0-based per key, in time order).

    Gap arithmetic is integer microseconds (``unix_micros`` /
    ``epoch_us``) — exact cross-engine. The two windows (lag + running
    sum) share one (by, ts) sort; Spark plans a single exchange+sort.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(by).orderBy(ts)
    # parquet yields TIMESTAMP_NTZ; the session runs UTC (session.py:77)
    # so the cast is the identity mapping and matches DuckDB epoch_us
    t_us = F.unix_micros(F.col(ts).cast("timestamp"))
    # two projections (Spark can't nest lag inside a windowed sum) but
    # ONE exchange+sort: both windows share the (by, ts) ordering
    flagged = events.withColumn(
        "_ns",
        F.when(t_us - F.lag(t_us).over(w) > gap_us, F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    return flagged.withColumn(
        "session_idx",
        F.sum("_ns")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    ).drop("_ns")


def session_stats(
    events: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-session rollup: (by, session_idx, n_events, start_ts, end_ts,
    duration_us). Counts and min/max only — no cross-row float sums, so
    the profile is oracle-exact."""
    s = sessionize(events, by, ts, gap_minutes)
    t_us = F.unix_micros(F.col(ts).cast("timestamp"))
    return s.groupBy(by, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min(ts).alias("start_ts"),
        F.max(ts).alias("end_ts"),
        (F.max(t_us) - F.min(t_us)).cast("long").alias("duration_us"),
    )
