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

# Working-set note (ADVICE r6): the skew-safe twins reference their
# range-partitioned ``part`` frame three times (local/carries/pairs).
# repartitionByRange SAMPLES its boundaries and spark_partition_id is
# plan-dependent, so three independent recomputations could slice the
# data differently and silently mis-join — the r5 fix persisted the
# frame behind a per-operator cache slot whose unpersist-on-next-call
# lifecycle still allowed a pending plan's working set to be evicted
# before evaluation. The frames are now eagerly localCheckpoint-ed
# instead: the slices are computed ONCE and the lineage truncated, so a
# returned plan stays correct no matter how many later calls run, and
# block loss surfaces as a job failure, never as divergent slices.
# (localCheckpoint is not resilient to executor loss; on a real cluster
# a long-lived pipeline should set a reliable checkpoint dir and swap
# checkpoint() in — same single-line site, both operators.)
#
# Costs of this contract, accepted deliberately: (a) every skewsafe call
# runs one eager job for the working set even if the returned plan is
# never evaluated — callers constructing plans purely to inspect them
# should use the direct twins; (b) checkpointed blocks are released by
# the ContextCleaner when the returned DataFrame is garbage-collected,
# not eagerly — a tight loop over many inputs holds at most the blocks
# of results still referenced (drop references, or call
# spark.sparkContext._jvm.System.gc() in pathological loops).


def _sliced(df: DataFrame, num_parts: int, *cols) -> DataFrame:
    """The skew-safe working-set frame BEFORE checkpointing: range-
    partitioned on ``cols`` with frozen slice ids. Factored out so plan
    tests can assert the RangePartitioning shape that the eager
    localCheckpoint otherwise hides behind an ExistingRDD scan."""
    ranged = df.repartitionByRange(num_parts, *cols)
    return ranged.withColumn("_pid", F.spark_partition_id())

# skew_safe="auto" routes to the two-phase twins above this estimated
# input size (Catalyst plan statistics, driver-side, no job). The twins
# are bit-identical, so the routing is purely a plan choice: below the
# threshold the direct single-window plan is cheaper (one exchange+sort,
# no persist/carry machinery); above it, a hot key in the direct plan
# means one task sorts that key's whole group — the r5 verdict's
# watch-list item ("the convenient API should be the skew-safe one at
# scale").
_SKEW_SAFE_AUTO_BYTES = 256 * 1024 * 1024


# Unknown estimates are treated as SMALL here: file-backed production
# inputs carry real stats, and the direct plan is still CORRECT for the
# rest, just not skew-proof (pass skew_safe=True to force).
from reffy_spark.plan_stats import estimated_bytes as _estimated_bytes


def _route_skew_safe(skew_safe, *frames: DataFrame) -> bool:
    if skew_safe == "auto":
        total = 0
        for f in frames:
            b = _estimated_bytes(f)
            if b is not None:
                total += b
        return total > _SKEW_SAFE_AUTO_BYTES
    return bool(skew_safe)


def _asof_union(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str,
    value_cols: tuple[str, ...],
) -> tuple[DataFrame, list[str]]:
    """Shared tagged-union builder for the two as-of variants: right rows
    deduped to one per (by, ts) (greatest struct wins), carried as a
    non-null ``_r`` struct with ``_tag`` 0 (sorting before left rows at
    equal ts); left rows carry ``_r`` NULL with ``_tag`` 1."""
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
    return l.unionByName(r.select(*lcols, "_r", "_tag")), lcols


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    prefix: str = "asof_",
    skew_safe: "bool | str" = "auto",
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
    ``by`` keys are the skew caveat — so ``skew_safe`` (default
    "auto") routes to the bit-identical two-phase
    ``asof_join_skewsafe`` when the estimated input exceeds
    ``_SKEW_SAFE_AUTO_BYTES``; pass False to force this direct plan,
    True to force the two-phase one.
    """
    if _route_skew_safe(skew_safe, left, right):
        return asof_join_skewsafe(left, right, by, ts, value_cols, prefix)
    u, lcols = _asof_union(left, right, by, ts, value_cols)
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


def asof_join_skewsafe(
    left: DataFrame,
    right: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    prefix: str = "asof_",
    num_parts: int | None = None,
) -> DataFrame:
    """``asof_join`` without the hot-key hazard: bit-identical output,
    but no task ever sorts a whole ``by`` group.

    ``asof_join``'s single window ``partitionBy(by)`` puts EVERY row of
    a hot key (one user = 50% of events, one host = 50% of a crawl log)
    into one task. This variant is the frontier's two-phase pattern
    (``frontier._exact_group_rank``) applied to a running ``last``:

    1. range-repartition the tagged union on (by, ts, _tag) — a hot key
       spreads over many contiguous partitions, every partition sorts
       only its own slice;
    2. partition-local running last(_r, ignorenulls) per (_pid, by);
    3. boundary carry: per (partition, key), the slice's LAST right row
       is one ``max_by`` aggregate (right rows are unique per (by, ts),
       so the max over (ts, _tag) IS the last in order); a running last
       over the (pid, key) pairs table gives each slice the newest
       right row from all earlier slices, then only pairs that inherit
       a non-null carry survive — under range partitioning that is the
       first key of each partition, ≤ num_parts rows, broadcast;
    4. final as-of value = coalesce(local running last, carried last).

    The only unpartitioned-ish window runs over the carries table,
    bounded by num_parts × keys-spanning-partition-boundaries — config-
    sized, not data-sized (same argument as the rank offset table).
    Ties and duplicates behave exactly like ``asof_join``: the range
    partitioner respects the (by, ts, _tag) order, so an equal-ts right
    row always lands in the same or an earlier partition than the left
    row it must serve.
    """
    spark = left.sparkSession
    if num_parts is None:
        num_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    u, lcols = _asof_union(left, right, by, ts, value_cols)
    # eager localCheckpoint: slices computed once, lineage truncated —
    # the three self-references below can never see divergent
    # repartitionByRange samples (see module note)
    part = _sliced(
        u, num_parts, F.col(by), F.col(ts), F.col("_tag")
    ).localCheckpoint()

    # slice-local running last (hot key split across many tasks)
    w_local = (
        Window.partitionBy("_pid", by)
        .orderBy(ts, "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn("_last_loc", F.last("_r", ignorenulls=True).over(w_local))

    # per-slice carry: the last right row of each (partition, key)
    carries = (
        part.filter(F.col("_r").isNotNull())
        .groupBy("_pid", by)
        .agg(F.max_by("_r", F.struct(ts, "_tag")).alias("_carry"))
    )
    # running carry from EARLIER partitions, over every (pid, key) pair
    # present in the data (pairs without their own right rows inherit)
    pairs = part.select("_pid", by).distinct()
    w_carry = (
        Window.partitionBy(by)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = (
        pairs.join(carries, on=["_pid", by], how="left")
        .withColumn("_prev", F.last("_carry", ignorenulls=True).over(w_carry))
        # only pairs that actually inherit a carry matter; under range
        # partitioning a non-null _prev means the key STARTED in an
        # earlier partition, i.e. it is the first key of this pid — so
        # ≤ 1 row per partition survives: broadcast is config-sized
        .filter(F.col("_prev").isNotNull())
        .select("_pid", by, "_prev")
    )

    out = (
        local.join(F.broadcast(prev), on=["_pid", by], how="left")
        .withColumn("_last", F.coalesce(F.col("_last_loc"), F.col("_prev")))
        .filter(F.col("_tag") == 1)
    )
    proj = [*lcols, F.col("_last._ts").alias(f"{prefix}ts")]
    proj += [F.col(f"_last.{c}").alias(f"{prefix}{c}") for c in value_cols]
    return out.select(*proj)


def sessionize(
    events: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
    skew_safe: "bool | str" = "auto",
) -> DataFrame:
    """Gap-based sessions: a new session starts when the inter-event gap
    within a ``by`` group exceeds ``gap_minutes``. Adds ``session_idx``
    (0-based per key, in time order).

    Gap arithmetic is integer microseconds (``unix_micros`` /
    ``epoch_us``) — exact cross-engine. The two windows (lag + running
    sum) share one (by, ts) sort; Spark plans a single exchange+sort.
    ``skew_safe`` (default "auto") routes to the bit-identical
    two-phase ``sessionize_skewsafe`` above ``_SKEW_SAFE_AUTO_BYTES``
    (a hot key would otherwise sort in one task); False forces this
    direct plan, True forces the two-phase one.
    """
    if _route_skew_safe(skew_safe, events):
        return sessionize_skewsafe(events, by, ts, gap_minutes)
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


def sessionize_skewsafe(
    events: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
    num_parts: int | None = None,
) -> DataFrame:
    """``sessionize`` without the hot-key hazard: bit-identical
    ``session_idx``, but no task ever sorts a whole ``by`` group.

    Same two-phase shape as ``asof_join_skewsafe``:

    1. range-repartition on (by, ts) — equal (by, ts) rows stay
       together, a hot key spreads over contiguous partitions;
    2. slice-local lag + gap flags + running flag-sum per (_pid, by)
       (the first row of a slice flags 0 locally — its true flag is the
       boundary flag below);
    3. per-slice summary (first/last event time, internal flag sum);
       per key in _pid order, the boundary flag of a slice compares its
       first event against the PREVIOUS slice's last event, and the
       slice's session offset is the running sum of earlier slices'
       internal+boundary flags — windows over the (pid, key) summary
       table only (≤ num_parts rows per key);
    4. adjustment = offset + own boundary flag, joined back on
       (_pid, by). Non-zero adjustments exist only for continuation
       slices — under range partitioning, at most the first key of each
       partition — so the join side is ≤ num_parts rows: broadcast.

    Tie behavior matches ``sessionize`` exactly: equal-ts rows have gap
    ≤ 0 regardless of their relative order, so the flag (and therefore
    every session index) is order-insensitive within a tie.
    """
    spark = events.sparkSession
    if num_parts is None:
        num_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    gap_us = gap_minutes * 60 * 1_000_000
    t_us = F.unix_micros(F.col(ts).cast("timestamp"))
    # eager localCheckpoint: slices computed once, lineage truncated
    # (see module note)
    part = _sliced(events, num_parts, F.col(by), F.col(ts)).localCheckpoint()

    w_loc = Window.partitionBy("_pid", by).orderBy(ts)
    flagged = part.withColumn("_tus", t_us).withColumn(
        "_ns",
        F.when(F.col("_tus") - F.lag("_tus").over(w_loc) > gap_us, F.lit(1))
        .otherwise(F.lit(0)),
    )
    local = flagged.withColumn(
        "_lcum",
        F.sum("_ns").over(
            w_loc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sl = flagged.groupBy("_pid", by).agg(
        F.min("_tus").alias("_first"),
        F.max("_tus").alias("_last"),
        F.sum("_ns").alias("_intflags"),
    )
    w_key = Window.partitionBy(by).orderBy("_pid")
    sl = sl.withColumn("_prev_last", F.lag("_last").over(w_key)).withColumn(
        "_bflag",
        F.when(F.col("_first") - F.col("_prev_last") > gap_us, F.lit(1))
        .otherwise(F.lit(0)),
    )
    adj = (
        sl.withColumn(
            "_off",
            F.coalesce(
                F.sum(F.col("_intflags") + F.col("_bflag")).over(
                    w_key.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_pid", by, (F.col("_off") + F.col("_bflag")).alias("_adj"))
        .filter(F.col("_adj") != 0)
    )
    return (
        local.join(F.broadcast(adj), on=["_pid", by], how="left")
        .withColumn(
            "session_idx",
            (F.col("_lcum") + F.coalesce(F.col("_adj"), F.lit(0))).cast("long"),
        )
        .select(*events.columns, "session_idx")  # original column order
    )


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
