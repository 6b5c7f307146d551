"""Structured-Streaming form of the incremental crawl (SURVEY.md §2.9).

The reference's incremental machinery is conditional GETs + fallback
reuse (/root/reference/src/lib/util.js:461-488,
src/lib/specs-crawler.js:128-133): a re-crawl touches only changed
pages. Here the pages table is the stream source — new captures arrive
as files — and the engine expresses:

* URL-seen dedup with bounded state: ``dropDuplicatesWithinWatermark``
  on ``url_canon`` with an event-time watermark on ``warc_ts``;
* incremental extraction: the SAME Arrow extraction stage
  (``extract_all``) applied to the deduped stream — batch/streaming
  parity by construction;
* crawl-rate observability: watermarked tumbling-window counts per host
  group (the streaming analog of the per-round lineage metrics).

All sinks are exactly-once parquet appends with checkpointLocation —
the streaming counterpart of the BSP round commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from reffy_spark.extractors.base import extract_all
from reffy_spark.functions.urls import host_group_col, url_canon_col

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def stream_pages(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source stream of page captures (new parquet files = new
    captures; at production scale this would be Kafka/Iceberg CDC)."""
    return spark.readStream.schema(PAGES_DDL).parquet(source_dir)


def dedupe_stream(pages: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming URL-seen: first capture per canonical URL wins within
    the watermark horizon. State is bounded by the watermark — the
    streaming analog of the partitioned bloom's rolling lifecycle."""
    return (
        pages.withColumn("url_canon", url_canon_col(F.col("url")))
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["url_canon"])
    )


def incremental_extract(
    pages: DataFrame, modules: list[str] | None = None, watermark: str = "1 hour"
) -> DataFrame:
    """Dedup + extract on the stream; same extraction stage as batch.

    Batch/streaming parity includes the crawl-cache analog
    (specs-crawler.js:87-98): each extracted row carries ``etag``
    (content digest) + ``last_modified`` (capture timestamp), so a later
    incremental pass — which only ever sees files the checkpoint hasn't
    consumed — can compare digests against the previous crawl's results
    the way the reference reuses ``fallback.crawlCacheInfo``; page-level
    failure sniffs (CSS-server hiccup) flow through ``crawl_error``."""
    deduped = dedupe_stream(pages, watermark).withColumn(
        "etag", F.md5(F.col("html"))
    )
    out = extract_all(
        deduped,
        modules or ["links", "title"],
        url_col="url_canon",
        passthrough=["etag", "warc_ts"],
        last_modified_col="warc_ts",
        error_col="crawl_error",
    )
    return out.withColumnRenamed("warc_ts", "last_modified")


def crawl_rate_metrics(
    pages: DataFrame, window: str = "10 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Pages/window/host_group with late-data handling — the streaming
    lineage metrics (append-mode compatible: watermarked window agg)."""
    return (
        pages.withColumn("host_group", host_group_col(F.col("url")))
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), "host_group")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "host_group",
            "n_pages",
        )
    )


def run_incremental_batch(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    modules: list[str] | None = None,
) -> None:
    """Process everything currently available, exactly once, then stop
    (Trigger.AvailableNow) — the scheduled-incremental-recrawl pattern:
    each invocation picks up only files not seen by the checkpoint."""
    extracts = incremental_extract(stream_pages(spark, source_dir), modules)
    q = (
        extracts.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
