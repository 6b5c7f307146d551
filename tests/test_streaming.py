"""Structured-Streaming incremental crawl tests (AvailableNow trigger)."""

import json

import pytest
from pyspark.sql import functions as F

from reffy_spark.sources import synthetic as syn
from reffy_spark.streaming import incremental as INC


@pytest.fixture(scope="module")
def source_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_src"))
    pages = syn.gen_pages(spark, 40, partitions=4).select(
        "url", "warc_ts", "html", "text", "lang"
    )
    pages.write.mode("overwrite").parquet(d)
    return d


def test_incremental_extract_availablenow(spark, source_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stream_out"))
    chk = str(tmp_path_factory.mktemp("stream_chk"))
    INC.run_incremental_batch(spark, source_dir, out, chk, modules=["title", "links"])
    got = spark.read.parquet(out)
    rows = got.collect()
    # whatwg pages collapse to one canonical URL; all others unique
    urls = [r["url_canon"] for r in rows]
    assert len(urls) == len(set(urls))
    assert all(json.loads(r["title"]).startswith("Spec ") for r in rows)
    # streaming parity with the batch crawl's cache-info columns
    import hashlib

    assert all(len(r["etag"]) == 32 and r["last_modified"] is not None for r in rows)
    assert all(r["crawl_error"] is None for r in rows)
    one = rows[0]
    src = {r["url"]: bytes(r["html"]) for r in spark.read.parquet(source_dir).collect()}
    from reffy_spark.functions.urls import url_canon_py

    match = [h for u, h in src.items() if url_canon_py(u) == one["url_canon"]]
    # streaming dedup keeps the first capture to arrive; the etag must be
    # the digest of one of the canonical URL's captures
    assert one["etag"] in {hashlib.md5(h).hexdigest() for h in match}

    # second invocation: no new files -> no new rows (exactly-once)
    INC.run_incremental_batch(spark, source_dir, out, chk, modules=["title", "links"])
    assert spark.read.parquet(out).count() == len(rows)


def test_crawl_rate_metrics_stream(spark, source_dir, tmp_path_factory):
    chk = str(tmp_path_factory.mktemp("metrics_chk"))
    stream = INC.stream_pages(spark, source_dir)
    q = (
        INC.crawl_rate_metrics(stream, window="30 minutes")
        .writeStream.format("memory")
        .queryName("rate_metrics")
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from rate_metrics").collect()
    # append mode only emits windows below the watermark; with a bounded
    # source the final watermark closes all but the last window(s)
    assert all(r["n_pages"] > 0 for r in rows)
    groups = {r["host_group"] for r in rows}
    assert groups <= {h for h, _w, _d in syn.HOSTS for h in [
        "whatwg.org", "github.io", "csswg.org", h
    ]}
