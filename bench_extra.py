#!/usr/bin/env python
"""Round-8 optimization harness: per-query noop-sink isolation timings.

Same session/warmup/methodology as the FROZEN bench.py (guide §1.4), but:
  * each query runs REPEATS times, min+median reported (bench.py runs 1×
    per process invocation; the driver medians 3 processes)
  * optional --queries filter to isolate one query fast
  * optional --explain-dir DIR to dump .explain("formatted") per query

This file is NOT part of the driver contract; its numbers feed
OPTIMIZATION_r08.md only.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue",
    "q5_revenue_by_nation",
    "url_canon",
    "urlseen_antijoin",
    "politeness_rank",
    "backrefs",
    "dedup_exact",
    "minhash_pairs",
    "minhash_pairs_fast",
    "simhash",
    "text_profile",
    "repetition_profile",
    "knn_brute",
    "ann_topk_multiprobe",
    "extract_headings",
    "events_rollup",
    "pagerank",
    "fallback_reuse",
    "crawl_replay",
]


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--explain-dir", default=None,
                    help="dump .explain('formatted') per query to DIR/<q>.txt")
    args = ap.parse_args()

    from reffy_spark.plans import entry_queries as EQ
    from reffy_spark.session import get_spark

    spark = get_spark("reffy_bench_extra", cores=CPUS, shuffle_partitions=CPUS)
    # identical warmup to bench.py
    EQ.q1_pricing_summary(spark, SF_DIR).count()
    from reffy_spark.extractors.base import extract_all
    from reffy_spark.sources.synthetic import gen_pages

    extract_all(gen_pages(spark, 2000, partitions=CPUS), ["links", "title"]).count()

    names = args.queries or HEADLINE
    out: dict[str, dict] = {}
    for name in names:
        fn = EQ.QUERIES.get(name) or EQ.BENCH_ONLY.get(name)
        if fn is None and name == "crawl_replay":
            fn = EQ.q_crawl_replay
        samples = []
        for r in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name} [rep {r}]")
            t0 = time.monotonic()
            if name == "crawl_replay":
                # bench.py times construction + .count() for the replay
                EQ.q_crawl_replay(spark, SF_DIR).count()
            else:
                noop(fn(spark, SF_DIR))
            samples.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {
            "samples": samples,
            "min": min(samples),
            "median": round(statistics.median(samples), 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
        if args.explain_dir and name != "crawl_replay":
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, SF_DIR)
            with open(os.path.join(args.explain_dir, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))

    print(json.dumps({"all": out}))
    spark.stop()


if __name__ == "__main__":
    main()
