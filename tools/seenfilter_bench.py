#!/usr/bin/env python
"""URL-seen membership-structure bench: exact anti-join vs bloom split
vs cuckoo split on a DISCOVERY-heavy crawl (the stage these structures
exist for — every round anti-joins the discovered-link candidates
against the growing seen set).

Workload: synthetic closed web of N pages, small seed set, multi-round
BFS discovery (discover=True), identical crawls by construction (the
three-path e2e test asserts equality; this script measures time).

Usage: python tools/seenfilter_bench.py [n_pages] [n_seeds] [rounds]
Prints one JSON line per mode and a summary line.
"""

import json
import sys
import time

sys.path.insert(0, ".")

N_PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
N_SEEDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def main() -> None:
    from reffy_spark.operators.crawler import CrawlEngine
    from reffy_spark.session import get_spark
    from reffy_spark.sources import synthetic as syn

    spark = get_spark("seenfilter_bench", cores=32, shuffle_partitions=32)
    pages = syn.gen_pages(spark, N_PAGES, partitions=64)
    pages.write.mode("overwrite").parquet("/tmp/seenfilter_pages.parquet")
    pages = spark.read.parquet("/tmp/seenfilter_pages.parquet")
    seeds = syn.gen_seeds(spark, N_PAGES, N_SEEDS)
    robots = syn.gen_robots(spark)

    # untimed warm-up (cold-JIT constants, bench.py protocol)
    warm = CrawlEngine(
        spark, pages, robots, modules=["links"], use_bloom=False,
        collect_metrics=False, discover=True,
    )
    warm.crawl(seeds.limit(200), max_rounds=2).results.count()

    results = {}
    for mode, label in ((False, "exact"), (True, "bloom"), ("cuckoo", "cuckoo")):
        eng = CrawlEngine(
            spark, pages, robots, modules=["links"], use_bloom=mode,
            collect_metrics=False, discover=True, round_ms=1_000_000_000,
            # a crawl knows its budget: one epoch build absorbs the run
            seen_capacity_hint=N_PAGES,
        )
        t0 = time.monotonic()
        res = eng.crawl(seeds, max_rounds=ROUNDS)
        n = res.results.count()
        seen_n = res.url_seen.count()
        dt = round(time.monotonic() - t0, 2)
        results[label] = {"sec": dt, "fetched": n, "seen": seen_n}
        print(json.dumps({"mode": label, **results[label]}), flush=True)

    base = results["exact"]["sec"]
    print(json.dumps({
        "n_pages": N_PAGES, "n_seeds": N_SEEDS, "rounds": ROUNDS,
        "exact_sec": base,
        "bloom_vs_exact": round(results["bloom"]["sec"] / base, 3),
        "cuckoo_vs_exact": round(results["cuckoo"]["sec"] / base, 3),
        "identical_seen": len({r["seen"] for r in results.values()}) == 1,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
