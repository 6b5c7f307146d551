"""Measure PageRank plain-vs-bucketed edge layout (VERDICT r4 #10).

``operators/linkgraph.pagerank`` documents "bucket the edge table by
``src`` once" as the cluster-scale mitigation for the per-iteration
edge re-shuffle. This tool makes that claim measurable in the sandbox:

  plain     — edges as ordinary parquet; every iteration's
              ``edges JOIN ranks ON src`` shuffles BOTH sides.
  bucketed  — edges saved ``bucketBy(N, src)`` (one file per bucket,
              same writer-side alignment as the pages table in
              bench.py); the scan reports HashPartitioning(src, N), so
              the per-iteration join shuffles ONLY the rank table
              (two longs per node) and the edge side never moves.

Usage:  python tools/pr_bucketed_bench.py [n_edges] [n_iter]
Prints one JSON line with both wall times and the exchange counts
observed in each physical plan. Run it under the same
``SPARK_GRAFT_SCALE_BUCKETED=1`` sessions as the fetch-join experiment
for the BENCH/BASELINE.md record.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    buckets = int(os.environ.get("SPARK_GRAFT_PR_BUCKETS", "32"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from reffy_spark.operators.linkgraph import pagerank
    from reffy_spark.session import get_spark

    spark = get_spark(
        "pr-bucketed", cores=cpus, shuffle_partitions=buckets,
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    base = f"/tmp/reffy_pr_edges_{n_edges}_b{buckets}"

    # deterministic synthetic link graph: ~n_edges edges over a zipf-ish
    # host space (hash-derived, seed-free — repo house rule)
    if not os.path.exists(os.path.join(base, "plain", "_SUCCESS")):
        e = (
            spark.range(0, n_edges, 1, cpus * 4)
            .select(
                F.concat(
                    F.lit("https://h"),
                    (F.xxhash64("id") % 2_000_000).cast("string"),
                    F.lit(".test/"),
                ).alias("src"),
                F.concat(
                    F.lit("https://h"),
                    (F.xxhash64("id", F.lit(1)) % 500_000).cast("string"),
                    F.lit(".test/"),
                ).alias("dst"),
            )
        )
        e.write.mode("overwrite").parquet(f"{base}/plain")
        spark.sql("DROP TABLE IF EXISTS reffy_pr_edges_bucketed")
        (
            spark.read.parquet(f"{base}/plain")
            .repartition(buckets, F.col("src"))  # one file per bucket
            .write.mode("overwrite")
            .bucketBy(buckets, "src")
            .option("path", f"{base}/bucketed")
            .format("parquet")
            .saveAsTable("reffy_pr_edges_bucketed")
        )
    else:
        spark.sql("DROP TABLE IF EXISTS reffy_pr_edges_bucketed")
        spark.sql(
            "CREATE TABLE reffy_pr_edges_bucketed (src string, dst string) "
            f"USING parquet CLUSTERED BY (src) INTO {buckets} BUCKETS "
            f"LOCATION '{base}/bucketed'"
        )

    def run(edges) -> tuple[float, int]:
        out = pagerank(edges, n_iter=n_iter)
        plan = out._jdf.queryExecution().executedPlan().toString()
        t0 = time.monotonic()
        out.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0, plan.count("Exchange hashpartitioning")

    # warm the JVM on the small side first
    run(spark.read.parquet(f"{base}/plain").limit(100_000))

    t_plain, x_plain = run(spark.read.parquet(f"{base}/plain"))
    t_bucket, x_bucket = run(spark.table("reffy_pr_edges_bucketed"))
    print(
        json.dumps(
            {
                "n_edges": n_edges,
                "n_iter": n_iter,
                "buckets": buckets,
                "cores": cpus,
                "plain_sec": round(t_plain, 2),
                "bucketed_sec": round(t_bucket, 2),
                "plain_exchanges": x_plain,
                "bucketed_exchanges": x_bucket,
                "speedup": round(t_plain / t_bucket, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
