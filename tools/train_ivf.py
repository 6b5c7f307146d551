#!/usr/bin/env python
"""Train the IVF coarse quantizer (Lloyd's k-means over DataFrame ops,
``similarity.ivf_kmeans``) on a testdata embeddings table and print the
centroids as Python literals, rounded to 6 decimals.

The emitted literals are FROZEN model metadata: they are pasted into
``plans/entry_queries_ext.py`` (``_IVF_TRAINED_CENTROIDS``) and baked
into BOTH the Spark query and the DuckDB oracle for
``ann_topk_ivf_trained`` — the oracle strategy designed in
``similarity.ivf_kmeans``'s docstring (training happens once, on one
engine; the assignment/probe math both engines replay is driven by the
identical literal quantizer). Decimal-string literals parse to the same
IEEE double in the JVM, Python, and DuckDB (correctly-rounded strtod),
so the cross-engine cosine math sees bit-identical centroid inputs.

Usage: python tools/train_ivf.py [sf_dir] [n_centroids] [n_iters]
"""

import sys

sys.path.insert(0, ".")

from reffy_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_centroids = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from reffy_spark.operators.similarity import ivf_kmeans

    spark = get_spark("train_ivf", cores=8)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ivf_kmeans(emb, n_centroids=n_centroids, n_iters=n_iters)
    print(f"# trained by tools/train_ivf.py on {sf_dir} "
          f"(n_centroids={n_centroids}, n_iters={n_iters})")
    print("_IVF_TRAINED_CENTROIDS = [")
    for cid, cvec in cents:
        vals = ", ".join(f"{round(x, 6)!r}" for x in cvec)
        print(f"    ({cid}, [{vals}]),")
    print("]")
    spark.stop()


if __name__ == "__main__":
    main()
