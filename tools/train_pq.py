#!/usr/bin/env python
"""Train PQ codebooks (``similarity.pq_train``, Lloyd's per subspace)
on a testdata embeddings table and print them as Python literals
rounded to 6 decimals — the same freeze-the-literals oracle strategy as
``tools/train_ivf.py``: the emitted ``_PQ_TRAINED_BOOKS`` is pasted
into ``plans/entry_queries_ext.py`` and baked into BOTH the Spark query
and the DuckDB oracle (as k concatenated 64-dim "virtual centroids",
since the oracle's subspace math only ever reads slice j of codeword
c — concat(book[0][c], …, book[m-1][c]) reproduces every slice).

Usage: python tools/train_pq.py [sf_dir] [m] [k] [n_iters]
"""

import sys

sys.path.insert(0, ".")

from reffy_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_iters = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    from reffy_spark.operators.similarity import pq_train

    spark = get_spark("train_pq", cores=8)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = pq_train(emb, m=m, k=k, n_iters=n_iters)
    print(f"# trained by tools/train_pq.py on {sf_dir} "
          f"(m={m}, k={k}, n_iters={n_iters})")
    print("_PQ_TRAINED_BOOKS = [")
    for j, book in enumerate(books):
        print(f"    [  # subspace {j}")
        for cw in book:
            vals = ", ".join(f"{round(x, 6)!r}" for x in cw)
            print(f"        [{vals}],")
        print("    ],")
    print("]")
    spark.stop()


if __name__ == "__main__":
    main()
