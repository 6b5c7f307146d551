#!/usr/bin/env python
"""ANN quality table (VERDICT r5 "Next round" #7): recall@k of every
approximate index family vs the brute-force oracle, plus PQ
reconstruction error vs m — the evidence a 100-TB operator choice needs
(which index to build is a recall/cost tradeoff, not a vibe).

Protocol: Q query vectors drawn deterministically from the table
(every ceil(n/Q)-th vec_id), ground truth = brute-force cosine top-k
(``cosine_topk``), recall@k = |approx ∩ brute| / k averaged over
queries. Quantizers (k-means IVF centroids, PQ codebooks first-k and
Lloyd-trained) are trained once and shared across queries.

Usage: python tools/ann_quality.py [sf_dir] [k] [n_queries]
Prints a markdown table + one JSON line (machine-readable tail).
"""

import json
import sys

sys.path.insert(0, ".")

from reffy_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    from pyspark.sql import functions as F

    from reffy_spark.operators import similarity as S

    spark = get_spark("ann_quality", cores=8)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n = emb.count()
    dim = len(emb.first()["embedding"])
    step = max(1, n // n_q)
    q_ids = list(range(0, n, step))[:n_q]
    q_vecs = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.filter(F.col("vec_id").isin(q_ids)).collect()
    }

    # quantizers, trained once
    cents_first = S.ivf_centroids(emb, 8)
    cents_km = S.ivf_kmeans(emb, n_centroids=8, n_iters=5)
    books_first = S.pq_codebooks(emb, m=4, k=8)
    books_tr = S.pq_train(emb, m=4, k=8, n_iters=5)
    # 8-bit subquantizers — the FAISS production shape (VERDICT r6 #3)
    books_tr256 = S.pq_train(emb, m=4, k=256, n_iters=5)

    def ids(df):
        return [r["vec_id"] for r in df.collect()]

    methods = {
        "lsh (8 planes, 1 probe)": lambda v: S.ann_topk_lsh(
            emb, v, dim, k=k, hamming=0
        ),
        "lsh multiprobe (hamming<=1, 9 probes)": lambda v: S.ann_topk_lsh(
            emb, v, dim, k=k, hamming=1
        ),
        "ivf first-n (8 cells, nprobe=2)": lambda v: S.ann_topk_ivf(
            emb, v, k=k, nprobe=2, centroids=cents_first
        ),
        "ivf k-means (8 cells, nprobe=2)": lambda v: S.ann_topk_ivf(
            emb, v, k=k, nprobe=2, centroids=cents_km
        ),
        "ivf k-means (nprobe=4)": lambda v: S.ann_topk_ivf(
            emb, v, k=k, nprobe=4, centroids=cents_km
        ),
        "pq adc first-k (m=4, 8 codes, full scan)": lambda v: S.ann_topk_pq(
            emb, v, k=k, books=books_first
        ),
        "pq adc trained (m=4, 8 codes, full scan)": lambda v: S.ann_topk_pq(
            emb, v, k=k, books=books_tr
        ),
        "ivfadc (kmeans ivf nprobe=2 + trained pq)": lambda v: S.ann_topk_ivfadc(
            emb, v, k=k, centroids=cents_km, books=books_tr
        ),
        "ivfadc (nprobe=4)": lambda v: S.ann_topk_ivfadc(
            emb, v, k=k, nprobe=4, centroids=cents_km, books=books_tr
        ),
        "pq adc trained (m=4, 256 codes, full scan)": lambda v: S.ann_topk_pq(
            emb, v, k=k, books=books_tr256
        ),
        "ivfadc256 (kmeans ivf nprobe=2 + trained pq256)": lambda v:
            S.ann_topk_ivfadc(
                emb, v, k=k, centroids=cents_km, books=books_tr256
            ),
        "ivfadc256 (nprobe=4)": lambda v: S.ann_topk_ivfadc(
            emb, v, k=k, nprobe=4, centroids=cents_km, books=books_tr256
        ),
    }

    truth = {qid: set(ids(S.cosine_topk(emb, v, k=k))) for qid, v in q_vecs.items()}
    recalls = {}
    for name, fn in methods.items():
        r = [
            len(set(ids(fn(v))) & truth[qid]) / k for qid, v in q_vecs.items()
        ]
        recalls[name] = round(sum(r) / len(r), 3)
        print(f"recall@{k} {recalls[name]:.3f}  {name}", flush=True)

    # PQ reconstruction error vs m (64-dim → m ∈ {2,4,8,16}), first-k vs
    # Lloyd-trained codebooks
    recon = {}
    for m in (2, 4, 8, 16):
        bf = S.pq_codebooks(emb, m=m, k=8)
        bt = S.pq_train(emb, m=m, k=8, n_iters=5)
        recon[m] = {
            "first_k": round(S.pq_reconstruction_error(emb, bf), 5),
            "trained": round(S.pq_reconstruction_error(emb, bt), 5),
        }
        print(f"pq recon m={m}: first_k={recon[m]['first_k']} "
              f"trained={recon[m]['trained']}", flush=True)

    print()
    print(f"| method | recall@{k} |")
    print("|---|---|")
    for name, r in recalls.items():
        print(f"| {name} | {r:.3f} |")
    print()
    print("| m (subspaces) | recon err first-k | recon err trained |")
    print("|---|---|---|")
    for m, v in recon.items():
        print(f"| {m} | {v['first_k']} | {v['trained']} |")
    print()
    print(json.dumps({
        "sf_dir": sf_dir, "n_vectors": n, "dim": dim, "k": k,
        "n_queries": len(q_vecs), "recall": recalls, "pq_recon": recon,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
