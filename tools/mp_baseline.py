"""Raw-hardware extraction baseline: the same 5-module extraction as the
scaling protocol's crawl job, run through a plain multiprocessing pool
(no Spark). Establishes this box's own N→4N scaling cap for the
workload (BENCH/BASELINE.md 'hardware cap, same workload').

Usage: python tools/mp_baseline.py [corpus_dir] [workers ...]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODS = ["links", "headings", "ids", "dfns", "title"]


def work(args):
    urls, htmls = args
    from reffy_spark.extractors.base import extract_page

    n = 0
    for u, h in zip(urls, htmls):
        extract_page(h, u, MODS)
        n += 1
    return n


def run(corpus: str, workers: int) -> None:
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(corpus, "pages.parquet"), columns=["url_canon", "html"]
    )
    urls = t.column("url_canon").to_pylist()
    htmls = t.column("html").to_pylist()
    step = 4000
    chunks = [
        (urls[i : i + step], htmls[i : i + step]) for i in range(0, len(urls), step)
    ]
    t0 = time.monotonic()
    with mp.Pool(workers) as pool:
        total = sum(pool.map(work, chunks, chunksize=1))
    dt = time.monotonic() - t0
    print(
        json.dumps(
            {
                "workers": workers,
                "pages": total,
                "sec": round(dt, 1),
                "pps": round(total / dt, 1),
            }
        )
    )


if __name__ == "__main__":
    if len(sys.argv) > 1:
        corpus = sys.argv[1]
    else:  # track bench.py's corpus location (pages + bucket suffix)
        import bench

        corpus = bench.SCALE_CORPUS
    for w in [int(x) for x in sys.argv[2:]] or [8, 32]:
        run(corpus, w)
