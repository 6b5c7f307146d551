"""Single-process cProfile of the extraction hot path.

Runs the same per-page work the Arrow UDF does (parse -> DOM index ->
module mappers) over N synthetic spec pages, no Spark, and prints the
top cumulative-time functions. Used to pick the next extraction-stage
optimization target after the r7 regex tokenizer (BENCH/BASELINE.md
round-7 stage attribution: extraction is ~80-93% of the replay wall).

Usage: python tools/profile_extract.py [n_pages] [sortkey]
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    sortkey = sys.argv[2] if len(sys.argv) > 2 else "cumulative"

    from reffy_spark.extractors.base import extract_page
    from reffy_spark.sources.synthetic import page_html, url_of_page

    mods = ["links", "headings", "ids", "dfns", "title"]
    pages = [(url_of_page(i), page_html(i, n)) for i in range(n)]

    def work():
        for url, html in pages:
            extract_page(html, url, mods, with_error=True)

    # untimed warm-up (regex compile, selector parse caches)
    for url, html in pages[:20]:
        extract_page(html, url, mods, with_error=True)

    t0 = time.monotonic()
    work()
    wall = time.monotonic() - t0
    print(f"plain: {n} pages in {wall:.2f}s = {n / wall:.1f} pages/s/core")

    prof = cProfile.Profile()
    prof.enable()
    work()
    prof.disable()
    stats = pstats.Stats(prof)
    stats.sort_stats(sortkey).print_stats(35)


if __name__ == "__main__":
    main()
