"""Single-process reference simulator for the BSP crawl semantics.

Plays the role of the reference crawler in parity tests (the analog of
asserting against test/crawl-test.json in the reference's e2e test,
/root/reference/test/crawl.js:51-68): an independent, trivially-auditable
Python implementation of the same crawl contract — politeness budgets,
per-host ordering, URL-seen semantics — that the distributed engine must
reproduce exactly (SURVEY.md §7.3 invariant 3).

Deliberately shares only the scalar kernels (url_canon, host_group) and
the page-level extractor with the engine; all set/ordering logic here is
plain dicts and sorts.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from reffy_spark.extractors.base import extract_page
from reffy_spark.functions.urls import host_group_py, host_of_py, url_canon_py


@dataclass
class SimResult:
    # (url_canon, round, host_group, host_fetch_rank, status, depth)
    fetches: list[tuple]
    url_seen: dict[str, int]  # url_canon -> first_round
    frontier_by_round: dict[int, set] = field(default_factory=dict)


def _robots_allows(rules: list[dict], host: str, path: str) -> bool:
    best = None
    for r in rules:
        if r["host"] == host and path.startswith(r["path_prefix"]):
            if best is None or len(r["path_prefix"]) > len(best["path_prefix"]):
                best = r
    return best is None or bool(best["allow"])


def _path_of(url_canon: str) -> str:
    rest = url_canon.split("://", 1)[-1]
    i = rest.find("/")
    return rest[i:] if i >= 0 else "/"


def simulate_crawl(
    seed_urls: list[str],
    pages: list[dict],  # rows with url, html, optional warc_ts
    robots: list[dict],
    round_ms: int = 2000,
    max_rounds: int = 10,
    default_delay_ms: int = 100,
) -> SimResult:
    # canonical key uniqueness: freshest capture wins (max warc_ts, then
    # max url) — must match CrawlEngine's pages dedup rule exactly.
    best: dict[str, tuple] = {}
    for row in pages:
        c = url_canon_py(row["url"])
        key = (row.get("warc_ts"), row["url"])
        if c not in best or key > best[c][0]:
            best[c] = (key, row["html"])
    pages_by_canon = {c: h for c, (_k, h) in best.items()}

    def delay_of(host: str) -> int:
        ds = [r["crawl_delay_ms"] for r in robots if r["host"] == host]
        return max(ds) if ds else default_delay_ms

    # frontier rows: url_canon -> (priority, depth)
    frontier: dict[str, tuple[float, int]] = {}
    seen: dict[str, int] = {}
    for u in seed_urls:
        c = url_canon_py(u)
        if c in frontier:
            continue
        if not _robots_allows(robots, host_of_py(c), _path_of(c)):
            continue
        frontier[c] = (1.0, 0)
        seen.setdefault(c, 0)

    fetches: list[tuple] = []
    frontier_by_round = {0: set(frontier)}

    for rnd in range(1, max_rounds + 1):
        if not frontier:
            break
        # group pending by host_group
        groups: dict[str, list[str]] = {}
        for c in frontier:
            groups.setdefault(host_group_py(c), []).append(c)

        batch: list[tuple[str, str, int]] = []  # (url_canon, group, rank)
        for g, urls in groups.items():
            budget = min(
                max(1, round_ms // delay_of(host_of_py(c))) for c in urls
            )
            ordered = sorted(
                urls, key=lambda c: (-frontier[c][0], frontier[c][1], c)
            )
            for rank, c in enumerate(ordered[:budget], start=1):
                batch.append((c, g, rank))

        discovered: list[str] = []
        for c, g, rank in batch:
            html = pages_by_canon.get(c)
            status = "ok" if html is not None else "notfound"
            depth = frontier[c][1]
            fetches.append((c, rnd, g, rank, status, depth))
            if html is not None:
                links = extract_page(html, c, ["links"])["links"]
                for kind in ("rawlinks", "autolinks"):
                    discovered.extend(links[kind].keys())

        for c, _g, _r in batch:
            del frontier[c]

        for u in sorted(set(url_canon_py(x) for x in discovered)):
            if u in seen:
                continue
            if not _robots_allows(robots, host_of_py(u), _path_of(u)):
                continue
            seen[u] = rnd
            frontier[u] = (1.0 / (rnd + 1.0), rnd)

        frontier_by_round[rnd] = set(frontier)

    return SimResult(fetches=fetches, url_seen=seen, frontier_by_round=frontier_by_round)
