"""Seed-list sources (S1/S2, P1/P2, versions union) + multipage merge (S6)."""

import json

import pytest
from pyspark.sql import functions as F

from reffy_spark.extractors import extract_page
from reffy_spark.operators.multipage import merge_multipage
from reffy_spark.sources import seeds as SS

SEED_LIST = [
    {
        "url": "https://www.w3.org/TR/spec-a/",
        "shortname": "spec-a-1",
        "series": {"shortname": "spec-a", "currentSpecification": "spec-a-1"},
        "seriesComposition": "full",
        "nightly": {"url": "https://w3c.github.io/spec-a/", "pages": []},
        "release": {"url": "https://www.w3.org/TR/spec-a/"},
        "standing": "good",
    },
    {
        "url": "https://www.w3.org/TR/old-spec/",
        "shortname": "old-spec",
        "seriesComposition": "full",
        "standing": "discontinued",
    },
    {
        "url": "https://www.w3.org/TR/spec-b/",
        "shortname": "spec-b",
        "seriesComposition": "delta",
        "nightly": {"url": "https://drafts.csswg.org/spec-b/", "pages": []},
        "standing": "good",
    },
]


@pytest.fixture(scope="module")
def seed_df(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("seeds")
    path = str(d / "list.json")
    with open(path, "w") as f:
        json.dump(SEED_LIST, f)
    return SS.read_seed_list(spark, path).cache()


def test_read_and_seed_idx(seed_df):
    rows = seed_df.orderBy("seed_idx").collect()
    assert [r["shortname"] for r in rows] == ["spec-a-1", "old-spec", "spec-b"]
    assert [r["seed_idx"] for r in rows] == [0, 1, 2]


def test_discontinued_filter(seed_df):
    active = SS.filter_active(seed_df)
    assert sorted(r["shortname"] for r in active.collect()) == ["spec-a-1", "spec-b"]


def test_release_filter_and_crawl_url(seed_df):
    rel = SS.select_crawl_url(seed_df, release=True).collect()
    assert [r["shortname"] for r in rel] == ["spec-a-1"]
    assert rel[0]["url_to_crawl"] == "https://www.w3.org/TR/spec-a/"
    nightly = {r["shortname"]: r["url_to_crawl"] for r in SS.select_crawl_url(seed_df).collect()}
    assert nightly["spec-b"] == "https://drafts.csswg.org/spec-b/"
    assert nightly["old-spec"] == "https://www.w3.org/TR/old-spec/"


def test_versions_union(seed_df):
    v = {r["shortname"]: r["versions"] for r in SS.with_versions(seed_df).collect()}
    assert v["spec-a-1"] == [
        "https://www.w3.org/TR/spec-a/",
        "https://w3c.github.io/spec-a/",
    ]
    assert v["old-spec"] == ["https://www.w3.org/TR/old-spec/"]


def test_resolve_spec_refs(spark, seed_df):
    refs = spark.createDataFrame(
        [("spec-a",), ("spec-b",), ("https://w3c.github.io/spec-a/",), ("nope",)],
        "ref string",
    )
    rows = {r["ref"]: r["resolved_shortname"] for r in SS.resolve_spec_refs(refs, seed_df).collect()}
    assert rows["spec-a"] == "spec-a-1"  # series shortname → current spec
    assert rows["spec-b"] == "spec-b"
    assert rows["https://w3c.github.io/spec-a/"] == "spec-a-1"
    assert rows["nope"] is None


def test_multipage_merge_and_extraction(spark):
    pages = spark.createDataFrame(
        [
            ("https://s.test/", "https://s.test/", 0,
             "<html><body><h2 id='one'>1. One</h2></body></html>"),
            ("https://s.test/", "https://s.test/page2", 1,
             "<html><body><h2 id='two'>2. Two</h2></body></html>"),
            ("https://s.test/", "https://s.test/page3", 2,
             "<html><body><p id='three'>x</p></body></html>"),
        ],
        "spec_url string, url string, page_idx int, html string",
    )
    merged = merge_multipage(pages).collect()
    assert len(merged) == 1
    html = merged[0]["html"]
    assert html.index("data-reffy-page=\"https://s.test/page2\"") < html.index(
        "data-reffy-page=\"https://s.test/page3\""
    )
    # per-page absolute URLs via the data-reffy-page ancestor (F3)
    ids = extract_page(html, "https://s.test/", ["ids"])["ids"]
    assert "https://s.test/#one" in ids
    assert "https://s.test/page2#two" in ids
    assert "https://s.test/page3#three" in ids


def test_seed_idx_distributed_multi_file(spark, tmp_path_factory):
    """seed_idx over a SHARDED seed list (the webtext shape: many JSON
    files, each one scan partition under multiLine) must be input order
    across shards — file order then in-file order — with NO data-sized
    unpartitioned window in the plan (VERDICT r5 #3: the old
    row_number-over-monotonic id was a single-task sort)."""
    import re

    d = tmp_path_factory.mktemp("sharded_seeds")
    n_files, per_file = 4, 5
    for fi in range(n_files):
        recs = []
        for ri in range(per_file):
            sn = f"spec-{fi:02d}-{ri}"
            recs.append({
                "url": f"https://www.w3.org/TR/{sn}/",
                "shortname": sn,
                "seriesComposition": "full",
                "standing": "good",
            })
        with open(d / f"part-{fi:02d}.json", "w") as f:
            json.dump(recs, f)
    df = SS.read_seed_list(spark, str(d))
    assert df.rdd.getNumPartitions() > 1  # genuinely multi-partition scan
    rows = df.orderBy("seed_idx").collect()
    assert [r["seed_idx"] for r in rows] == list(range(n_files * per_file))
    # within a shard the in-file order is preserved
    by_file = {}
    for r in rows:
        fi = r["shortname"].split("-")[1]
        by_file.setdefault(fi, []).append(r["shortname"])
    for fi, names in by_file.items():
        assert names == sorted(names), names
    # exact equivalence with the r5 single-window numbering (same scan →
    # same monotonic ids; the contract is row_number(orderBy mono_id)-1)
    from pyspark.sql import Window

    base = spark.read.schema(SS.SEED_SCHEMA).option("multiLine", "true").json(
        str(d)
    )
    old = base.withColumn(
        "seed_idx",
        F.row_number().over(
            Window.orderBy(F.monotonically_increasing_id())
        ) - 1,
    )
    want = {r["shortname"]: r["seed_idx"] for r in old.collect()}
    got = {r["shortname"]: r["seed_idx"] for r in rows}
    assert got == want
    # plan shape: every window orders by the partition id (the ≤num-parts
    # offsets table); none consumes the data-sized monotonic id
    plan = df._jdf.queryExecution().executedPlan().toString()
    for spec in re.findall(r"windowspecdefinition\([^)]*\)", plan):
        assert "_pid" in spec, spec
    assert "BroadcastExchange" in plan  # offsets ride back as a broadcast
