"""Local replica of the driver's DuckDB oracle comparison.

Runs every queries() entry at sf0.001 (sf0.01 in CI via
SPARK_GRAFT_SF_DIR) against its oracle_sql() on the same parquet files:
row count, column names, and order-insensitive value equality.
"""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


_PURGE_EVERY = int(os.environ.get("SPARK_GRAFT_TEST_PURGE_TESTS", "15"))
_counter = {"n": 0}


@pytest.fixture(autouse=True)
def _bounded_storage(spark):
    """This ONE module runs 77 queries in a shared session — enough
    accumulated broadcast/cache blocks to fill the storage pool and
    push broadcast builds into the blocking eviction storms described
    in conftest. Every _PURGE_EVERY tests, drop all cached frames and
    nudge both GCs so the context cleaner reclaims dead broadcasts.
    (A mid-module session restart is NOT safe: later module-scoped
    fixtures elsewhere hold DataFrames of the session they saw.)"""
    import gc

    from tests.conftest import clear_session_caches

    _counter["n"] += 1
    if _counter["n"] % _PURGE_EVERY == 0:
        clear_session_caches()
        spark.catalog.clearCache()
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
    yield


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, bool):
        return bool(v)
    return v


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # stringify for sorting so rows containing NULLs stay comparable
    return sorted(
        tuple(repr(_norm(r[i])) for i in order) for r in rows
    )


QUERY_NAMES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(name, spark, sf_dir, ddb):
    q = entry_mod.queries()[name]
    sdf = q(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    if len(spark_rows) != len(duck_rows):
        import sys
        a = _rows_to_set(spark_cols, spark_rows)
        b = _rows_to_set(duck_cols, duck_rows)
        print(f"DEBUG {name}: spark-only:", [r for r in a if r not in b][:5], file=sys.stderr)
        print(f"DEBUG {name}: duck-only:", [r for r in b if r not in a][:5], file=sys.stderr)
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    got = _rows_to_set(spark_cols, spark_rows)
    want = _rows_to_set(duck_cols, duck_rows)
    if got != want:
        diffs = [
            (g, w) for g, w in zip(got, want) if g != w
        ][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "url_canon" in df.columns


def test_crawl_replay_rows_only(spark, sf_dir):
    df = entry_mod.queries()["crawl_replay"](spark, sf_dir)
    n = df.count()
    assert n > 0
    assert df.filter(df.status == "ok").count() > 0
