"""Crawl-level cssmerge consolidation tests, modeled on the scenarios in
/root/reference/test/merge-css.js (base + newValues union, latest-level
election, descriptor merge, scoped-shadow drop, legacy alias)."""

from pyspark.sql import functions as F  # noqa: F401

from reffy_spark.plans.cssmerge import consolidate_features, merge_descriptors

COLS = (
    "category string, name string, for string, href string, value string, "
    "new_values string, legacy_alias_of string, series string, "
    "series_version double, spec_url string"
)


def rows_by_name(df):
    return {(r["category"], r["name"], r["for"]): r for r in df.collect()}


def test_property_extension_union(spark):
    feats = spark.createDataFrame(
        [
            ("properties", "color", None, "https://s1/#c", "red | blue",
             None, None, "css-color", 3.0, "https://s1/"),
            ("properties", "color", None, "https://s2/#c", None,
             "green", None, "css-color", 4.0, "https://s2/"),
        ],
        COLS,
    )
    out = rows_by_name(consolidate_features(feats))
    c = out[("properties", "color", None)]
    assert c["syntax"] == "red | blue | green"
    assert c["extended"] == ["https://s2/#c"]
    assert c["href"] == "https://s1/#c"


def test_latest_level_base_wins(spark):
    feats = spark.createDataFrame(
        [
            ("properties", "gap", None, "https://l1/#g", "<length>",
             None, None, "css-align", 1.0, "https://l1/"),
            ("properties", "gap", None, "https://l2/#g", "<length> | normal",
             None, None, "css-align", 2.0, "https://l2/"),
        ],
        COLS,
    )
    out = rows_by_name(consolidate_features(feats))
    g = out[("properties", "gap", None)]
    assert g["syntax"] == "<length> | normal" and g["href"] == "https://l2/#g"


def test_superseded_extension_ignored(spark):
    feats = spark.createDataFrame(
        [
            ("properties", "p", None, "https://b/#p", "a",
             None, None, "s", 1.0, "https://b/"),
            ("properties", "p", None, "https://e1/#p", None,
             "x", None, "s2", 1.0, "https://e1/"),
            ("properties", "p", None, "https://e2/#p", None,
             "x", None, "s2", 2.0, "https://e2/"),
        ],
        COLS,
    )
    out = rows_by_name(consolidate_features(feats))
    # the level-2 re-definition of the same newValues wins; only one union
    assert out[("properties", "p", None)]["syntax"] == "a | x"
    assert out[("properties", "p", None)]["extended"] == ["https://e2/#p"]


def test_type_redefinition_overrides(spark):
    feats = spark.createDataFrame(
        [
            ("types", "<image>", None, "https://b/#i", "url()",
             None, None, "css-images", 3.0, "https://b/"),
            ("types", "<image>", None, None, "url() | gradient()",
             None, None, "css-images", 4.0, "https://n/"),
        ],
        COLS,
    )
    out = rows_by_name(consolidate_features(feats))
    i = out[("types", "image", None)]  # unwrapped name
    assert i["syntax"] == "url() | gradient()"
    assert i["extended"] == ["https://n/"]


def test_scoped_shadowed_by_unscoped_dropped(spark):
    feats = spark.createDataFrame(
        [
            ("functions", "fit()", None, "https://u/#f", "fit(x)",
             None, None, "s", 1.0, "https://u/"),
            ("functions", "fit()", "grid", "https://sc/#f", "fit(x)",
             None, None, "s", 1.0, "https://sc/"),
            ("functions", "minmax()", "grid", "https://m/#m", "minmax(a, b)",
             None, None, "s", 1.0, "https://m/"),
        ],
        COLS,
    )
    out = rows_by_name(consolidate_features(feats))
    assert ("functions", "fit()", "grid") not in out  # same syntax → dropped
    assert ("functions", "fit()", None) in out
    assert ("functions", "minmax()", "grid") in out  # no unscoped twin


def test_legacy_alias_inherits_syntax(spark):
    feats = spark.createDataFrame(
        [
            ("properties", "word-wrap", None, "https://a/#ww", None,
             None, "overflow-wrap", "css-text", 3.0, "https://a/"),
            ("properties", "overflow-wrap", None, "https://a/#ow", "normal | break-word",
             None, None, "css-text", 3.0, "https://a/"),
        ],
        COLS,
    )
    out = rows_by_name(consolidate_features(feats))
    assert out[("properties", "word-wrap", None)]["syntax"] == "normal | break-word"


def test_merge_descriptors_latest_level(spark):
    descs = spark.createDataFrame(
        [
            ("@font-face", "font-display", "https://l1/#fd", "auto",
             "css-fonts", 4.0),
            ("@font-face", "font-display", "https://l2/#fd", "auto | block",
             "css-fonts", 5.0),
            ("@font-face", "src", "https://l1/#src", "<url>", "css-fonts", 4.0),
        ],
        "atrule string, name string, href string, value string, "
        "series string, series_version double",
    )
    rows = [(r["name"], r["syntax"]) for r in merge_descriptors(descs).collect()]
    assert rows == [("font-display", "auto | block"), ("src", "<url>")]
