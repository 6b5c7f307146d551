"""Crawl-level CSS consolidation (A9 — the reference's cssmerge).

Re-expression of /root/reference/src/postprocessing/cssmerge.js:99-360 as
a DataFrame pipeline over a LONG table of CSS features. The nested
extract JSON is first flattened into one row per feature (scoped
functions/types hoisted to the root with a ``for`` backlink, nested
at-rules hoisted out of descriptor lists — copyScopedValuesToRootLevel,
cssmerge.js:62-96), then consolidated per category:

* base definition = the (href, syntax)-bearing definition from the
  LATEST level of the spec series (live-on-the-edge, cssmerge.js:211-241)
* property extensions (``newValues``) union into the base syntax with
  `` | ``, recording ``extended`` hrefs; superseded extensions (same
  newValues, newer level) are ignored (cssmerge.js:247-292)
* function/type re-definitions override the base syntax
* at-rule descriptor lists merge across specs, dropping descriptors
  re-defined at a newer level
* scoped features drop when an unscoped twin with the same syntax exists
* legacy aliases inherit the target's syntax

Input rows (one per feature occurrence):
    category      atrules | properties | selectors | functions | types
    name          feature name (types unwrapped from <...>)
    for           scoping construct or null
    href          dfn URL or null
    value         syntax or null
    new_values    newValues or null
    legacy_alias_of
    series        spec series shortname
    series_version  numeric level within the series
    spec_url      crawled URL (fallback for ``extended``)

Output: one row per consolidated feature:
    (category, name, for, href, syntax, extended array<string>)

Descriptor merging is exposed separately via ``merge_descriptors`` since
descriptors live one level down in the extract structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _unwrap_name(name):
    return F.regexp_replace(name, r"^<([^>]+)>$", "$1")


def consolidate_features(features: DataFrame) -> DataFrame:
    """Merge per-spec CSS feature rows into crawl-level entries."""
    f = features.withColumn("name", _unwrap_name(F.col("name")))
    fid = F.concat_ws(
        " for ", F.col("name"), F.col("for")
    )  # getFeatureId (cssmerge.js:367-374)
    f = f.withColumn("_fid", fid)

    # --- base-definition election (cssmerge.js:211-241) -------------------
    # candidates with href+syntax first; else href without newValues;
    # winner = highest series_version (ties broken by href for determinism)
    is_full = F.col("href").isNotNull() & F.col("value").isNotNull()
    is_base_fallback = F.col("href").isNotNull() & F.col("new_values").isNull()
    ranked = f.withColumn(
        "_base_class",
        F.when(is_full, 1).when(is_base_fallback, 2).otherwise(F.lit(None)),
    )
    w = Window.partitionBy("category", "_fid").orderBy(
        F.col("_base_class").asc_nulls_last(),
        F.col("series_version").desc(),
        F.col("href").asc_nulls_last(),
    )
    # the top row per feature id is the base iff it has a base class at all
    with_rank = ranked.withColumn("_rn", F.row_number().over(w))
    base = with_rank.filter((F.col("_rn") == 1) & F.col("_base_class").isNotNull())

    # --- property extensions (cssmerge.js:258-292) -------------------------
    exts = f.filter(F.col("new_values").isNotNull())
    # drop extensions superseded by the same newValues at a newer level
    w_new = Window.partitionBy("category", "_fid", "new_values").orderBy(
        F.col("series_version").desc()
    )
    exts = exts.withColumn("_en", F.row_number().over(w_new)).filter(F.col("_en") == 1)
    ext_agg = exts.groupBy("category", "_fid").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("series_version", "href", "new_values", "spec_url")
                    )
                ),
                lambda s: s["new_values"],
            ),
            " | ",
        ).alias("_ext_values"),
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("series_version", "href", "spec_url"))
            ),
            lambda s: F.coalesce(s["href"], s["spec_url"]),
        ).alias("_ext_hrefs"),
    )

    # --- function/type re-definitions (cssmerge.js:279-290): a row
    # carrying a syntax but NO href (href-bearing losers of the base
    # election are discarded, cssmerge.js:237-240) overrides the base
    redefs = (
        with_rank.filter(
            F.col("href").isNull()
            & F.col("value").isNotNull()
            & F.col("new_values").isNull()
        )
        .groupBy("category", "_fid")
        .agg(
            F.max_by(F.col("value"), F.col("series_version")).alias("_redef_value"),
            F.array(
                F.max_by(F.col("spec_url"), F.col("series_version"))
            ).alias("_redef_hrefs"),
        )
    )

    # redefinitions override the base syntax (cssmerge.js:279-290 —
    # ``else if (dfn.syntax)`` applies even when the base has one);
    # newValues extensions then append to whatever syntax stands
    empty = F.array().cast("array<string>")
    merged = (
        base.join(ext_agg, on=["category", "_fid"], how="left")
        .join(redefs, on=["category", "_fid"], how="left")
        .withColumn(
            "_syn0", F.coalesce(F.col("_redef_value"), F.col("value"))
        )
        .withColumn(
            "syntax",
            F.when(
                F.col("_syn0").isNotNull() & F.col("_ext_values").isNotNull(),
                F.concat(F.col("_syn0"), F.lit(" | "), F.col("_ext_values")),
            ).otherwise(F.col("_syn0")),
        )
        .withColumn(
            "extended",
            F.concat(
                F.when(F.col("_redef_value").isNotNull(), F.col("_redef_hrefs"))
                .otherwise(empty),
                F.when(
                    F.col("_syn0").isNotNull() & F.col("_ext_values").isNotNull(),
                    F.col("_ext_hrefs"),
                ).otherwise(empty),
            ),
        )
    )

    # --- drop scoped features shadowed by an unscoped twin -----------------
    # (cssmerge.js:297-312: keep a scoped feature only when its syntax is
    # known AND differs from the unscoped one)
    unscoped = merged.filter(F.col("for").isNull()).select(
        F.col("category").alias("_ucat"),
        F.col("name").alias("_un"),
        F.col("syntax").alias("_usyn"),
    )
    scoped = merged.filter(F.col("for").isNotNull()).join(
        unscoped,
        (F.col("name") == F.col("_un")) & (F.col("category") == F.col("_ucat")),
        "left",
    )
    scoped = scoped.filter(
        F.col("_un").isNull()
        | (F.col("syntax").isNotNull() & ~F.col("syntax").eqNullSafe(F.col("_usyn")))
    ).drop("_ucat", "_un", "_usyn")
    merged = merged.filter(F.col("for").isNull()).unionByName(
        scoped.select(*merged.columns)
    )

    # --- legacy aliases inherit the target's syntax ------------------------
    alias_target = merged.filter(F.col("for").isNull()).select(
        F.col("category").alias("_tcat"),
        F.col("name").alias("_tn"),
        F.col("syntax").alias("_tsyn"),
    )
    out = merged.join(
        alias_target,
        (F.col("legacy_alias_of") == F.col("_tn"))
        & (F.col("category") == F.col("_tcat")),
        "left",
    ).withColumn(
        "syntax",
        F.when(
            F.col("legacy_alias_of").isNotNull() & F.col("syntax").isNull(),
            F.col("_tsyn"),
        ).otherwise(F.col("syntax")),
    )
    return out.select("category", "name", "for", "href", "syntax", "extended")


def merge_descriptors(descriptors: DataFrame) -> DataFrame:
    """Merge at-rule descriptor rows across specs (cssmerge.js:247-257,
    293-296): one row per (atrule, descriptor), keeping the definition
    from the latest series level.

    Input: (atrule, name, href, value, series, series_version).
    Output: (atrule, name, href, syntax) sorted by descriptor name.
    """
    w = Window.partitionBy("atrule", "name").orderBy(
        F.col("series_version").desc(), F.col("href").asc_nulls_last()
    )
    return (
        descriptors.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("atrule", "name", "href", F.col("value").alias("syntax"))
        .orderBy("atrule", "name")
    )
