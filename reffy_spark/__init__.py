"""reffy_spark — a from-scratch PySpark-native crawl/extract analytics engine.

Re-expresses the capabilities of the reference crawler (w3c/reffy — a
single-process Node.js + headless-Chromium pipeline) as an idiomatic
Spark engine:

* a relational URL frontier (canonicalize → URL-seen anti-join →
  host-hash-partitioned politeness ranking) — ``reffy_spark.operators.frontier``
* a BSP round-based fetch/extract scheduler with checkpointed lineage —
  ``reffy_spark.operators.crawler``
* vectorized Arrow/pandas extraction UDFs (one DOM parse per page, all
  modules applied in that pass) — ``reffy_spark.extractors``
* cross-spec post-processing joins (backrefs, annotate-links, events
  consolidation) — ``reffy_spark.plans.postprocess``
* large-scale training-data ops (dedup, similarity search, text quality)
  — ``reffy_spark.operators.dedupe`` / ``similarity`` / ``text_analysis``

Everything is public-API Spark: DataFrame/SQL + Catalyst; pandas UDFs only
where built-ins cannot express the semantics (HTML parsing).
"""

__version__ = "0.1.0"
