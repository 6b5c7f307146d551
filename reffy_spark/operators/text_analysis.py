"""Document-level text analysis for training-data pipelines.

Thin operator layer over the Column kernels in
``reffy_spark.functions.text``: language-ID, quality scoring, token
counting, fingerprinting — one scan, no shuffle, all whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from reffy_spark.functions.text import (
    fingerprint_col,
    lang_id_col,
    quality_score_col,
    stopword_ratio_col,
    token_count_col,
    STOPWORDS_EN,
)


def profile_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document analysis profile (single pass over the text column)."""
    t = F.col(text_col)
    n_tok = token_count_col(t)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_tok.cast("long").alias("n_tokens"),
        F.length(t).cast("long").alias("n_chars"),
        F.round(
            F.when(n_tok == 0, F.lit(0.0)).otherwise(
                F.length(t).cast("double") / n_tok.cast("double")
            ),
            6,
        ).alias("mean_token_len"),
        F.round(stopword_ratio_col(t, STOPWORDS_EN), 6).alias("stopword_ratio"),
        quality_score_col(t).alias("quality"),
        lang_id_col(t).alias("lang_pred"),
        fingerprint_col(t).alias("fingerprint"),
    )


def quality_filter(
    docs: DataFrame, min_quality: float = 0.5, text_col: str = "text"
) -> DataFrame:
    """Keep documents above the quality threshold (pushdown-friendly:
    the predicate is pure expressions over the text column)."""
    return docs.filter(quality_score_col(F.col(text_col)) >= min_quality)


def language_partition(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add the predicted language — the partition column a multilingual
    corpus would be written by (``partitionBy("lang_pred")``)."""
    return docs.withColumn("lang_pred", lang_id_col(F.col(text_col)))


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace vs BPE-ish token counts per document.

    The two counts bracket real LLM tokenizer behavior: whitespace
    undercounts punctuation/code; the GPT-2-style split overcounts
    agglutinative words. ``bpe_per_ws`` is the budget-planning ratio."""
    from reffy_spark.functions.text import bpe_token_count_col

    t = F.col(text_col)
    ws = token_count_col(t).cast("long")
    bpe = bpe_token_count_col(t)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.round(
            F.when(ws == 0, F.lit(0.0)).otherwise(
                bpe.cast("double") / ws.cast("double")
            ),
            6,
        ).alias("bpe_per_ws"),
        F.round(
            F.when(bpe == 0, F.lit(0.0)).otherwise(
                F.length(t).cast("double") / bpe.cast("double")
            ),
            6,
        ).alias("chars_per_bpe"),
    )
