"""Repetition-based quality profiling (Gopher-style filters).

The strongest cheap predictors of low-quality web text are
repetition ratios: type/token ratio, most-common-unigram share and
most-common-bigram share (Rae et al. 2021, "Scaling Language Models:
... Gopher", §A1.1 quality heuristics).  Computing a per-document
mode would be an O(len^2) higher-order expression per row; the scale
shape is RELATIONAL instead: explode words once, count (doc, word)
pairs, take per-doc max/sum/count -- two partial-aggregated shuffles
keyed by doc, each map-side combined, no UDF, no per-row quadratic
work.  Bigrams reuse the exploded order via array zip before the
explode, so text is parsed exactly once per n-gram order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _words(text_col):
    norm = F.regexp_replace(
        F.lower(F.trim(F.coalesce(text_col, F.lit("")))), r"\s+", " "
    )
    return F.filter(F.split(norm, " "), lambda w: w != "")


def repetition_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc repetition stats: ``n_words``, ``n_types``,
    ``type_token_ratio``, ``top_unigram_frac``, ``top_bigram_frac``
    (0.0 when the doc has fewer than two words).  Docs with zero
    words are dropped (nothing to profile)."""
    words = df.select(F.col(id_col), _words(F.col(text_col)).alias("__words"))

    uni = words.select(id_col, F.explode("__words").alias("wd"))
    ucnt = uni.groupBy(id_col, "wd").agg(F.count("*").alias("c"))
    ustat = ucnt.groupBy(id_col).agg(
        F.sum("c").alias("n_words"),
        F.count("*").alias("n_types"),
        F.max("c").alias("top_uni"),
    )

    bigrams = words.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size("__words") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("__words") - 1),
                    lambda i: F.concat_ws(" ", F.slice(F.col("__words"), i, 2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bg"),
    )
    bcnt = bigrams.groupBy(id_col, "bg").agg(F.count("*").alias("c"))
    bstat = bcnt.groupBy(id_col).agg(
        F.sum("c").alias("n_bigrams"), F.max("c").alias("top_big")
    )

    return (
        ustat.join(bstat, on=id_col, how="left")
        .select(
            F.col(id_col),
            F.col("n_words"),
            F.col("n_types"),
            F.round(F.col("n_types") / F.col("n_words").cast("double"), 4).alias(
                "type_token_ratio"
            ),
            F.round(F.col("top_uni") / F.col("n_words").cast("double"), 4).alias(
                "top_unigram_frac"
            ),
            F.round(
                F.coalesce(
                    F.col("top_big") / F.col("n_bigrams").cast("double"),
                    F.lit(0.0),
                ),
                4,
            ).alias("top_bigram_frac"),
        )
    )
