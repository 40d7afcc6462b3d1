"""Gopher-style rule-based quality filtering (Rae et al. 2021,
"Scaling Language Models: ... Gopher", Appendix A1.1) -- the
published heuristic rule set most LLM corpus pipelines start from,
complementing the score-based gates (``functions.text.quality_score``
is a blended score; ``operators.quality_model`` is a learned gate;
this is the named, thresholded RULE battery).

Every feature is a pure codegen Column over the doc text -- word
features via one split + higher-order functions, line features via a
newline split -- so the whole battery folds into the scan projection:
zero shuffles, zero Python.  At 100 TB this is the cheapest possible
pass shape (embarrassingly parallel map over the scan).

Rules implemented (document kept only if ALL pass):

 - word count in [min_words, max_words]           (Gopher: 50..100k)
 - mean word length in [3, 10]
 - symbol-to-word ratio ('#' and ellipsis) <= 0.1
 - fraction of lines starting with a bullet <= 0.9
 - fraction of lines ending with an ellipsis <= 0.3
 - fraction of words with >= 1 alphabetic char >= 0.8
 - >= 2 of the 8 "stop words" present (the/be/to/of/and/that/have/with)

Reference analog: none in the ETL script -- north-star extension for
LLM corpus prep (SURVEY.md LLM-pipeline section).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def _count_occurrences(text: Column, token: str) -> Column:
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(token), F.lit(""))))
        / F.lit(len(token))
    ).cast("long")


def gopher_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Per-doc Gopher rule features + the combined ``keep`` verdict.

    Output columns: id, n_words, mean_word_len, symbol_word_ratio,
    bullet_line_ratio, ellipsis_line_ratio, alpha_word_ratio,
    stopword_hits, keep.  Ratios are rounded at 4 so any ANSI engine
    reproduces them bit-for-bit.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(t, r"\s+"), lambda x: x != F.lit(""))
    n_words = F.size(words)
    nw_d = n_words.cast("double")
    char_sum = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    mean_word_len = F.when(
        n_words > 0, F.round(char_sum.cast("double") / nw_d, 4)
    ).otherwise(F.lit(0.0))
    n_symbols = (
        _count_occurrences(t, "#")
        + _count_occurrences(t, "...")
        + _count_occurrences(t, "…")
    )
    symbol_ratio = F.when(
        n_words > 0, F.round(n_symbols.cast("double") / nw_d, 4)
    ).otherwise(F.lit(0.0))
    lines = F.split(t, "\n")
    n_lines = F.size(lines).cast("double")
    bullet_first = lambda l: F.substring(F.ltrim(l), 1, 1).isin("-", "*", "•")
    ellipsis_last = lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$")
    bullet_ratio = F.round(
        F.size(F.filter(lines, bullet_first)).cast("double") / n_lines, 4
    )
    ellipsis_ratio = F.round(
        F.size(F.filter(lines, ellipsis_last)).cast("double") / n_lines, 4
    )
    alpha_ratio = F.when(
        n_words > 0,
        F.round(
            F.size(F.filter(words, lambda x: x.rlike("[A-Za-z]"))).cast("double")
            / nw_d,
            4,
        ),
    ).otherwise(F.lit(0.0))
    lowered = F.transform(words, lambda x: F.lower(x))
    stopword_hits = sum(
        (
            F.when(F.array_contains(lowered, sw), 1).otherwise(0)
            for sw in GOPHER_STOPWORDS
        ),
        F.lit(0),
    ).cast("long")
    out = docs.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        symbol_ratio.alias("symbol_word_ratio"),
        bullet_ratio.alias("bullet_line_ratio"),
        ellipsis_ratio.alias("ellipsis_line_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
        stopword_hits.alias("stopword_hits"),
    )
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0)
        & (F.col("symbol_word_ratio") <= 0.1)
        & (F.col("bullet_line_ratio") <= 0.9)
        & (F.col("ellipsis_line_ratio") <= 0.3)
        & (F.col("alpha_word_ratio") >= 0.8)
        & (F.col("stopword_hits") >= 2)
    )
    return out.withColumn("keep", keep)
