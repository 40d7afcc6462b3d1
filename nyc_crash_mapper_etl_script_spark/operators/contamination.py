"""Benchmark-contamination check (training-pipeline north star).

Before training on a corpus you must measure how much of each
document already appears in your evaluation benchmarks -- the
standard test is word n-gram overlap (as published for GPT-3 /
PaLM / Llama decontamination): a training doc is contaminated in
proportion to the fraction of its distinct k-shingles that occur
anywhere in the benchmark set.

Spark shape: both sides reduce to (doc, shingle) rows via the same
codegen shingle expression used by the dedup family
(functions/text.py:shingles), the benchmark side is collapsed to a
DISTINCT shingle set, and the measurement is ONE equi-join on the
shingle followed by a per-doc aggregate.  No pairwise doc x doc
comparison ever happens -- cost is O(corpus shingles + benchmark
shingles) shuffle, and AQE broadcasts the benchmark side outright
when it is small (the common case: benchmarks are MBs, corpora TBs).
Zero-overlap docs are preserved by aggregating matches with a LEFT
join from the per-doc shingle census, and zero-SHINGLE docs (empty
text) by exploding OUTER -- one NULL-shingle row keeps the doc in
the same aggregate, so the whole measurement is one corpus pass
(one scan, one broadcast probe, one partial-agg exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.functions.text import shingles


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    flag_threshold: float = 0.2,
) -> DataFrame:
    """Per-corpus-doc contamination vs the benchmark's shingle set.

    Output: id_col, ``n_shingles`` (distinct k-shingles in the doc),
    ``n_matched`` (of those, how many occur in the benchmark),
    ``contamination`` (ratio, 4 decimals), ``flagged``.
    """
    from nyc_crash_mapper_etl_script_spark.functions.partitioning import (
        ensure_parallelism,
    )

    # single-file corpora: spread the shingle explode across cores
    corpus = ensure_parallelism(corpus)
    benchmark = ensure_parallelism(benchmark)
    # explode_OUTER: a doc whose text yields zero shingles
    # (NULL/empty/whitespace-only) emits one NULL-shingle row instead
    # of vanishing, so the per-doc aggregate below covers EVERY corpus
    # doc in the same single pass -- no second corpus scan, no
    # id-DISTINCT exchange, no join-back (the r11 shape paid all
    # three just to resurface zero-shingle docs).  The NULL shingle
    # never equi-matches the benchmark side and count("sh") skips it,
    # so such docs still surface as n_shingles=0, contamination NULL,
    # flagged false.
    doc_sh = corpus.select(
        F.col(id_col),
        F.explode_outer(F.array_distinct(shingles(F.col(text_col), k))).alias("sh"),
    )
    bench_sh = (
        benchmark.select(F.explode(shingles(F.col(text_col), k)).alias("sh"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    full = (
        doc_sh.join(bench_sh, on="sh", how="left")
        .groupBy(id_col)
        .agg(
            F.count("sh").alias("n_shingles"),
            F.count("__hit").alias("n_matched"),
        )
    )
    n_sh = F.col("n_shingles")
    n_m = F.col("n_matched")
    contamination = F.round(n_m / F.nullif(n_sh, F.lit(0)).cast("double"), 4)
    return full.select(
        F.col(id_col),
        n_sh.alias("n_shingles"),
        n_m.alias("n_matched"),
        contamination.alias("contamination"),
        F.coalesce(contamination > F.lit(flag_threshold), F.lit(False)).alias(
            "flagged"
        ),
    )
