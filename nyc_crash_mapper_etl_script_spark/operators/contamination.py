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
text) by joining the census back onto the full corpus id set.
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
    doc_sh = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), k))).alias("sh"),
    )
    bench_sh = (
        benchmark.select(F.explode(shingles(F.col(text_col), k)).alias("sh"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    per_doc = (
        doc_sh.join(bench_sh, on="sh", how="left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("__hit").alias("n_matched"),
        )
    )
    # join the census back onto the full corpus id set: a doc whose
    # text yields zero shingles (NULL/empty/whitespace-only) has no
    # exploded rows and would otherwise vanish from the output -- it
    # surfaces as n_shingles=0, contamination NULL, flagged false, so
    # a downstream decontamination gate keeps rather than drops it
    ids = corpus.select(F.col(id_col)).distinct()
    full = ids.join(per_doc, on=id_col, how="left")
    n_sh = F.coalesce(F.col("n_shingles"), F.lit(0).cast("long"))
    n_m = F.coalesce(F.col("n_matched"), F.lit(0).cast("long"))
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
