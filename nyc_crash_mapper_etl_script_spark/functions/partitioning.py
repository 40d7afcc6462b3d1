"""Input-parallelism guard for per-row-expensive passes.

A stage's parallelism is its INPUT partitioning: a corpus that
arrives as one small parquet file (under ``maxPartitionBytes`` -> ONE
scan partition) runs every pre-shuffle operator -- Arrow signature
UDFs, shingle explodes, regex pipelines -- on a single core, no
matter how many the cluster has.  ``ensure_parallelism`` spreads such
inputs with one narrow-row shuffle; at real scale (thousands of scan
partitions) the guard is a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, cap: int = 64) -> DataFrame:
    """Repartition ``df`` when its layout has fewer partitions than
    the cluster's default parallelism (capped).  The partition-count
    probe plans the subtree but runs no job."""
    target = min(df.sparkSession.sparkContext.defaultParallelism, cap)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
