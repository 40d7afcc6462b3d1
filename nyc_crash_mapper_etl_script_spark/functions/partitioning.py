"""Input-parallelism guard for per-row-expensive passes.

A stage's parallelism is its INPUT partitioning: a corpus that
arrives as one small parquet file (under ``maxPartitionBytes`` -> ONE
scan partition) runs every pre-shuffle operator -- Arrow signature
UDFs, shingle explodes, regex pipelines -- on a single core, no
matter how many the cluster has.  ``ensure_parallelism`` spreads such
inputs with one narrow-row shuffle; at real scale (thousands of scan
partitions) the guard is a no-op.

The partition-count probe (``df.rdd.getNumPartitions()``) forces a
full plan-to-RDD conversion on the driver -- physical planning for
the whole subtree -- so its RESULT is memoized on the plan's identity
(semantic hash + input-file listing, via :mod:`plancache`): every
dedup/similarity/contamination entry point calls this guard, and a
service-style caller re-declaring the same pipeline should pay the
probe once, not per declaration.  Callers that have already
positioned their data (an explicit ``repartition``/``repartitionByRange``
immediately upstream) should bypass the guard entirely rather than
stack a second shuffle on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from nyc_crash_mapper_etl_script_spark import plancache


def ensure_parallelism(df: DataFrame, cap: int = 64) -> DataFrame:
    """Repartition ``df`` when its layout has fewer partitions than
    the cluster's default parallelism (capped).  The partition-count
    probe plans the subtree but runs no job; its result is memoized
    per plan identity so repeated declarations skip the planning
    pass."""
    target = min(df.sparkSession.sparkContext.defaultParallelism, cap)
    n = plancache.memo(
        df, "nparts", (), lambda: df.rdd.getNumPartitions()
    )
    if n < target:
        return df.repartition(target)
    return df
