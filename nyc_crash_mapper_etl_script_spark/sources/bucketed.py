"""Bucketed-table storage: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-to-fact equi-join is shuffling
both sides on the key.  Writing each side ``bucketBy(n, key)`` +
``sortBy(key)`` pre-partitions (and pre-sorts) the data ON DISK: a
later sort-merge join of two tables bucketed the same way reads
matching buckets pairwise and needs NO Exchange at query time -- the
shuffle was paid once at write, amortized over every subsequent
join/aggregation on that key (the same contract as Hive bucketing /
Iceberg bucket partition transforms).  A partition-local Sort
remains in the plan unless every bucket is a single file (Spark
gates sorted-scan ordering behind a legacy conf); that sort is
shuffle-free and spills, so the scale-critical property is the
absent Exchange.

Spark requires bucketed data to live in a catalog table (the bucket
metadata rides in the table definition, not the files), so the writer
takes both a path (external table location) and a table name.
``tests/test_bucketing.py`` pins the no-Exchange plan shape
and row parity against the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external bucketed (and by default
    bucket-sorted) parquet table registered as ``table``."""
    w = df.write.format("parquet").mode(mode).option("path", path).bucketBy(
        n_buckets, key
    )
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read that keeps the bucket metadata (a plain
    ``spark.read.parquet(path)`` of the same files would lose it and
    re-shuffle on the next join)."""
    return spark.table(table)
