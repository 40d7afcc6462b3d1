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


def bucket_local_agg(
    df: DataFrame,
    key_cols: list[str],
    sum_cols: dict[str, str] | None = None,
    count_col: str | None = "n",
) -> DataFrame:
    """Per-key aggregation with ZERO Exchange, valid ONLY when the
    input's partitioning already co-locates keys: a bucketed catalog
    scan (one Spark partition per bucket) or the bucket-aware
    ``txtable-changes`` micro-batch (partition index == bucket id,
    ``sources/txstream.py``).  Partition-local grouping is then the
    GLOBAL grouping -- no row of a key lives anywhere else -- so the
    plan is a single narrow ``mapInPandas`` stage where a plain
    ``groupBy`` would put an Exchange in every micro-batch.  Arrow
    batches in, one pandas groupby per partition, output bounded by
    distinct keys per bucket.  The caller owns the precondition; on a
    non-co-located input the result has per-partition partial rows
    (same contract as Spark's own partial aggregation, never silent
    wrong totals IF the consumer re-aggregates -- but don't: assert
    the layout instead, tests/test_txstream.py pins it)."""
    import pandas as pd  # noqa: F401 -- worker-side dependency

    from pyspark.sql.types import LongType, StructField, StructType

    sums = dict(sum_cols or {})
    by_name = {f.name: f for f in df.schema.fields}
    out_fields = [by_name[k] for k in key_cols]
    if count_col:
        out_fields.append(StructField(count_col, LongType(), False))
    for out, src in sums.items():
        out_fields.append(StructField(out, by_name[src].dataType, True))
    schema = StructType(out_fields)
    in_cols = list(key_cols) + sorted(set(sums.values()))

    def fold(batches):
        import pandas as pd

        parts = []
        for pdf in batches:
            g = pdf[in_cols].groupby(key_cols, dropna=False, sort=False)
            agg = {}
            if count_col:
                agg[count_col] = g.size()
            for out, src in sums.items():
                agg[out] = g[src].sum(min_count=1)
            parts.append(pd.DataFrame(agg))
        if not parts:
            return
        merged = pd.concat(parts)
        g = merged.groupby(level=list(range(len(key_cols))), sort=False)
        out = {}
        if count_col:
            out[count_col] = g[count_col].sum()
        for o in sums:
            out[o] = g[o].sum(min_count=1)
        res = pd.DataFrame(out).reset_index()
        res.columns = list(key_cols) + list(out)
        yield res

    return df.mapInPandas(fold, schema)
