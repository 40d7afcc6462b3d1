"""Sinks (reference §2.1 S6-S11), reformulated functionally.

The reference's mutation surface -- chunked INSERTs sized to API
timeouts (50 rows, main.py:803), 1-query/s UPDATE loops
(main.py:944-960), DELETE-by-id (walkmapper/mysql2carto.py:351-358),
materialized-view REFRESH (refresh_intersections_highestcrashes.py:39-57)
-- exists only because execution was remote and metered.  On
immutable columnar storage every mutation becomes "compute the new
table, write it":

 - append-merge: dedup anti-join + append partitions (S7/S8)
 - overwrite-view: recompute + overwrite (S11); also the UPDATE (S9)
   and DELETE (S10) shapes via join+coalesce / anti-join upstream
 - csv/parquet writers with deterministic ordering (S6, O2)

Scale: writers ``repartition`` to target file counts (the VACUUM/
compaction analog, main.py:1105-1107); partitionBy columns give
partition pruning to downstream scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from nyc_crash_mapper_etl_script_spark.operators.dedup_merge import new_rows


def append_merge(
    staged: DataFrame,
    existing: DataFrame,
    key: str,
    path: str,
    partition_by: list[str] | None = None,
) -> int:
    """S7/S8 upsert sink: append only-new rows to a parquet table.
    Returns the number of rows appended.  Idempotent by construction
    (re-running the same batch appends 0)."""
    fresh = new_rows(staged, existing, key)
    n = fresh.count()
    if n:
        writer = fresh.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
    return n


def overwrite_view(df: DataFrame, path: str, num_files: int = 1) -> None:
    """S11 materialized-view sink: recompute + atomic overwrite
    (the CREATE MATERIALIZED VIEW ... REFRESH cycle)."""
    df.repartition(num_files).write.mode("overwrite").parquet(path)


def write_csv(df: DataFrame, path: str, order_by: list[str] | None = None) -> None:
    """S6 CSV export with the reference's deterministic sort (O2:
    ORDER BY before export, findgeomupdates/1a:15)."""
    out = df.orderBy(*order_by) if order_by else df
    out.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def compact(spark, path: str, target_mb: int = 128) -> int:
    """VACUUM FULL analog (main.py:1105-1107, fixtallies/2:67-71):
    rewrite a parquet table into ~target_mb files.  The reference
    vacuums because MVCC updates bloat pages; here the bloat source
    is small appended files from incremental merges (S7/S8), and the
    fix is the same idea — rewrite storage, contents unchanged.

    Local-FS implementation writes alongside then swaps; on object
    storage use a table format's OPTIMIZE/rewrite action instead.
    Returns the new file count."""
    import os
    import shutil

    df = spark.read.parquet(path)
    total_bytes = sum(
        os.path.getsize(f.replace("file:", "")) for f in df.inputFiles()
    )
    n_files = max(1, round(total_bytes / (target_mb * 1024 * 1024)))
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files
