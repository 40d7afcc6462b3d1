"""plancache: dimension-stat memoization keyed on plan identity.

ADVICE r3 (medium): semanticHash alone is rootPaths-only for file
sources, so a same-path append/overwrite between declarations must
still invalidate the memoized stat -- the key folds in the resolved
file listing.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark import plancache


def test_memo_hits_for_identical_redeclared_plan(spark, tmp_path):
    p = str(tmp_path / "dim")
    spark.range(10).write.parquet(p)
    plancache.clear()
    calls = []

    def stat(df):
        return plancache.memo(
            df, "max", (), lambda: calls.append(1) or df.agg(F.max("id")).first()[0]
        )

    assert stat(spark.read.parquet(p)) == 9
    assert stat(spark.read.parquet(p)) == 9  # fresh declaration, same files
    assert len(calls) == 1


def test_memo_invalidates_on_same_path_append(spark, tmp_path):
    """Appending files at the same directory path changes the resolved
    listing, so the key changes and the stat is recomputed -- a stale
    max-key here would hand out duplicate serial IDs."""
    p = str(tmp_path / "facts")
    spark.range(10).write.parquet(p)
    plancache.clear()

    def stat():
        df = spark.read.parquet(p)
        return plancache.memo(df, "max", (), lambda: df.agg(F.max("id")).first()[0])

    assert stat() == 9
    spark.range(50, 60).write.mode("append").parquet(p)
    assert stat() == 59  # NOT the memoized 9


def test_memo_invalidates_on_same_path_overwrite(spark, tmp_path):
    p = str(tmp_path / "dim2")
    spark.range(5).write.parquet(p)
    plancache.clear()

    def stat():
        df = spark.read.parquet(p)
        return plancache.memo(df, "cnt", (), lambda: df.count())

    assert stat() == 5
    spark.range(7).write.mode("overwrite").parquet(p)
    assert stat() == 7


def test_ensure_parallelism_probe_is_memoized(spark, tmp_path):
    """ADVICE r3 (low): the df.rdd partition-count probe (full
    plan-to-RDD conversion) runs once per plan identity, not per
    declaration."""
    from nyc_crash_mapper_etl_script_spark.functions.partitioning import (
        ensure_parallelism,
    )

    p = str(tmp_path / "corpus")
    spark.range(100).coalesce(1).write.parquet(p)
    plancache.clear()
    ensure_parallelism(spark.read.parquet(p))
    keys_after_first = set(plancache._cache)
    probe_keys = [k for k in keys_after_first if k[0] == "nparts"]
    assert len(probe_keys) == 1
    # re-declared identical plan: cache hit (no new entry), result sane
    out = ensure_parallelism(spark.read.parquet(p))
    assert set(plancache._cache) == keys_after_first
    assert out.count() == 100
