"""Bucketed-table co-located joins: the shuffle was paid at write.

Pins the 100 TB contract of sources/bucketed.py: a sort-merge join of
two tables bucketed on the same key plans NO Exchange (the shuffle
was paid once at write), while the identical plain-parquet join
shuffles both sides -- and the results are row-identical.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")


def test_bucketed_join_has_no_exchange_or_sort(spark, tmp_path_factory):
    from nyc_crash_mapper_etl_script_spark.sources.bucketed import (
        read_table,
        write_bucketed,
    )

    base = tmp_path_factory.mktemp("bucketed")
    left = spark.range(10_000).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("lv")
    )
    right = spark.range(5_000).select(
        (F.col("id") % 500).alias("k"), (F.col("id") * 3).alias("rv")
    )
    try:
        write_bucketed(left, "bk_left", str(base / "l"), "k", n_buckets=8)
        write_bucketed(right, "bk_right", str(base / "r"), "k", n_buckets=8)

        bl, br = read_table(spark, "bk_left"), read_table(spark, "bk_right")
        # force SMJ so auto-broadcast can't hide the property under test
        joined = bl.hint("merge").join(br, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # (a per-partition Sort remains: Spark only propagates bucket
        # SORT order when each bucket is a single file, gated behind a
        # legacy conf -- the scale-relevant property is the absent
        # Exchange; the residual sort is partition-local and spills)

        # the plain-parquet twin of the same data DOES shuffle
        pl = spark.read.parquet(str(base / "l"))
        pr = spark.read.parquet(str(base / "r"))
        plain = pl.hint("merge").join(pr, "k")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan

        # row parity
        agg = lambda df: sorted(  # noqa: E731
            (r["k"], r["n"], r["s"])
            for r in df.groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("rv").alias("s"))
            .collect()
        )
        assert agg(joined) == agg(plain)

        # ...and a groupBy on the bucket key also skips the exchange
        gplan = (
            bl.groupBy("k").agg(F.sum("lv"))._jdf.queryExecution()
            .executedPlan().toString()
        )
        assert "Exchange" not in gplan, "bucketed aggregation must not shuffle"
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")
