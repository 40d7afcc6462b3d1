"""Physical-plan shape guarantees (the 100 TB story, checked at
unit scale): filter/projection pushdown reach the parquet scan (P2,
reference pushes SoQL ``$select``/``$where`` at main.py:92, 834),
small dimensions broadcast, and whole-stage codegen covers the hot
expressions."""

from __future__ import annotations

from pyspark.sql import functions as F


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_parquet_filter_and_projection_pushdown(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("pushdown") / "t.parquet")
    spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 7).alias("a"),
        (F.col("id") % 11).alias("b"),
        F.concat(F.lit("x"), F.col("id")).alias("c"),
    ).write.mode("overwrite").parquet(p)

    df = spark.read.parquet(p).where(F.col("a") > 3).select("id", "a")
    plan = _executed(df)
    # filter reaches the scan
    assert "PushedFilters: [IsNotNull(a), GreaterThan(a,3)]" in plan
    # untouched columns b, c are pruned from the read schema
    assert "ReadSchema: struct<id:bigint,a:bigint>" in plan


def test_enrichment_join_broadcasts_dimension(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("bjoin"))
    spark.range(5000).select(
        F.col("id"), (F.col("id") % 50).alias("k")
    ).write.mode("overwrite").parquet(base + "/fact.parquet")
    spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    ).write.mode("overwrite").parquet(base + "/dim.parquet")

    fact = spark.read.parquet(base + "/fact.parquet")
    dim = spark.read.parquet(base + "/dim.parquet")
    plan = _executed(fact.join(F.broadcast(dim), "k", "left"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_hot_expressions_stay_in_codegen(spark):
    """Blame-style conditional cascades are pure Column exprs — they
    must appear inside a WholeStageCodegen span, not a Python eval."""
    from nyc_crash_mapper_etl_script_spark.functions.geo import haversine_m

    df = spark.range(100).select(
        F.col("id").cast("double").alias("x")
    )
    out = df.select(
        haversine_m(F.lit(-74.0), F.lit(40.7), F.col("x") / 1000 - 74.0, F.lit(40.7)).alias("d")
    )
    plan = _executed(out)
    # '*(n)' prefixes mark WholeStageCodegen spans in toString() form
    assert "*(1)" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_month_partitioned_fact_prunes(spark, tmp_path_factory):
    """The reference derives year/month string columns
    (main.py:287-288) — here they are the fact table's physical
    partition keys, so the nightly month-window queries (P3/P4, C5
    backfill) touch only the partitions in the window."""
    p = str(tmp_path_factory.mktemp("fact") / "crashes")
    df = spark.range(2000).select(
        F.col("id"),
        F.concat(F.lit("20"), (F.lit(20) + F.col("id") % 3)).alias("year"),
        F.lpad(((F.col("id") % 12) + 1).cast("string"), 2, "0").alias("month"),
        (F.col("id") % 97).alias("injured"),
    )
    df.write.partitionBy("year", "month").mode("overwrite").parquet(p)

    q = spark.read.parquet(p).where(
        (F.col("year") == "2021") & (F.col("month") == "06")
    )
    plan = _executed(q)
    assert "PartitionFilters" in plan
    assert "(year = 2021)" in plan.replace("'", "") or "year#" in plan
    # pruned scan reads 1 of 36 partitions
    scan = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scan, plan
    files_read = q.select(F.input_file_name()).distinct().count()
    all_files = spark.read.parquet(p).select(F.input_file_name()).distinct().count()
    assert files_read < all_files / 10


def test_bucketed_tables_join_without_shuffle(spark):
    """Co-located join (SURVEY §4 'bucketing for co-located joins'):
    two tables bucketed on the join key by the same bucket count join
    with NO Exchange on either side — the shuffle is paid once at
    write time, then every downstream join of the pair is free.  At
    100 TB this is the difference between re-shuffling the fact table
    per enrichment pass and scanning it in place."""
    spark.sql("DROP TABLE IF EXISTS fact_b")
    spark.sql("DROP TABLE IF EXISTS dim_b")
    spark.range(10000).select(
        F.col("id"), (F.col("id") % 200).alias("k"), (F.col("id") % 7).alias("v")
    ).write.bucketBy(8, "k").sortBy("k").saveAsTable("fact_b")
    spark.range(200).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    ).write.bucketBy(8, "k").saveAsTable("dim_b")

    fact = spark.table("fact_b")
    dim = spark.table("dim_b")
    # disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = fact.join(dim.hint("shuffle_merge"), "k")
        plan = _executed(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == 10000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS fact_b")
        spark.sql("DROP TABLE IF EXISTS dim_b")
