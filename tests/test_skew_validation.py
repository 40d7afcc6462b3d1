"""Skew validation: the salted operators provably BOUND per-task
input on a hot key (VERDICT r2 item 8).

A shuffle task's input for a key-partitioned stage is the row count of
its key group, so the pin is distribution-level: on a synthetic feed
with a hot key holding a large share of all rows,

 - ``salted_join`` spreads the hot key over (key, salt) sub-groups
   whose max size is ~hot/n_salts -- no reducer ever receives the
   whole key;
 - ``asof_join_salted`` windows on (key, time-chunk) whose max group
   is bounded by the chunk width's row count, not the key's.

Wall-clock A/B at sf0.1 lives in ``tools/skew_bench.py`` (numbers
recorded in SURVEY.md); this test pins the structural property that
makes those numbers inevitable at any scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")


def _hot_events(spark, n_rows=20000, hot_share=0.25, n_keys=200):
    """Synthetic events: `hot_share` of rows on key 0, rest uniform."""
    hot = int(n_rows * hot_share)
    return spark.range(n_rows).select(
        F.when(F.col("id") < hot, F.lit(0))
        .otherwise(F.col("id") % n_keys)
        .alias("k"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 7).alias("ts"),
        (F.col("id") % 97).cast("double").alias("value"),
    )


def test_salted_join_bounds_per_task_key_group(spark):
    from nyc_crash_mapper_etl_script_spark.operators.skew import salted_join

    n_salts = 16
    fact = _hot_events(spark)
    dim = spark.range(200).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )

    hot_rows = fact.where(F.col("k") == 0).count()
    # unsalted: one reducer owns the entire hot key
    plain_max = (
        fact.groupBy("k").count().agg(F.max("count").alias("m")).first()["m"]
    )
    assert plain_max == hot_rows

    # salted: the shuffle key is (k, salt); max group ~ hot/n_salts.
    # Allowance 2x for hash unevenness -- the pin is the ORDER OF
    # MAGNITUDE drop, 1/n_salts, not perfect balance.
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    salted_max = (
        fact.withColumn("__salt", salt)
        .groupBy("k", "__salt")
        .count()
        .agg(F.max("count").alias("m"))
        .first()["m"]
    )
    assert salted_max <= 2 * hot_rows / n_salts

    # row parity on the hot data (same result, just rebalanced)
    plain = fact.join(dim, "k").groupBy("k").count()
    salted = salted_join(fact, dim, "k", n_salts=n_salts).groupBy("k").count()
    assert sorted((r["k"], r["count"]) for r in plain.collect()) == sorted(
        (r["k"], r["count"]) for r in salted.collect()
    )


def test_asof_salted_bounds_per_task_window_group(spark):
    from nyc_crash_mapper_etl_script_spark.operators.temporal_join import (
        _cell,
        asof_join,
        asof_join_salted,
    )

    chunk_seconds = 3600
    probe = _hot_events(spark)
    ref = _hot_events(spark, n_rows=4000).select(
        "k", "ts", F.col("value").alias("ref_value")
    )

    hot_rows = probe.where(F.col("k") == 0).count()
    # plain as-of: the window partitions on the key alone -> the hot
    # key's whole history serializes into one task
    plain_max = (
        probe.groupBy("k").count().agg(F.max("count").alias("m")).first()["m"]
    )
    assert plain_max == hot_rows

    # salted: partitions on (key, chunk); every task's input is
    # bounded by the densest chunk, not the key total
    chunked_max = (
        probe.withColumn("__cell", _cell(F.col("ts"), chunk_seconds))
        .groupBy("k", "__cell")
        .count()
        .agg(F.max("count").alias("m"))
        .first()["m"]
    )
    # 20k rows at 7s spacing: one hour holds <= ceil(3600/7)+1 = 515
    assert chunked_max <= 600 < hot_rows

    # semantics parity on the skewed data
    plain = asof_join(
        probe, ref, "k", "ts", "ts", ["ref_value"], probe_cols=["value"]
    )
    salted = asof_join_salted(
        probe,
        ref,
        "k",
        "ts",
        "ts",
        ["ref_value"],
        probe_cols=["value"],
        chunk_seconds=chunk_seconds,
    )
    key = lambda r: (r["k"], r["ts"], r["value"])  # noqa: E731
    assert sorted(map(key, plain.collect())) == sorted(map(key, salted.collect()))


# -- bloom pre-join filter -------------------------------------------------


def test_bloom_prefilter_no_false_negatives_and_exact_compose(spark):
    from nyc_crash_mapper_etl_script_spark.operators.bloomjoin import (
        bloom_contains,
        bloom_build,
        bloom_prefilter,
        bloom_semi_join,
    )

    fact = spark.range(5000).select(
        (F.col("id") % 700).alias("k"), F.col("id").alias("row_id")
    )
    dim = spark.range(97).select((F.col("id") * 7).alias("k"))  # 97 keys

    words = bloom_build(dim, "k", n_bits=512, n_hashes=4)
    assert len(words) == 8 and any(w != 0 for w in words)

    # zero false negatives: every true dim key passes its own filter
    misses = dim.where(
        ~bloom_contains(F.col("k"), words, n_bits=512, n_hashes=4)
    ).count()
    assert misses == 0

    # prefilter is a superset of the exact matches; deterministic
    pre1 = sorted(
        r["row_id"] for r in bloom_prefilter(fact, dim, "k", "k", 512, 4).collect()
    )
    pre2 = sorted(
        r["row_id"] for r in bloom_prefilter(fact, dim, "k", "k", 512, 4).collect()
    )
    assert pre1 == pre2
    exact = sorted(
        r["row_id"]
        for r in fact.join(dim.withColumnRenamed("k", "dk"),
                           F.col("k") == F.col("dk"), "left_semi").collect()
    )
    assert set(exact) <= set(pre1)

    # composed bloom semi-join == plain semi-join, row for row
    composed = sorted(
        r["row_id"] for r in bloom_semi_join(fact, dim, "k", "k", 512, 4).collect()
    )
    assert composed == exact

    # the probe plan is scan+filter only: no join, no shuffle
    plan = bloom_prefilter(fact, dim, "k", "k", 512, 4)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan
