"""State-partition right-sizing (streaming/sizing.py): the pinned
count actually lands in the checkpoint's state layout, results are
partition-count-invariant, the session conf is restored, and the
checkpoint -- not the session -- owns the number across restarts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.sources.txstream import (
    CHANGE_COL,
    read_txtable_stream,
)
from nyc_crash_mapper_etl_script_spark.sources.txtable import TxTable
from nyc_crash_mapper_etl_script_spark.streaming.sizing import (
    state_partitions,
)

_CONF = "spark.sql.shuffle.partitions"


@pytest.fixture()
def feed(spark, tmp_path):
    t = TxTable(str(tmp_path / "feed"), retain_history=True)
    rows = [(i, ["NEW", "OPEN", "DONE"][i % 3]) for i in range(60)]
    df = spark.createDataFrame(rows, "k long, status string")
    t.init(df.where(F.col("k") % 4 == 0))
    for i in range(1, 4):
        t.append(df.where(F.col("k") % 4 == i))
    return t


def _rollup(spark, root, ckpt):
    q = (
        read_txtable_stream(spark, root, max_versions_per_batch=1)
        .groupBy("status", CHANGE_COL)
        .agg(F.count("*").alias("rows"))
        .writeStream.format("memory")
        .queryName(os.path.basename(ckpt))
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(300)
    out = {
        (r["status"], r[CHANGE_COL]): r["rows"]
        for r in spark.sql(
            f"select * from {os.path.basename(ckpt)}"
        ).collect()
    }
    spark.catalog.dropTempView(os.path.basename(ckpt))
    return out


def _state_partition_dirs(ckpt):
    # state/<operator_id>/<partition_id>/...: the layout Spark pins at
    # the first micro-batch
    op0 = os.path.join(ckpt, "state", "0")
    return sorted(
        d for d in os.listdir(op0) if d.isdigit()
    )


def test_pinned_count_lands_in_state_layout_and_conf_restored(
    spark, feed, tmp_path
):
    prior = spark.conf.get(_CONF)
    with state_partitions(spark, 4):
        assert spark.conf.get(_CONF) == "4"
        small = _rollup(spark, feed.root, str(tmp_path / "ck4"))
    assert spark.conf.get(_CONF) == prior
    assert _state_partition_dirs(str(tmp_path / "ck4")) == [
        "0", "1", "2", "3",
    ]
    # partition count is an execution knob, never a semantics knob:
    # the default-partition run produces the identical rollup
    default = _rollup(spark, feed.root, str(tmp_path / "ck_default"))
    assert small == default
    n_default = len(_state_partition_dirs(str(tmp_path / "ck_default")))
    assert n_default == int(prior)


def test_checkpoint_owns_the_count_across_restart(spark, feed, tmp_path):
    ckpt = str(tmp_path / "ck_pin")
    with state_partitions(spark, 4):
        first = _rollup(spark, feed.root, ckpt)
    # two more commits arrive; the resume runs OUTSIDE the wrapper
    # with the session default -- the checkpointed 4 must win (Spark
    # cannot re-shuffle existing state)
    extra = spark.createDataFrame(
        [(100 + i, "NEW") for i in range(6)], "k long, status string"
    )
    feed.append(extra)
    feed.append(extra.withColumn("status", F.lit("DONE")))
    resumed = _rollup(spark, feed.root, ckpt)
    assert _state_partition_dirs(ckpt) == ["0", "1", "2", "3"]
    assert resumed[("NEW", "insert")] == first[("NEW", "insert")] + 6
    assert resumed[("DONE", "insert")] == first[("DONE", "insert")] + 6


def test_rejects_nonpositive(spark):
    with pytest.raises(ValueError, match=">= 1"):
        with state_partitions(spark, 0):
            pass


def test_sizing_applies_to_apply_in_pandas_with_state(spark, feed, tmp_path):
    """The sizing rule is an execution property of EVERY stateful
    operator, not just streaming aggregation: a custom
    applyInPandasWithState operator (the stateful CDC classifier)
    pins the same per-partition state layout."""
    from nyc_crash_mapper_etl_script_spark.streaming.stateful import (
        stateful_cdc_classify,
    )

    ckpt = str(tmp_path / "ck_cdc")
    rows = []

    def sink(batch_df, batch_id):
        rows.extend(batch_df.collect())

    with state_partitions(spark, 4):
        src = read_txtable_stream(spark, feed.root).where(
            F.col(CHANGE_COL) == "insert"
        )
        q = (
            stateful_cdc_classify(src, "k", ["status"])
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(300)
    assert _state_partition_dirs(ckpt) == ["0", "1", "2", "3"]
    # one classification per key, each an insert on first sight
    assert {r["cdc_class"] for r in rows} == {"insert"}
    assert len({r["key"] for r in rows}) == 60


def test_state_partitions_for_derives_from_group_cardinality():
    # the r13 rule: ceil(n_groups / 4), floored at 1, capped --
    # derived from the STATE, never from the cluster/core count
    from nyc_crash_mapper_etl_script_spark.streaming.sizing import (
        state_partitions_for,
    )

    assert state_partitions_for(1) == 1
    assert state_partitions_for(4) == 1
    assert state_partitions_for(6) == 2  # the bench drain rollup
    assert state_partitions_for(12) == 3
    assert state_partitions_for(100_000) == 128  # default cap binds
    assert state_partitions_for(100_000, cap=64) == 64
    with pytest.raises(ValueError):
        state_partitions_for(0)
