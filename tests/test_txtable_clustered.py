"""TxTable cluster-by write hint (r3 VERDICT item 7): the
bucketed+sorted layout is persisted in the commit log, read back as a
catalog bucketed scan, and an as-of fill over it plans with ZERO
Exchange and ZERO Sort -- the write paid the shuffle+sort once."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.operators.temporal_join import (
    asof_fill,
    asof_join,
)
from nyc_crash_mapper_etl_script_spark.sources.txtable import TxTable

SPEC = (["k"], ["k", "ts", "tag"], 4)


def _timeline(spark):
    # refs: (k, ts, tag=0, v); probes: (k, ts, tag=1, pid)
    refs = [(k, t, 0, f"v{k}-{t}", None) for k in range(5) for t in (10, 20, 30)]
    probes = [
        (k, t, 1, None, k * 100 + t) for k in range(5) for t in (5, 15, 25, 35)
    ]
    return spark.createDataFrame(
        refs + probes, "k long, ts long, tag int, v string, pid long"
    )


def _plan(df) -> str:
    df.collect()  # AQE: final plan only exists after execution
    return df._jdf.queryExecution().executedPlan().toString()


def _expected(spark):
    tl = _timeline(spark)
    return sorted(
        (r["k"], r["ts"], r["pid"], r["asof_ts"], r["asof_v"])
        for r in asof_join(
            tl.where("tag = 1").select("k", "ts", "pid"),
            tl.where("tag = 0").select("k", "ts", "v"),
            "k",
            "ts",
            "ts",
            ["v"],
        ).collect()
    )


def _got(out):
    return sorted(
        (r["k"], r["ts"], r["pid"], r["asof_ts"], r["asof_v"])
        for r in out.collect()
    )


def test_clustered_asof_fill_plans_no_exchange_no_sort(spark, tmp_path):
    t = TxTable(str(tmp_path / "tl"), cluster_by=SPEC)
    t.init(_timeline(spark))
    out = asof_fill(t.read_clustered(spark), "k", "ts", "tag", ["v"])
    plan = _plan(out)
    assert "Exchange" not in plan
    assert not re.search(r"\bSort\b", plan)
    assert "Bucketed: true" in plan
    assert _got(out) == _expected(spark)


def test_append_drops_sort_claim_compact_restores_it(spark, tmp_path):
    t = TxTable(str(tmp_path / "tl"), cluster_by=SPEC)
    tl = _timeline(spark)
    t.init(tl.where("ts <= 20"))
    t.append(tl.where("ts > 20"))  # second file per bucket
    out = asof_fill(t.read_clustered(spark), "k", "ts", "tag", ["v"])
    plan = _plan(out)
    assert "Exchange" not in plan  # partitioning claim survives appends
    assert re.search(r"\bSort\b", plan)  # ordering claim does not
    assert _got(out) == _expected(spark)

    t.compact(spark)  # one file per bucket again
    out = asof_fill(t.read_clustered(spark), "k", "ts", "tag", ["v"])
    plan = _plan(out)
    assert "Exchange" not in plan
    assert not re.search(r"\bSort\b", plan)
    assert _got(out) == _expected(spark)


def test_spec_persisted_in_log_and_inherited(spark, tmp_path):
    root = str(tmp_path / "tl")
    TxTable(root, cluster_by=SPEC).init(_timeline(spark))
    fresh = TxTable(root)  # no cluster_by argument
    assert fresh.cluster_spec() == SPEC
    # a write through the fresh handle stays clustered (bucket ids in
    # filenames) and the clustered read keeps working
    fresh.append(
        spark.createDataFrame([(9, 40, 0, "v9", None)], "k long, ts long, tag int, v string, pid long")
    )
    assert all("_000" in f for f in fresh._live_files())
    out = asof_fill(fresh.read_clustered(spark), "k", "ts", "tag", ["v"])
    assert "Exchange" not in _plan(out)


def test_cluster_by_excludes_partition_and_zorder(spark, tmp_path):
    with pytest.raises(ValueError, match="mutually exclusive"):
        TxTable(str(tmp_path / "x"), partition_by=["p"], cluster_by=SPEC)
    t = TxTable(str(tmp_path / "tl"), cluster_by=SPEC)
    t.init(_timeline(spark))
    with pytest.raises(ValueError, match="zorder_by conflicts"):
        t.compact(spark, zorder_by=("ts", "pid"))


def test_clustered_merge_keeps_layout_and_rows(spark, tmp_path):
    t = TxTable(str(tmp_path / "tl"), cluster_by=SPEC)
    t.init(_timeline(spark))
    # replace one ref row's value via merge on a synthetic key
    tl = _timeline(spark).withColumn(
        "rid", F.col("k") * 1000 + F.col("ts") * 10 + F.col("tag")
    )
    t2 = TxTable(str(tmp_path / "tl2"), cluster_by=(["k"], ["k", "ts", "tag"], 4))
    t2.init(tl)
    t2.merge(
        tl.where("rid = 100").withColumn("v", F.lit("UPDATED")), "rid"
    )
    got = {r["rid"]: r["v"] for r in t2.read(spark).collect()}
    assert got[100] == "UPDATED"
    assert all("_000" in f for f in t2._live_files())
    out = asof_fill(
        t2.read_clustered(spark).drop("rid"), "k", "ts", "tag", ["v"]
    )
    plan = _plan(out)
    assert "Exchange" not in plan
    assert not re.search(r"\bSort\b", plan)  # merge rewrote all buckets sorted


def test_read_clustered_snapshot_vs_concurrent_writes(spark, tmp_path):
    """Concurrency contract of the clustered catalog read: a handle
    planned before an APPEND keeps serving its (stale but
    consistent) snapshot -- appended files are invisible until
    read_clustered is called again, which re-registers the table and
    re-lists.  A COMPACT (eager-delete) invalidates the stale
    handle's planned files; re-calling read_clustered recovers.
    This is the same freshness model as any path-listing scan; the
    commit log (TxTable.read) remains the strongly-consistent path."""
    t = TxTable(str(tmp_path / "tl"), cluster_by=SPEC)
    tl = _timeline(spark)
    t.init(tl.where("ts <= 20"))

    handle = t.read_clustered(spark)
    n0 = handle.count()

    t.append(tl.where("ts > 20"))
    # stale handle: consistent pre-append snapshot
    assert handle.count() == n0
    # fresh handle: sees the append
    fresh = t.read_clustered(spark)
    assert fresh.count() == tl.count()

    # compact retires the files the stale handle planned against:
    # the planned file list now points at unlinked files
    t.compact(spark)
    with pytest.raises(Exception, match="(?i)file|exist|path"):
        handle.count()
    # recovery: a fresh clustered read re-lists and is complete
    assert t.read_clustered(spark).count() == tl.count()


def test_restore_preserves_clustered_layout(spark, tmp_path):
    """RESTORE on a cluster_by table copies files back under their
    ORIGINAL names, so bucket-id suffixes survive and the clustered
    read (zero-Exchange plan) keeps working across a rollback."""
    t = TxTable(str(tmp_path / "tl"), cluster_by=SPEC, retain_history=True)
    tl = _timeline(spark)
    v1 = t.init(tl)
    t.overwrite(tl.withColumn("v", F.upper("v")))
    t.restore(v1)
    assert all("_000" in f for f in t._live_files())
    out = asof_fill(t.read_clustered(spark), "k", "ts", "tag", ["v"])
    plan = _plan(out)
    assert "Exchange" not in plan
    assert _got(out) == _expected(spark)


def test_drop_clustered_reverses_session_side_effects(spark, tmp_path):
    """drop_clustered: the catalog entry read_clustered registered is
    dropped (no dangling table outlives the directory) and the
    bucketed-scan ordering conf returns to its pre-read value when
    this handle flipped it."""
    conf_key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    prior = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "false")  # a deliberate caller setting
    try:
        t = TxTable(str(tmp_path / "tl"), cluster_by=SPEC)
        t.init(_timeline(spark))
        df = t.read_clustered(spark)
        name = t.read_clustered(spark, name="txc_explicit")
        assert spark.conf.get(conf_key) == "true"
        assert spark.catalog.tableExists("txc_explicit")
        df.count(), name.count()
        import hashlib

        default_name = (
            "txc_" + hashlib.md5(t.root.encode()).hexdigest()[:10]
        )
        assert spark.catalog.tableExists(default_name)
        t.drop_clustered(spark)
        # both the default-named and explicit entries are gone
        assert not spark.catalog.tableExists("txc_explicit")
        assert not spark.catalog.tableExists(default_name)
        assert spark.conf.get(conf_key) == "false"  # caller value back
    finally:
        if prior is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prior)
