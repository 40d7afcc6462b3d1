"""Deletion vectors: sparse DELETE as a position sidecar instead of a
file rewrite -- read subtraction, CDC/time-travel/restore replay,
rewrite materialization + inert-dv retirement, vacuum retention,
streaming-feed exactness, crash recovery, and the CAS guard that
keeps positions valid (a concurrent rewrite moves rows between
files)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.sources.txtable import (
    _DV_DIR,
    ConcurrentWriteError,
    TxTable,
)


def _df(spark, n=100, mod=4):
    return (
        spark.range(0, n)
        .withColumn("ym", (F.col("id") % mod).cast("string"))
        .withColumn("v", F.col("id") * 2)
    )


def _ids(df):
    return sorted(r["id"] for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"), partition_by=["ym"], retain_history=True)
    t.init(_df(spark))
    return t


def test_dv_delete_equals_rewrite_delete(spark, tmp_path):
    a = TxTable(str(tmp_path / "a"), partition_by=["ym"])
    b = TxTable(str(tmp_path / "b"), partition_by=["ym"])
    a.init(_df(spark))
    b.init(_df(spark))
    cond = (F.col("id") % 7 == 0) | F.col("id").between(40, 49)
    a.delete_where(spark, cond)
    b.delete_where(spark, cond, dv=True)
    assert _ids(a.read(spark)) == _ids(b.read(spark))
    # and no data file churned on the dv side: v1's adds are still live
    assert b.history()[0]["files_added"] == 0
    assert b.history()[0]["files_removed"] == 0
    assert b.history()[0]["rows_dv_deleted"] == _df(spark).where(cond).count()


def test_dv_deletes_compose_and_time_travel(spark, table):
    table.delete_where(spark, F.col("id") < 10, dv=True)  # v2
    table.delete_where(spark, F.col("id") >= 90, dv=True)  # v3
    assert _ids(table.read(spark)) == list(range(10, 90))
    assert _ids(table.read(spark, version=1)) == list(range(100))
    assert _ids(table.read(spark, version=2)) == list(range(10, 100))


def test_dv_delete_null_condition_keeps_row(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.init(spark.createDataFrame([(1, 5), (2, None), (3, 20)], "k long, x int"))
    # SQL DELETE: only provably-TRUE rows die; x=NULL survives
    t.delete_where(spark, F.col("x") > 10, dv=True)
    assert sorted(r["k"] for r in t.read(spark).collect()) == [1, 2]


def test_dv_delete_by_key(spark, table):
    keys = spark.createDataFrame([(3,), (7,), (999,)], "id long")
    table.delete(keys, "id", dv=True)
    got = _ids(table.read(spark))
    assert 3 not in got and 7 not in got and len(got) == 98


def test_dv_empty_match_is_no_commit(spark, table):
    v = table._snapshot_version()
    assert table.delete_where(spark, F.col("id") > 10**9, dv=True) == v
    assert table._snapshot_version() == v


def test_merge_does_not_resurrect_dv_deleted_rows(spark, table):
    table.delete_where(spark, F.col("id").between(10, 19), dv=True)
    # merge touches partition ym=2 (ids 2,6,10,...): its rewrite must
    # keep ids 10,14,18 dead while reinserting id 10 from the source
    src = _df(spark).where("id = 10").withColumn("v", F.lit(-1))
    table.merge(src, "id")
    got = table.read(spark)
    assert got.where("id = 10").collect()[0]["v"] == -1
    assert _ids(got.where("id between 11 and 19")) == []


def test_merge_update_applies_on_dv_filtered_rows(spark, table):
    table.delete_where(spark, F.col("id") < 50, dv=True)
    src = spark.createDataFrame([(30, -5), (60, -6)], "id long, v long")
    table.merge_update(src, "id", set_cols=["v"])
    got = table.read(spark)
    assert got.where("id = 30").count() == 0  # stayed deleted
    assert got.where("id = 60").collect()[0]["v"] == -6


def test_compact_materializes_and_retires_dvs(spark, table):
    table.delete_where(spark, F.col("id") < 10, dv=True)
    assert table._live_dvs()
    table.compact(spark)
    assert not table._live_dvs()
    assert _ids(table.read(spark)) == list(range(10, 100))
    h = table.history()[0]
    assert h["op"] == "compact" and h["dvs_removed"] >= 1
    # retain_history keeps the sidecar for as-of reads across compact
    assert _ids(table.read(spark, version=2)) == list(range(10, 100))
    assert _ids(table.read(spark, version=1)) == list(range(100))


def test_compact_small_partial_rewrite_keeps_partial_dvs_live(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.init(_df(spark, n=50))
    t.append(_df(spark, n=10))  # second small file set
    t.delete_where(spark, F.col("id") < 5, dv=True)
    before = _ids(t.read(spark))
    t.compact_small(spark, small_mb=64)  # everything is small here
    assert _ids(t.read(spark)) == before


def test_eager_delete_table_drops_retired_dv_files(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))  # retain_history=False
    t.init(_df(spark))
    t.delete_where(spark, F.col("id") < 10, dv=True)
    dv_dir = os.path.join(t.root, _DV_DIR)
    assert os.listdir(dv_dir)
    t.compact(spark)
    assert not os.path.isdir(dv_dir) or not os.listdir(dv_dir)
    assert _ids(t.read(spark)) == list(range(10, 100))


def test_restore_across_dv_commits(spark, table):
    table.delete_where(spark, F.col("id") < 10, dv=True)  # v2
    table.delete_where(spark, F.col("id") >= 90, dv=True)  # v3
    table.restore(2)  # back to: first delete applied, second not
    assert _ids(table.read(spark)) == list(range(10, 100))
    table.restore(1)  # everything resurrects
    assert _ids(table.read(spark)) == list(range(100))
    # and forward again: as-of v3 still replays both dvs
    assert _ids(table.read(spark, version=3)) == list(range(10, 90))


def test_changes_tags_dv_deletes_and_restore_inserts(spark, table):
    table.delete_where(spark, F.col("id").between(10, 14), dv=True)  # v2
    ch = table.changes(spark, 1, 2)
    assert {r["_change_type"] for r in ch.collect()} == {"delete"}
    assert _ids(ch) == list(range(10, 15))
    table.restore(1)  # v3
    ch2 = table.changes(spark, 2, 3)
    assert {r["_change_type"] for r in ch2.collect()} == {"insert"}
    assert _ids(ch2) == list(range(10, 15))
    # endpoint diff across delete+restore cancels exactly
    assert table.changes(spark, 1, 3).count() == 0


def test_changes_mixes_dv_and_file_level(spark, table):
    table.delete_where(spark, F.col("id") < 5, dv=True)  # v2: 5 dv deletes
    table.append(_df(spark).where("id >= 100"))  # no-op append (empty)
    table.append(
        spark.range(200, 203)
        .withColumn("ym", F.lit("9"))
        .withColumn("v", F.col("id") * 2)
    )  # v3 (or v4): 3 inserts
    ch = table.changes(spark, 1)
    got = {
        (r["id"], r["_change_type"]) for r in ch.collect()
    }
    assert got == {(i, "delete") for i in range(5)} | {
        (i, "insert") for i in (200, 201, 202)
    }


def test_concurrent_rewrite_aborts_dv_delete_append_rebases(
    spark, table, monkeypatch
):
    """A REWRITE landing between the dv delete's snapshot and its
    publish invalidates the positions (rows move between files) --
    the conflict checker must abort with the table untouched.  A
    blind APPEND landing in the same window commutes (appends never
    move existing rows): the dv delete rebases and both commits
    land."""
    real_publish = TxTable._publish

    def race_with(action):
        def racing_publish(self, entry, base_version=None, **kw):
            # simulate a peer landing first: bump the log out from
            # under the dv delete exactly at its publish point
            monkeypatch.setattr(TxTable, "_publish", real_publish)
            action()
            return real_publish(self, entry, base_version=base_version, **kw)

        monkeypatch.setattr(TxTable, "_publish", racing_publish)

    # rewrite race: positions moved -> typed abort, no dv recorded
    race_with(lambda: TxTable(table.root).compact(spark, n_files=1))
    from nyc_crash_mapper_etl_script_spark.sources.txtable import (
        ConcurrentDeleteReadError,
    )

    with pytest.raises(ConcurrentDeleteReadError):
        table.delete_where(spark, F.col("id") < 10, dv=True)
    monkeypatch.undo()
    assert _ids(table.read(spark)) == list(range(100))
    assert not table._live_dvs()

    # append race: the dv delete REBASES -- deletes land AND the
    # appended row survives
    race_with(lambda: TxTable(table.root).append(
        spark.range(500, 501)
        .withColumn("ym", F.lit("0"))
        .withColumn("v", F.col("id"))
    ))
    table.delete_where(spark, F.col("id") < 10, dv=True)
    monkeypatch.undo()
    assert _ids(table.read(spark)) == list(range(10, 100)) + [500]
    assert table._live_dvs()


def test_dv_refused_on_clustered_table(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"), cluster_by=(["id"], ["id"], 4))
    t.init(_df(spark, n=20, mod=1).drop("ym"))
    with pytest.raises(ValueError, match="cluster_by"):
        t.delete_where(spark, F.col("id") < 5, dv=True)


def test_reserved_column_names_refused(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.init(spark.range(3).withColumn("_txdv_file", F.lit("x")))
    with pytest.raises(ValueError, match="reserved"):
        t.delete_where(spark, F.col("id") < 1, dv=True)


def test_vacuum_keeps_dvs_of_retained_versions(spark, table):
    table.delete_where(spark, F.col("id") < 10, dv=True)  # v2
    table.compact(spark)  # v3: dv retired from live set
    dv_dir = os.path.join(table.root, _DV_DIR)
    assert os.listdir(dv_dir)
    # window [v2, v3] still replays the dv -> survives
    table.vacuum(keep_versions=1)
    assert os.listdir(dv_dir)
    assert _ids(table.read(spark, version=2)) == list(range(10, 100))
    # dropping all history clears it (head no longer replays it)
    table.vacuum(keep_versions=0)
    assert not os.path.isdir(dv_dir) or not os.listdir(dv_dir)
    assert _ids(table.read(spark)) == list(range(10, 100))


def test_vacuum_zero_keeps_outstanding_dvs(spark, table):
    table.delete_where(spark, F.col("id") < 10, dv=True)
    table.vacuum(keep_versions=0)
    # the dv is part of the CURRENT version -- never vacuumable
    assert _ids(table.read(spark)) == list(range(10, 100))


def test_crash_between_dv_publish_and_finalize_recovers(spark, table):
    orig = TxTable._finalize
    try:
        TxTable._finalize = lambda self, mapping, removes, **kw: (
            _ for _ in ()
        ).throw(RuntimeError("killed after dv publish"))
        with pytest.raises(RuntimeError, match="killed after dv publish"):
            table.delete_where(spark, F.col("id") < 10, dv=True)
    finally:
        TxTable._finalize = orig
    # the commit published; recovery must move the staged sidecar into
    # _dv/ so the deletes are visible
    assert _ids(table.read(spark)) == list(range(10, 100))


def test_read_partitions_subtracts_dvs(spark, table):
    table.delete_where(spark, F.col("id").between(0, 20), dv=True)
    got = _ids(table.read_partitions(spark, "ym", ["1"]))
    assert got == [i for i in range(21, 100) if i % 4 == 1]


def test_read_pruned_subtracts_dvs(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.init(_df(spark, n=100))
    t.delete_where(spark, F.col("id").between(10, 19), dv=True)
    got = _ids(t.read_pruned(spark, "id", 5, 25))
    assert got == [5, 6, 7, 8, 9, 20, 21, 22, 23, 24, 25]


def test_stream_feed_exact_across_dv_delete_and_restore(spark, tmp_path):
    """The signed change feed stays exact through dv deletes, an
    append, and a restore spanning both (the dv commit emits its
    positions as deletes; the restore emits resurfacing rows as
    inserts and the dropped append as deletes)."""
    from nyc_crash_mapper_etl_script_spark.sources.txstream import (
        read_txtable_stream,
    )

    root = str(tmp_path / "t")
    t = TxTable(root, retain_history=True)
    t.init(spark.range(0, 100).withColumn("v", F.col("id") * 2))
    t.delete_where(spark, F.col("id") < 10, dv=True)  # v2
    t.append(spark.range(100, 110).withColumn("v", F.col("id") * 2))  # v3
    t.restore(1)  # v4: +10 resurfacing inserts, -10 appended rows
    t.delete_where(spark, F.col("id") >= 95, dv=True)  # v5
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        read_txtable_stream(spark, root)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = spark.read.parquet(out)
    per_version = {
        (r["_commit_version"], r["_change_type"]): r["n"]
        for r in res.groupBy("_commit_version", "_change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_version[(2, "delete")] == 10
    assert per_version[(4, "insert")] == 10
    assert per_version[(4, "delete")] == 10
    assert per_version[(5, "delete")] == 5
    signed = res.withColumn(
        "w", F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
    )
    fold = signed.groupBy("id", "v").agg(F.sum("w").alias("s"))
    assert fold.where("s not in (0, 1)").count() == 0
    live = {r["id"] for r in fold.where("s = 1").collect()}
    assert live == {r["id"] for r in t.read(spark).collect()}


def test_stream_removed_file_emits_only_visible_rows(spark, tmp_path):
    """A compact after a dv delete must not double-emit the dv'd rows
    as deletes (they were already emitted when the dv committed)."""
    from nyc_crash_mapper_etl_script_spark.sources.txstream import (
        read_txtable_stream,
    )

    root = str(tmp_path / "t")
    t = TxTable(root, retain_history=True)
    t.init(spark.range(0, 50).withColumn("v", F.col("id") * 2))
    t.delete_where(spark, F.col("id") < 5, dv=True)  # v2
    t.compact(spark)  # v3: rewrite emits 45 deletes + 45 inserts
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        read_txtable_stream(spark, root)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = spark.read.parquet(out)
    v3 = res.where("_commit_version = 3")
    assert v3.where("_change_type = 'delete'").count() == 45
    assert v3.where("_change_type = 'insert'").count() == 45
    signed = res.withColumn(
        "w", F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
    )
    fold = signed.groupBy("id").agg(F.sum("w").alias("s"))
    assert fold.where("s not in (0, 1)").count() == 0
    assert fold.where("s = 1").count() == 45


def test_dv_with_schema_evolution(spark, tmp_path):
    """dv deletes compose with add-column evolution: evolved reads
    NULL-fill old files AND subtract their dv'd positions; a dv
    delete predicated on the evolved column sees NULLs as
    provably-not-true (rows survive)."""
    t = TxTable(str(tmp_path / "t"))
    t.init(spark.range(0, 20).withColumn("v", F.col("id") * 2))
    t.delete_where(spark, F.col("id") < 5, dv=True)
    t.append(
        spark.range(20, 30)
        .withColumn("v", F.col("id") * 2)
        .withColumn("extra", F.lit("new")),
        evolve_schema=True,
    )
    got = t.read(spark)
    assert _ids(got) == list(range(5, 30))
    assert got.where("id < 20 and extra is not null").count() == 0
    # evolved-column predicate: NULL extra never matches -> only the
    # new rows die
    t.delete_where(spark, F.col("extra") == "new", dv=True)
    assert _ids(t.read(spark)) == list(range(5, 20))


def test_large_dv_set_parity_with_rewrite(spark, tmp_path):
    """A dense delete (half the table) through the dv path must equal
    the rewrite twin even when the dv side is too large to stay a
    pure broadcast -- the anti-join is an equi-join either way."""
    a = TxTable(str(tmp_path / "a"))
    b = TxTable(str(tmp_path / "b"))
    df = spark.range(0, 200_000).withColumn("v", F.col("id") * 2)
    a.init(df)
    b.init(df)
    cond = F.col("id") % 2 == 0
    a.delete_where(spark, cond)
    b.delete_where(spark, cond, dv=True)
    assert a.read(spark).count() == b.read(spark).count() == 100_000
    assert (
        a.read(spark).agg(F.sum("id")).first()[0]
        == b.read(spark).agg(F.sum("id")).first()[0]
    )


def test_dv_delete_on_mixed_layout_table(spark, tmp_path):
    """dv positions key on whatever path shape each file actually has
    (flat-era files = bare filename, hive files = col components), so
    a dv delete on a mixed pre-upgrade layout hits rows in BOTH."""
    import warnings

    root = str(tmp_path / "t")
    TxTable(root).init(_df(spark, n=40))  # flat era, no ym= components
    t = TxTable(root, partition_by=["ym"])
    t.append(_df(spark, n=40).withColumn("id", F.col("id") + 100))
    t.delete_where(spark, (F.col("id") % 10 == 1), dv=True)
    got = _ids(t.read(spark))
    assert 1 not in got and 11 not in got and 101 not in got
    assert len(got) == 80 - 8
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # mixed-layout fallback warns
        pr = _ids(t.read_partitions(spark, "ym", ["1"]))
    assert all(i % 4 == 1 and i % 10 != 1 for i in pr)


def test_restore_below_cleanup_cutoff_raises(spark, tmp_path):
    t = TxTable(
        str(tmp_path / "t"), retain_history=True, checkpoint_every=2
    )
    t.init(_df(spark, n=10))
    t.append(_df(spark, n=5).withColumn("id", F.col("id") + 100))
    t.append(_df(spark, n=5).withColumn("id", F.col("id") + 200))
    t.cleanup_log(keep_versions=1)  # cutoff v2
    # model a fresh handle: the old one may legitimately serve
    # below-cutoff reads from its immutable version-keyed state cache
    t._state_cache.clear()
    with pytest.raises(FileNotFoundError):
        t.restore(1)
    # restore at/above the cutoff still works
    t.restore(2)
    assert max(_ids(t.read(spark))) == 104


def test_stream_seeded_dv_subtracts_on_later_remove(spark, tmp_path):
    """A dv committed BEFORE the stream's start version rides the
    checkpoint seed: when its file is removed inside the batch range,
    the delete emission must still subtract the pre-range dv'd
    positions (they were consumed as deletes before this consumer's
    window, or never -- either way re-emitting them would corrupt a
    signed fold vs the table)."""
    from nyc_crash_mapper_etl_script_spark.sources.txstream import (
        read_txtable_stream,
    )

    root = str(tmp_path / "t")
    t = TxTable(root, retain_history=True, checkpoint_every=2)
    t.init(spark.range(0, 50).withColumn("v", F.col("id")))  # v1
    t.delete_where(spark, F.col("id") < 10, dv=True)  # v2 (ckpt)
    t.compact(spark)  # v3: removes the dv'd file, materializes
    out, ck = str(tmp_path / "o"), str(tmp_path / "c")
    q = (
        read_txtable_stream(spark, root, starting_version=2)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = spark.read.parquet(out)
    v3 = res.where("_commit_version = 3")
    # the removed file emits only its 40 then-visible rows
    assert v3.where("_change_type = 'delete'").count() == 40
    assert v3.where("_change_type = 'insert'").count() == 40
    assert v3.where("id < 10").count() == 0


def test_dv_scan_split_keeps_clean_files_untaxed(spark, tmp_path):
    """Per-file dv scan split (r9 VERDICT #3): with a dv live on ONE
    partition's file, the other partitions' scans must keep the
    zero-overhead plan -- no _metadata position projection, no
    anti-join -- while the touched file still subtracts exactly."""
    t = TxTable(str(tmp_path / "t"), partition_by=["ym"])
    t.init(_df(spark))
    # dv touches only partition ym=0 (id % 4 == 0 rows live there)
    t.delete_where(spark, (F.col("id") % 20 == 0), dv=True)
    assert _ids(t.read(spark)) == [
        i for i in range(100) if i % 20 != 0
    ]
    # full read splits: plan unions a position-tracked subtree (the
    # touched file, anti-joined) with plain scans (clean files)
    full_plan = (
        t.read(spark)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "row_index" in full_plan and "Join" in full_plan
    assert "Union" in full_plan
    # a partition-scoped read of CLEAN partitions while the dv lives
    # elsewhere: zero dv overhead in the plan
    clean = t.read_partitions(spark, "ym", ["1", "2"])
    assert _ids(clean) == [i for i in range(100) if i % 4 in (1, 2)]
    clean_plan = clean._jdf.queryExecution().optimizedPlan().toString()
    assert "row_index" not in clean_plan
    assert "Join" not in clean_plan
    # the touched partition alone still pays (and subtracts) the dv
    hit = t.read_partitions(spark, "ym", ["0"])
    assert _ids(hit) == [
        i for i in range(0, 100, 4) if i % 20 != 0
    ]
    hit_plan = hit._jdf.queryExecution().optimizedPlan().toString()
    assert "row_index" in hit_plan


def test_dv_split_read_matches_unsplit_rewrite_semantics(spark, tmp_path):
    """Split-read parity on a multi-partition table where SOME
    partitions carry dvs: dv side == rewrite side, row for row."""
    a = TxTable(str(tmp_path / "a"), partition_by=["ym"])
    b = TxTable(str(tmp_path / "b"), partition_by=["ym"])
    a.init(_df(spark, n=200, mod=5))
    b.init(_df(spark, n=200, mod=5))
    cond = (F.col("id") % 5 == 0) & (F.col("id") < 100)
    a.delete_where(spark, cond)
    b.delete_where(spark, cond, dv=True)
    assert _ids(a.read(spark)) == _ids(b.read(spark))
    # merge after the dv: the rewrite read path also splits
    upd = spark.createDataFrame(
        [(7, "2", 700)], "id long, ym string, v long"
    )
    a.merge(upd, "id")
    b.merge(upd, "id")
    assert sorted(
        (r["id"], r["v"]) for r in a.read(spark).collect()
    ) == sorted((r["id"], r["v"]) for r in b.read(spark).collect())
