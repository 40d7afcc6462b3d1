"""LogStore seam: backend contract tests and fault injection.

The TxTable commit protocol's single required atomic is put-if-absent
(logstore.py module docstring).  These tests pin (a) both backends'
primitive semantics, (b) the protocol's crash windows under
object-store semantics -- PUT landed but response lost, non-atomic
move interrupted between copy and delete, lagging LIST -- and (c) the
restore-by-link contract on POSIX with the copy fallback on stores
without links.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.sources.logstore import (
    FakeObjectStore,
    PosixLogStore,
)
from nyc_crash_mapper_etl_script_spark.sources.txtable import TxTable


@pytest.mark.parametrize("store", [PosixLogStore(), FakeObjectStore()])
def test_put_if_absent_is_conditional(tmp_path, store):
    """Both backends: first put publishes the full payload, second put
    on the same key raises FileExistsError and leaves the original
    bytes untouched."""
    p = str(tmp_path / "v000001.json")
    store.put_if_absent(p, b'{"v": 1}')
    with pytest.raises(FileExistsError):
        store.put_if_absent(p, b'{"v": "usurper"}')
    assert store.read_bytes(p) == b'{"v": 1}'
    names = store.list_dir(str(tmp_path))
    assert "v000001.json" in names
    # no claim/tmp litter visible (or present at all)
    assert all(not n.endswith((".claim",)) for n in names)
    assert not any(n.startswith(".tmp") for n in os.listdir(tmp_path))


def test_fake_store_lifecycle_matches_posix(spark, tmp_path):
    """One deterministic end-to-end: the same op sequence through the
    object-store fake and through POSIX yields identical tables (the
    hypothesis model test randomizes this; here is the fast exact
    twin, including restore across layouts)."""
    seq_rows = [(i, f"r{i}", "2024-0" + str(5 + i % 2)) for i in range(8)]

    def run(root, store):
        t = TxTable(
            root, partition_by=["ym"], retain_history=True, log_store=store
        )
        t.init(spark.createDataFrame(seq_rows[:4], "k long, v string, ym string"))
        t.append(spark.createDataFrame(seq_rows[4:], "k long, v string, ym string"))
        t.merge(
            spark.createDataFrame([(1, "M", "2024-06")], "k long, v string, ym string"),
            "k",
        )
        t.delete_where(spark, F.col("k") == 7)
        t.compact(spark)
        t.restore(2)
        return sorted(
            (r["k"], r["v"], r["ym"]) for r in t.read(spark).collect()
        )

    got_fake = run(str(tmp_path / "fake"), FakeObjectStore())
    got_posix = run(str(tmp_path / "posix"), None)
    assert got_fake == got_posix
    assert got_fake == sorted((k, v, ym) for k, v, ym in seq_rows)


def test_put_landed_but_response_lost_recovers_exactly_once(spark, tmp_path):
    """Object-store crash window #1: the commit PUT succeeds but the
    writer dies before finalize (the client never saw the 200).  The
    publish is the commit point, so the rows ARE committed; the next
    open must finish the finalize from the log -- exactly once, no
    loss, no duplication."""
    store = FakeObjectStore()
    t = TxTable(str(tmp_path / "t"), partition_by=["ym"], log_store=store)
    t.init(
        spark.createDataFrame(
            [(1, "a", "2024-05"), (2, "b", "2024-06")],
            "k long, v string, ym string",
        )
    )
    store.fail_put_after = 0  # next PUT lands, then the response is lost
    with pytest.raises(IOError, match="response was lost"):
        t.append(
            spark.createDataFrame(
                [(3, "c", "2024-05"), (4, "d", "2024-06")],
                "k long, v string, ym string",
            )
        )
    # fresh handle (same backend): recovery finishes the rename-into-
    # place and the appended rows appear exactly once
    t2 = TxTable(str(tmp_path / "t"), log_store=store)
    got = sorted(r["k"] for r in t2.read(spark).collect())
    assert got == [1, 2, 3, 4]
    assert t2._snapshot_version() == 2
    # and the plain-parquet-read invariant holds after recovery
    plain = sorted(r["k"] for r in spark.read.parquet(t2.root).collect())
    assert plain == [1, 2, 3, 4]


def test_move_interrupted_between_copy_and_delete(spark, tmp_path):
    """Object-store crash window #2: a finalize move is copy+delete
    and the writer dies between them -- the destination exists AND the
    staged source remains.  Recovery must complete the remaining
    moves and sweep the staging litter; rows exactly once."""
    store = FakeObjectStore()
    t = TxTable(
        str(tmp_path / "t"),
        partition_by=["ym"],
        log_store=store,
        stale_staging_seconds=0.0,  # sweep staged litter immediately
    )
    t.init(
        spark.createDataFrame([(1, "a", "2024-05")], "k long, v string, ym string")
    )
    store.fail_move_after_copy = 0  # first finalize move crashes mid-way
    with pytest.raises(IOError, match="after copy"):
        # two partitions => two staged files => the second move never ran
        t.append(
            spark.createDataFrame(
                [(2, "b", "2024-05"), (3, "c", "2024-06")],
                "k long, v string, ym string",
            )
        )
    t2 = TxTable(
        str(tmp_path / "t"), log_store=store, stale_staging_seconds=0.0
    )
    got = sorted(r["k"] for r in t2.read(spark).collect())
    assert got == [1, 2, 3]
    plain = sorted(r["k"] for r in spark.read.parquet(t2.root).collect())
    assert plain == [1, 2, 3]
    # staging fully swept (the crashed txn's litter aged out)
    t2._recover()
    assert not os.path.isdir(os.path.join(t2.root, "_staging"))


def test_retire_interrupted_between_copy_and_delete(spark, tmp_path):
    """Object-store crash window #3: the RETIRE move (superseded file
    to archive) dies after the copy -- the stale file still sits in
    the root, where a plain parquet read would see superseded rows.
    Recovery proves it superseded from the log and retires it again;
    time travel across the crash stays intact."""
    store = FakeObjectStore()
    t = TxTable(
        str(tmp_path / "t"), retain_history=True, log_store=store
    )
    t.init(spark.createDataFrame([(1, "old")], "k long, v string"))
    store.fail_move_after_copy = 1  # move#1 = finalize add; move#2 = retire
    with pytest.raises(IOError, match="after copy"):
        t.overwrite(spark.createDataFrame([(2, "new")], "k long, v string"))
    t2 = TxTable(str(tmp_path / "t"), retain_history=True, log_store=store)
    assert [(r["k"], r["v"]) for r in t2.read(spark).collect()] == [(2, "new")]
    plain = [(r["k"], r["v"]) for r in spark.read.parquet(t2.root).collect()]
    assert plain == [(2, "new")]
    # history survived the double-retire (archive copy was already there)
    assert [(r["k"], r["v"]) for r in t2.read(spark, version=1).collect()] == [
        (1, "old")
    ]


def test_lagging_listing_costs_retries_never_commits(spark, tmp_path):
    """Eventually-consistent LIST: a writer whose log listing lags the
    true head computes an already-taken version; put-if-absent (the
    strongly-consistent primitive) rejects it and the append bumps
    forward.  No version is lost, duplicated, or overwritten."""
    store = FakeObjectStore()
    t = TxTable(str(tmp_path / "t"), log_store=store)
    t.init(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    # the listing now hides v2 from every reader of this store
    store.lag_hidden.add("v000002.json")
    lagged = TxTable(str(tmp_path / "t"), log_store=store)
    assert lagged._snapshot_version() == 1  # it really is behind
    v = lagged.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    assert v == 3  # bumped past the hidden-but-taken v2
    store.settle()
    got = sorted(r["k"] for r in t.read(spark).collect())
    assert got == [1, 2, 3]
    assert sorted(e["version"] for e in t.history()) == [1, 2, 3]
    # an RMW from the lagged view must NOT silently clobber: it raises
    store.lag_hidden.add("v000003.json")
    lagged2 = TxTable(str(tmp_path / "t"), log_store=store)
    from nyc_crash_mapper_etl_script_spark.sources.txtable import (
        ConcurrentWriteError,
    )

    with pytest.raises(ConcurrentWriteError):
        lagged2.overwrite(spark.createDataFrame([(9, "z")], "k long, v string"))
    store.settle()


def test_restore_links_on_posix_copies_on_object_store(spark, tmp_path):
    """VERDICT r8: restore is O(files) metadata on POSIX -- the
    restored root file IS the archived inode (hard link), no bytes
    move.  On a store without links it falls back to a byte copy and
    stays correct."""
    rows = [(1, "a"), (2, "b")]

    def build(root, store):
        t = TxTable(root, retain_history=True, log_store=store)
        t.init(spark.createDataFrame(rows, "k long, v string"))
        t.overwrite(spark.createDataFrame([(3, "c")], "k long, v string"))
        t.restore(1)
        return t

    t = build(str(tmp_path / "posix"), None)
    assert sorted(r["k"] for r in t.read(spark).collect()) == [1, 2]
    # every restored live file is the same inode as its archived twin
    linked = 0
    for rel in t._live_files():
        arch = os.path.join(t.root, "_archive", rel)
        if os.path.exists(arch):
            assert os.path.samefile(os.path.join(t.root, rel), arch)
            linked += 1
    assert linked > 0, "restore should have re-staged archived files"

    fake = FakeObjectStore()
    t2 = build(str(tmp_path / "fake"), fake)
    assert sorted(r["k"] for r in t2.read(spark).collect()) == [1, 2]
    assert fake.copies > 0  # the no-links fallback actually copied


def test_retire_after_link_restore_really_removes_source(spark, tmp_path):
    """Review regression (r9): restore() hard-links archived files
    back under their ORIGINAL names, so a later retire of a restored
    file targets its still-present archive twin -- and POSIX rename()
    between two hard links of one inode is a silent no-op.  The move
    must still remove the source name, or the superseded file stays
    live in the root and a plain parquet read returns resurrected
    rows forever (recovery cannot repair a no-op)."""
    t = TxTable(str(tmp_path / "t"), retain_history=True)
    t.init(spark.createDataFrame([(1, "A")], "k long, v string"))
    t.overwrite(spark.createDataFrame([(2, "B")], "k long, v string"))
    t.restore(1)  # root file is now the SAME INODE as its archive twin
    t.overwrite(spark.createDataFrame([(3, "C")], "k long, v string"))
    assert [(r["k"], r["v"]) for r in t.read(spark).collect()] == [(3, "C")]
    # the invariant the bug broke: a plain parquet read of the root
    # sees ONLY the committed rows (no resurrected restore-era file)
    plain = [(r["k"], r["v"]) for r in spark.read.parquet(t.root).collect()]
    assert plain == [(3, "C")]
    # recovery finds nothing left to repair, and history still works
    t._recover()
    plain2 = [(r["k"], r["v"]) for r in spark.read.parquet(t.root).collect()]
    assert plain2 == [(3, "C")]
    assert [(r["k"], r["v"]) for r in t.read(spark, version=1).collect()] == [
        (1, "A")
    ]
    assert [(r["k"], r["v"]) for r in t.read(spark, version=3).collect()] == [
        (1, "A")
    ]


def test_stream_planner_uses_named_log_store(spark, tmp_path):
    """The LogStore seam crosses the DataSource boundary by registry
    name: a change-feed opened with log_store='fake_object_store'
    plans through the object-store backend in the planner process and
    the drain is byte-identical to the POSIX default."""
    from nyc_crash_mapper_etl_script_spark.sources.txstream import (
        read_txtable_stream,
    )

    store = FakeObjectStore()
    t = TxTable(str(tmp_path / "t"), log_store=store, retain_history=True)
    t.init(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    t.append(spark.createDataFrame([(3, "c")], "k long, v string"))

    def drain(name, log_store):
        out = str(tmp_path / name)
        q = (
            read_txtable_stream(spark, t.root, log_store=log_store)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", out + "_ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return sorted(
            (r["k"], r["v"], r["_change_type"], r["_commit_version"])
            for r in spark.read.parquet(out).collect()
        )

    got_fake = drain("fake", "fake_object_store")
    got_posix = drain("posix", "posix")
    assert got_fake == got_posix
    assert {k for (k, *_rest) in got_fake} == {1, 2, 3}
    # unknown names fail fast at the registry
    from nyc_crash_mapper_etl_script_spark.sources.logstore import (
        make_log_store,
    )

    with pytest.raises(ValueError, match="unknown log store"):
        make_log_store("nope")
