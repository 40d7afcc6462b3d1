"""Optimistic concurrency with logical conflict detection (Delta's
ConflictChecker analog): read-modify-write commits that COMMUTE with
the commits that beat them to the log rebase and succeed -- a blind
append racing a compaction, an append racing a restore -- while true
overlaps raise a typed :class:`ConcurrentWriteError` subclass naming
the violated rule, with the loser's staged actions discarded and the
table untouched by it.

The 100 TB scenario these pin: a long-running OPTIMIZE (compact) must
not kill the streaming ingest that appended mid-rewrite, and vice
versa -- Delta resolves exactly this with per-commit conflict
classification rather than a table lock, and so does TxTable.
"""

from __future__ import annotations

import os

import pytest

from nyc_crash_mapper_etl_script_spark.sources.logstore import FakeObjectStore
from nyc_crash_mapper_etl_script_spark.sources.txtable import (
    ConcurrentAppendError,
    ConcurrentDeleteDeleteError,
    ConcurrentDeleteReadError,
    ConcurrentWriteError,
    MetadataChangedError,
    TxTable,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, ym string")


def _race(root, action, trigger_op, store=None, once=True):
    """Patch TxTable._commit so that the FIRST commit with
    op==trigger_op runs ``action`` (a concurrent writer) between its
    snapshot and its publish -- the canonical interleaving every test
    here exercises."""
    orig = TxTable._commit
    state = {"fired": False}

    def racing(self, mapping, removes, op, base_version=None, **kw):
        if op == trigger_op and not (once and state["fired"]):
            state["fired"] = True
            action()
        return orig(self, mapping, removes, op, base_version, **kw)

    TxTable._commit = racing
    return orig


def _fresh(root, store=None, **kw):
    return TxTable(root, log_store=store, **kw)


@pytest.fixture(params=["posix", "fake_object_store"])
def store(request):
    return FakeObjectStore() if request.param == "fake_object_store" else None


def test_compact_rebases_past_blind_append(spark, tmp_path, store):
    """OPTIMIZE vs streaming ingest: the compaction's read scope is
    exactly the files it rewrites, so a concurrent blind append
    commutes at EITHER isolation level -- both commits land, no
    retry, no lost rows."""
    root = str(tmp_path / "t")
    t = _fresh(root, store, isolation="serializable")
    t.init(_df(spark, [(1, "a", "2024-01"), (2, "b", "2024-01")]).coalesce(1))
    t.append(_df(spark, [(3, "c", "2024-02")]).coalesce(1))

    orig = _race(
        root,
        lambda: _fresh(root, store).append(
            _df(spark, [(9, "z", "2024-03")]).coalesce(1)
        ),
        "compact",
    )
    try:
        t.compact(spark, n_files=1)
    finally:
        TxTable._commit = orig

    got = sorted((r["k"], r["v"]) for r in t.read(spark).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c"), (9, "z")]
    assert [e["op"] for e in t.history()] == [
        "compact",
        "append",
        "append",
        "init",
    ]
    # the appended file survived the rebased compact: it is live
    # alongside the compacted output
    assert len(t._live_files()) == 2


def test_merge_rebases_past_append_write_serializable(spark, tmp_path, store):
    """Default isolation: a blind append does not conflict with a
    merge (serial order merge-then-append); the appended row survives
    even when its KEY matches a merged key -- exactly Delta's
    WriteSerializable relaxation."""
    root = str(tmp_path / "t")
    t = _fresh(root, store)
    t.init(_df(spark, [(1, "a", "2024-01")]))

    orig = _race(
        root,
        lambda: _fresh(root, store).append(_df(spark, [(1, "dup", "2024-02")])),
        "merge",
    )
    try:
        t.merge(_df(spark, [(1, "b", "2024-01"), (5, "e", "2024-01")]), "k")
    finally:
        TxTable._commit = orig

    got = sorted((r["k"], r["v"]) for r in t.read(spark).collect())
    # merge replaced (1,a)->(1,b) and inserted (5,e); the concurrent
    # (1,dup) appended AFTER the merge in the serial order, so it stays
    assert got == [(1, "b"), (1, "dup"), (5, "e")]


def test_delete_where_rebases_past_append(spark, tmp_path, store):
    """Predicate DELETE vs concurrent append: rows appended after the
    delete's snapshot survive even if they match the predicate
    (write-serializable serial order delete-then-append)."""
    root = str(tmp_path / "t")
    t = _fresh(root, store)
    t.init(_df(spark, [(1, "dead", "2024-01"), (2, "keep", "2024-01")]))

    from pyspark.sql import functions as F

    orig = _race(
        root,
        lambda: _fresh(root, store).append(
            _df(spark, [(3, "dead", "2024-02")])
        ),
        "delete_where",
    )
    try:
        t.delete_where(spark, F.col("v") == "dead")
    finally:
        TxTable._commit = orig

    got = sorted((r["k"], r["v"]) for r in t.read(spark).collect())
    assert got == [(2, "keep"), (3, "dead")]


def test_overlapping_compacts_raise_delete_delete(spark, tmp_path, store):
    """Two OPTIMIZE runs racing over the same files: the loser must
    raise ConcurrentDeleteDeleteError (its removal set was already
    removed), never publish a commit that re-removes them."""
    root = str(tmp_path / "t")
    t = _fresh(root, store)
    t.init(_df(spark, [(1, "a", "2024-01")]))
    t.append(_df(spark, [(2, "b", "2024-01")]))

    orig = _race(
        root, lambda: _fresh(root, store).compact(spark, n_files=1), "compact"
    )
    try:
        with pytest.raises(ConcurrentDeleteDeleteError):
            t.compact(spark, n_files=1)
    finally:
        TxTable._commit = orig

    # the winner's compaction stands; rows intact
    assert sorted(r["k"] for r in t.read(spark).collect()) == [1, 2]
    assert len(t._live_files()) == 1


def test_merge_racing_delete_raises_delete_read(spark, tmp_path, store):
    """A merge whose read set lost files to a concurrent rewrite
    DELETE must raise ConcurrentDeleteReadError: its output was
    computed from rows that no longer exist."""
    root = str(tmp_path / "t")
    t = _fresh(root, store, partition_by=["ym"])
    t.init(_df(spark, [(1, "a", "2024-01"), (2, "b", "2024-02")]))

    from pyspark.sql import functions as F

    # the concurrent delete rewrites partition 2024-02 -- DISJOINT
    # from the merge's partition-scoped removal set (2024-01 only),
    # but inside its full-table read scope
    orig = _race(
        root,
        lambda: _fresh(root, store, partition_by=["ym"]).delete_where(
            spark, F.col("ym") == "2024-02"
        ),
        "merge",
    )
    try:
        with pytest.raises(ConcurrentDeleteReadError):
            t.merge(_df(spark, [(1, "A", "2024-01")]), "k")
    finally:
        TxTable._commit = orig
    # winner's delete stands, loser's merge absent
    got = sorted((r["k"], r["v"]) for r in t.read(spark).collect())
    assert got == [(1, "a")]


def test_dv_delete_rebases_past_append_conflicts_with_compact(
    spark, tmp_path, store
):
    """A deletion-vector DELETE's positions stay valid across a blind
    append (appends never move existing rows) -> rebase; a concurrent
    compact MOVES rows between files -> ConcurrentDeleteReadError."""
    root = str(tmp_path / "t")
    t = _fresh(root, store)
    t.init(_df(spark, [(1, "dead", "2024-01"), (2, "keep", "2024-01")]))

    from pyspark.sql import functions as F

    orig = _race(
        root,
        lambda: _fresh(root, store).append(_df(spark, [(3, "c", "2024-02")])),
        "delete_dv",
    )
    try:
        t.delete_where(spark, F.col("v") == "dead", dv=True)
    finally:
        TxTable._commit = orig
    got = sorted((r["k"], r["v"]) for r in t.read(spark).collect())
    assert got == [(2, "keep"), (3, "c")]

    # now race a second dv delete against a compact: positions moved
    orig = _race(
        root, lambda: _fresh(root, store).compact(spark, n_files=1), "delete_dv"
    )
    try:
        with pytest.raises(ConcurrentDeleteReadError):
            t.delete_where(spark, F.col("k") == 2, dv=True)
    finally:
        TxTable._commit = orig
    got = sorted((r["k"], r["v"]) for r in t.read(spark).collect())
    assert got == [(2, "keep"), (3, "c")]


def test_schema_evolution_under_rmw_raises_metadata_changed(
    spark, tmp_path, store
):
    """An evolve-schema append racing a compaction: the compact's
    staged files carry the OLD schema, so rebasing would regress the
    logged schema -- MetadataChangedError, not a silent column drop."""
    root = str(tmp_path / "t")
    t = _fresh(root, store)
    t.init(_df(spark, [(1, "a", "2024-01")]))

    def evolve_append():
        wide = spark.createDataFrame(
            [(2, "b", "2024-01", 7.5)], "k long, v string, ym string, score double"
        )
        _fresh(root, store).append(wide, evolve_schema=True)

    orig = _race(root, evolve_append, "compact")
    try:
        with pytest.raises(MetadataChangedError):
            t.compact(spark, n_files=1)
    finally:
        TxTable._commit = orig

    # retry sees the evolved table and compacts it whole
    t2 = _fresh(root, store)
    t2.compact(spark, n_files=1)
    got = t2.read(spark)
    assert "score" in got.columns
    assert got.count() == 2


def test_restore_conflicts_with_append_and_rewrite(spark, tmp_path, store):
    """RESTORE asserts the complete final table content ("the table
    is now exactly version N"), so even a blind append conflicts at
    the default isolation -- rebasing would keep a row the restored
    state never contained (ConcurrentAppendError, Delta's
    readWholeTable rule)."""
    root = str(tmp_path / "t")
    t = _fresh(root, store, retain_history=True, partition_by=["ym"])
    t.init(_df(spark, [(1, "a", "2024-01")]))  # v1
    t.append(_df(spark, [(2, "b", "2024-02")]))  # v2
    t.merge(_df(spark, [(1, "A", "2024-01")]), "k")  # v3

    orig = _race(
        root,
        lambda: _fresh(
            root, store, retain_history=True, partition_by=["ym"]
        ).append(_df(spark, [(9, "z", "2024-03")])),
        "restore",
    )
    try:
        with pytest.raises(ConcurrentAppendError):
            t.restore(1)
    finally:
        TxTable._commit = orig
    # winner's append stands; the failed restore left no trace
    got = sorted((r["k"], r["v"]) for r in t.read(spark).collect())
    assert got == [(1, "A"), (2, "b"), (9, "z")]
    # retried against fresh state, the restore wins and the table is
    # EXACTLY version 1
    t.restore(1)
    got = sorted((r["k"], r["v"]) for r in t.read(spark).collect())
    assert got == [(1, "a")]

    # rewrite race: the concurrent delete rewrites the file the
    # restore KEEPS (carried over by not removing it) -- rebasing
    # would silently resurrect it -> ConcurrentDeleteReadError
    from pyspark.sql import functions as F

    t.append(_df(spark, [(5, "e", "2024-05")]))
    orig = _race(
        root,
        lambda: _fresh(
            root, store, retain_history=True, partition_by=["ym"]
        ).delete_where(spark, F.col("ym") == "2024-01"),
        "restore",
    )
    try:
        with pytest.raises(ConcurrentDeleteReadError):
            t.restore(1)
    finally:
        TxTable._commit = orig


def test_rebase_retry_loop_absorbs_repeated_appends(spark, tmp_path, store):
    """The publish CAS can lose AGAIN mid-rebase; the loop re-checks
    only the new intervening entries and converges (bounded rounds)."""
    root = str(tmp_path / "t")
    t = _fresh(root, store)
    t.init(_df(spark, [(1, "a", "2024-01")]))

    # inject one append before publish AND one more on the first CAS
    # attempt, via a put_if_absent wrapper on the loser's store
    hits = {"n": 0}
    orig_put = t.store.put_if_absent

    def contended_put(path, data):
        if "_txlog" in path and hits["n"] < 2:
            hits["n"] += 1
            _fresh(root, store).append(
                _df(spark, [(100 + hits["n"], "z", "2024-02")])
            )
        return orig_put(path, data)

    t.store.put_if_absent = contended_put
    try:
        t.compact(spark, n_files=1)
    finally:
        t.store.put_if_absent = orig_put

    got = sorted(r["k"] for r in t.read(spark).collect())
    assert got == [1, 101, 102]
    assert [e["op"] for e in t.history()][:3] == [
        "compact",
        "append",
        "append",
    ]


def test_same_app_txn_race_refuses_rebase(spark, tmp_path, store):
    """Two writers carrying the SAME app transaction id (an
    exactly-once streaming sink retrying a batch) must not both land
    via rebase -- the loser aborts so the caller's last_txn_version
    re-check can decide."""
    root = str(tmp_path / "t")
    t = _fresh(root, store)
    t.init(_df(spark, [(1, "a", "2024-01")]))

    orig = _race(
        root,
        lambda: _fresh(root, store).append(
            _df(spark, [(2, "b", "2024-01")]), app_txn=("sink", 7)
        ),
        "overwrite",
    )
    try:
        with pytest.raises(ConcurrentWriteError, match="app transaction"):
            t.overwrite(_df(spark, [(3, "c", "2024-01")]), app_txn=("sink", 7))
    finally:
        TxTable._commit = orig
    assert t.last_txn_version("sink") == 7


def test_typed_errors_are_concurrent_write_errors():
    for cls in (
        ConcurrentAppendError,
        ConcurrentDeleteReadError,
        ConcurrentDeleteDeleteError,
        MetadataChangedError,
    ):
        assert issubclass(cls, ConcurrentWriteError)


def test_rebase_refuses_cleaned_history(spark, tmp_path):
    """Conflict verification needs the intervening entries; when
    cleanup_log already deleted them the rebase must abort with the
    plain retryable error, never assume commutativity."""
    root = str(tmp_path / "t")
    t = TxTable(root, checkpoint_every=2)
    t.init(_df(spark, [(1, "a", "2024-01")]))

    def churn_and_clean():
        w = TxTable(root, checkpoint_every=2)
        for i in range(6):
            w.append(_df(spark, [(10 + i, "z", "2024-02")]))
        w.cleanup_log(keep_versions=1)

    orig = _race(root, churn_and_clean, "compact")
    try:
        with pytest.raises(ConcurrentWriteError, match="cleaned"):
            t.compact(spark, n_files=1)
    finally:
        TxTable._commit = orig
    # retry from fresh state converges
    t2 = TxTable(root, checkpoint_every=2)
    t2.compact(spark, n_files=1)
    assert t2.read(spark).count() == 7


def test_isolation_validated():
    with pytest.raises(ValueError, match="isolation"):
        TxTable("/tmp/never-created", isolation="read_committed")


def test_serializable_delete_conflicts_with_append(spark, tmp_path):
    """isolation='serializable' on the predicate DELETE path: an
    append its full-table read would have seen raises
    ConcurrentAppendError (write_serializable rebases the identical
    race -- pinned above)."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "t")
    t = TxTable(root, isolation="serializable")
    t.init(_df(spark, [(1, "dead", "2024-01"), (2, "keep", "2024-01")]))

    orig = _race(
        root,
        lambda: _fresh(root).append(_df(spark, [(3, "c", "2024-02")])),
        "delete_where",
    )
    try:
        with pytest.raises(ConcurrentAppendError):
            t.delete_where(spark, F.col("v") == "dead")
    finally:
        TxTable._commit = orig
    # winner's append stands, loser left no trace
    got = sorted(r["k"] for r in t.read(spark).collect())
    assert got == [1, 2, 3]


def test_rebase_preserves_app_txn_exactly_once_when_ids_differ(
    spark, tmp_path
):
    """Different app ids commute: a sink's overwrite conflicts with a
    racing append (whole-table scope) but an app-txn APPEND rebasing
    past an unrelated app's append keeps both idempotence markers."""
    root = str(tmp_path / "t")
    t = _fresh(root)
    t.init(_df(spark, [(1, "a", "2024-01")]))

    # compact carrying app txn races an append with a DIFFERENT app id
    orig = _race(
        root,
        lambda: _fresh(root).append(
            _df(spark, [(2, "b", "2024-01")]), app_txn=("other", 3)
        ),
        "compact",
    )
    try:
        t.compact(spark, n_files=1)
    finally:
        TxTable._commit = orig
    assert t.last_txn_version("other") == 3
    assert sorted(r["k"] for r in t.read(spark).collect()) == [1, 2]
