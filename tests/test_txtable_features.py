"""Table-feature protocol guard (Delta's reader/writer protocol
versions): commit entries and checkpoints that depend on a capability
this reader does not implement must FAIL LOUDLY at state fold, never
silently misread.  The motivating hazard is real in this repo's own
history: a pre-deletion-vector reader folding a dv commit would have
ignored ``dv_add`` and resurrected every deleted row -- the exact
class of silent corruption Delta prevents with
``minReaderVersion``/table features.
"""

from __future__ import annotations

import json
import os

import pytest

from nyc_crash_mapper_etl_script_spark.sources.txtable import (
    _SUPPORTED_FEATURES,
    TxTable,
    UnsupportedTableFeatureError,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_dv_commits_declare_the_feature(spark, tmp_path):
    """Writers STAMP the features a commit's correct interpretation
    requires, so readers can refuse what they cannot fold."""
    from pyspark.sql import functions as F

    t = TxTable(str(tmp_path / "t"))
    t.init(_df(spark, [(1, "a"), (2, "b")]))
    t.delete_where(spark, F.col("k") == 1, dv=True)
    entries = t._entries()
    assert "requires" not in entries[0]  # plain init: base protocol
    assert entries[-1]["requires"] == ["deletion-vectors"]


def test_cluster_by_commits_declare_the_feature(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"), cluster_by=(["k"], ["k"], 4))
    t.init(_df(spark, [(1, "a"), (2, "b")]))
    assert t._entries()[-1]["requires"] == ["cluster-by"]


def test_unknown_required_feature_fails_reads_loudly(spark, tmp_path):
    """An entry stamped by a FUTURE writer with a feature this reader
    does not implement: every state-dependent operation raises the
    typed error naming the feature -- never a silent partial fold."""
    root = str(tmp_path / "t")
    t = TxTable(root)
    t.init(_df(spark, [(1, "a")]))
    # a future writer's commit lands
    d = t._log_dir()
    t.store.put_if_absent(
        os.path.join(d, "v000002.json"),
        json.dumps(
            {
                "op": "quantum_merge",
                "version": 2,
                "add": [],
                "remove": [],
                "staged": {},
                "requires": ["quantum-merge", "deletion-vectors"],
            }
        ).encode(),
    )
    fresh = TxTable(root)
    with pytest.raises(UnsupportedTableFeatureError, match="quantum-merge"):
        fresh.read(spark)
    with pytest.raises(UnsupportedTableFeatureError):
        fresh.append(_df(spark, [(2, "b")]))
    # the guard is TABLE-level (Delta protocol semantics): even an
    # as-of read below the alien commit refuses -- recovery must fold
    # the head to reconcile the filesystem, and the head demands the
    # unknown feature
    with pytest.raises(UnsupportedTableFeatureError):
        TxTable(root).read(spark, version=1)


def test_unknown_feature_in_checkpoint_fails_loudly(spark, tmp_path):
    """A checkpoint is a serialized fold: one stamped with an unknown
    requirement must raise too (its state keys may encode semantics
    this reader would drop), not be skipped as corrupt."""
    root = str(tmp_path / "t")
    t = TxTable(root, checkpoint_every=1)
    t.init(_df(spark, [(1, "a")]))
    ck = os.path.join(t._log_dir(), t._ckpt_name(1))
    st = json.loads(t.store.read_bytes(ck))
    st["requires"] = ["hyper-compaction"]
    t.store.delete(ck)
    t.store.put_if_absent(ck, json.dumps(st).encode())
    fresh = TxTable(root)
    fresh._state_cache.clear()
    with pytest.raises(UnsupportedTableFeatureError, match="hyper-compaction"):
        fresh.read(spark)


def test_rebase_refuses_unknown_feature_commit(spark, tmp_path):
    """The conflict checker cannot prove commutativity against an
    entry whose semantics it cannot interpret -- a racing RMW must
    abort, not rebase past it."""
    from nyc_crash_mapper_etl_script_spark.sources.txtable import (
        ConcurrentWriteError,
    )

    root = str(tmp_path / "t")
    t = TxTable(root)
    t.init(_df(spark, [(1, "a")]))

    def inject_alien():
        d = t._log_dir()
        t.store.put_if_absent(
            os.path.join(d, "v000002.json"),
            json.dumps(
                {
                    "op": "quantum_merge",
                    "version": 2,
                    "add": [],
                    "remove": [],
                    "staged": {},
                    "requires": ["quantum-merge"],
                }
            ).encode(),
        )

    orig = TxTable._commit

    def racing(self, mapping, removes, op, base_version=None, **kw):
        if op == "compact" and not getattr(self, "_fired", False):
            self._fired = True
            inject_alien()
        return orig(self, mapping, removes, op, base_version, **kw)

    TxTable._commit = racing
    try:
        with pytest.raises(
            (ConcurrentWriteError, UnsupportedTableFeatureError)
        ):
            t.compact(spark, n_files=1)
    finally:
        TxTable._commit = orig


def test_supported_feature_set_is_closed_over_writers():
    """Every feature a writer can stamp is one the reader implements
    -- the set only grows when both sides do."""
    assert {"deletion-vectors", "cluster-by"} <= _SUPPORTED_FEATURES
