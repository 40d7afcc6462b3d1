"""Commit-path declaration-cost guards (r9 VERDICT items 2 and 5).

Round 9 grew the commit path (conflict walk, schema-advance guard,
feature validation, colmap resolution) and the tx bench rows drifted
with nothing gating it.  These tests pin the LOG-LAYER costs -- pure
python, no Spark session -- so the next feature round cannot silently
re-inflate them:

- the per-handle parsed-entry cache makes a steady drain parse each
  immutable entry AT MOST once (the writer's own commits: zero --
  publish seeds the cache);
- a no-winner commit against a long checkpointed log stays
  millisecond-scale (bounds tied to BENCH_LOG_CKPT.json: 300-commit
  checkpointed fold ~4.7 ms);
- the incremental state fold makes a head re-fold after one new
  commit O(1 entry), not O(tail).

The entries published here are metadata-only ({add: [], remove: []})
-- _publish/_state/_maybe_checkpoint exercise exactly the code the
real data paths pay per commit, without Spark staging."""

from __future__ import annotations

import os
import time

from nyc_crash_mapper_etl_script_spark.sources.txtable import TxTable


def _blank_entry() -> dict:
    return {"op": "append", "add": [], "remove": [], "staged": {}}


def _mklog(root: str, n: int, checkpoint_every: int = 10) -> TxTable:
    t = TxTable(root, checkpoint_every=checkpoint_every)
    os.makedirs(t._log_dir(), exist_ok=True)
    for _ in range(n):
        v = t._publish(_blank_entry())
        t._maybe_checkpoint(v)
    return t


def test_writer_handle_never_reparses_its_own_commits(tmp_path):
    t = _mklog(str(tmp_path / "t"), 30, checkpoint_every=0)
    for _ in range(10):
        t._state()
    assert t._entry_parses == 0, (
        "publish seeds the parsed-entry cache; a single-writer "
        "handle's folds must be parse-free"
    )


def test_fresh_handle_parses_each_entry_at_most_once(tmp_path):
    root = str(tmp_path / "t")
    t = _mklog(root, 30, checkpoint_every=0)
    h = TxTable(root, checkpoint_every=0)
    for _ in range(10):
        h._state()
    assert h._entry_parses == 30, (
        f"expected one parse per entry, got {h._entry_parses} for 30 "
        "entries over 10 head folds"
    )
    # a new commit lands: the incremental fold reads ONLY it
    t._publish(_blank_entry())
    before = h._entry_parses
    h._state()
    assert h._entry_parses == before + 1, (
        "head re-fold after one new commit must parse exactly that "
        f"one entry (parsed {h._entry_parses - before})"
    )


def test_rebase_walk_is_parse_free_over_seen_entries(tmp_path):
    """A conflict walk over entries the handle already folded (the
    steady pipeline case: the winner set is the handle's own recent
    reads) re-parses nothing."""
    root = str(tmp_path / "t")
    t = _mklog(root, 10, checkpoint_every=0)
    h = TxTable(root, checkpoint_every=0)
    h._state()  # folds v1..v10 (10 parses)
    base = h._entry_parses
    # stale base: rebase walks (2, 10] -- all cached
    new_base = h._rebase(_blank_entry(), 2, 10, "files")
    assert new_base == 10
    assert h._entry_parses == base, "rebase re-parsed cached entries"


def test_no_winner_commit_cost_bounded_at_300_commit_log(tmp_path):
    """The tx micro-path budget (VERDICT r9 #5): with the log at 300
    commits and checkpoints every 10, one no-winner publish plus the
    head state fold must stay millisecond-scale.  Bound is GENEROUS
    (min-of-20 vs a ~1-3 ms measured floor) so shared-VM noise cannot
    flake it while a structural O(history) regression still fails."""
    t = _mklog(str(tmp_path / "t"), 300, checkpoint_every=10)
    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        v = t._publish(_blank_entry())
        t._state(v)
        times.append(time.perf_counter() - t0)
    best = min(times)
    assert best <= 0.025, f"no-winner commit cost regressed: {times}"


def test_cold_open_fold_bounded_at_300_commit_log(tmp_path):
    """A FRESH handle's first head fold resumes from the newest
    checkpoint: O(tail), never O(300).  Bound tied to
    BENCH_LOG_CKPT.json (~4.7 ms checkpointed fold), padded for
    shared-VM noise."""
    root = str(tmp_path / "t")
    _mklog(root, 300, checkpoint_every=10)
    times = []
    for _ in range(5):
        h = TxTable(root)
        t0 = time.perf_counter()
        h._state()
        times.append(time.perf_counter() - t0)
    assert min(times) <= 0.100, f"cold-open fold regressed: {times}"


def test_recovery_walk_gated_per_observed_version(spark, tmp_path, monkeypatch):
    """_recover()'s O(table files) walk runs once per observed head
    version per handle: repeat reads on a quiescent table skip it
    (filesystem divergence always accompanies a version bump --
    publish precedes finalize), a new commit re-arms it, and a fresh
    handle always reconciles once."""
    import os as _os

    root = str(tmp_path / "t")
    t = TxTable(root)
    t.init(spark.createDataFrame([(1, "a")], "k long, v string"))
    calls = {"n": 0}
    real = _os.walk

    def counting(top, *a, **k):
        if str(top) == root:  # the recovery walk starts at the root
            calls["n"] += 1   # (staging walks start below it)
        return real(top, *a, **k)

    monkeypatch.setattr(_os, "walk", counting)
    for _ in range(3):
        t.read(spark).count()
    assert calls["n"] == 1, "quiescent repeat reads must not re-walk"
    t.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    t.read(spark).count()
    assert calls["n"] == 2, "a new version must re-arm recovery"
    TxTable(root).read(spark).count()
    assert calls["n"] == 3, "a fresh handle always reconciles once"
