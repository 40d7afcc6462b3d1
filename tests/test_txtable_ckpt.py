"""Log checkpoints: O(tail) state reconstruction, checkpoint-resumed
folds equal full folds at every version, cleanup_log's load-bearing
contract (exact continuity guard, vacuumed-history errors below the
cutoff, version numbering continues), and spec inheritance from a
checkpoint alone."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.sources.txtable import (
    _LOG_DIR,
    TxTable,
)


def _df(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .withColumn("ym", (F.col("id") % 2).cast("string"))
        .withColumn("v", F.col("id") * 2)
    )


def _ids(df):
    return sorted(r["id"] for r in df.collect())


def _drive(spark, root, n_commits=12, every=4):
    """A mixed op sequence long enough to cross several checkpoints."""
    t = TxTable(root, partition_by=["ym"], retain_history=True,
                checkpoint_every=every)
    t.init(_df(spark, 0, 20))
    for i in range(1, n_commits):
        if i % 5 == 2:
            t.delete_where(spark, F.col("id") == 20 + (i - 1) * 10)
        elif i % 5 == 4:
            t.delete_where(spark, F.col("id") % 17 == i % 17, dv=True)
        else:
            t.append(_df(spark, 20 + i * 10, 20 + i * 10 + 5))
    return t


def _ckpt_files(root):
    d = os.path.join(root, _LOG_DIR)
    return sorted(n for n in os.listdir(d) if n.startswith(".ckpt_v"))


def test_checkpointed_state_equals_full_fold(spark, tmp_path):
    root = str(tmp_path / "t")
    t = _drive(spark, root)
    assert _ckpt_files(root), "no checkpoint written"
    entries = t._entries()
    head = entries[-1]["version"]
    for v in range(1, head + 1):
        t._state_cache.clear()
        st = t._state(v)
        assert sorted(st["live"]) == sorted(
            t._live_files(entries, version=v)
        ), f"live mismatch at v{v}"
        assert st["dv_live"] == t._live_dvs(entries, version=v), (
            f"dv mismatch at v{v}"
        )


def test_checkpoints_hidden_from_entries_and_history(spark, tmp_path):
    root = str(tmp_path / "t")
    t = _drive(spark, root)
    vs = [e["version"] for e in t._entries()]
    assert vs == list(range(1, len(vs) + 1))
    assert all(isinstance(h["op"], str) for h in t.history())


def test_corrupt_checkpoint_falls_back_to_full_fold(spark, tmp_path):
    root = str(tmp_path / "t")
    t = _drive(spark, root)
    before = _ids(t.read(spark))
    for name in _ckpt_files(root):
        with open(os.path.join(root, _LOG_DIR, name), "w") as f:
            f.write("{corrupt json")
    t._state_cache.clear()
    assert _ids(t.read(spark)) == before


def test_reads_prefer_checkpoint_over_tail_reread(spark, tmp_path):
    """The newest checkpoint at or below the version seeds the fold:
    poisoning it (valid JSON, wrong content) must CHANGE the result --
    structural proof the fast path is actually taken."""
    root = str(tmp_path / "t")
    t = _drive(spark, root)
    name = _ckpt_files(root)[-1]
    p = os.path.join(root, _LOG_DIR, name)
    state = json.loads(open(p).read())
    victim = next(iter(state["live"]))
    state["live"] = {
        r: s for r, s in state["live"].items() if r != victim
    }
    os.unlink(p)
    with open(p, "w") as f:
        json.dump(state, f)
    t._state_cache.clear()
    full = set(t._live_files(t._entries()))
    assert set(t._state()["live"]) == full - {victim}


def test_cleanup_log_keeps_head_reads_working(spark, tmp_path):
    root = str(tmp_path / "t")
    t = _drive(spark, root, n_commits=12, every=4)
    before = _ids(t.read(spark))
    ckpt_v = int(_ckpt_files(root)[-1][7:-5])
    removed = t.cleanup_log()
    assert removed >= ckpt_v
    t._state_cache.clear()
    assert _ids(t.read(spark)) == before
    # time travel at/above the cutoff works; below raises loudly
    assert _ids(t.read(spark, version=ckpt_v)) is not None
    with pytest.raises(FileNotFoundError, match="cleanup_log"):
        t.read(spark, version=ckpt_v - 2)
    with pytest.raises(FileNotFoundError, match="cleanup_log"):
        t.changes(spark, 1)


def test_cleanup_log_requires_checkpointed_cutoff(spark, tmp_path):
    root = str(tmp_path / "t")
    t = _drive(spark, root)
    with pytest.raises(ValueError, match="not a checkpointed"):
        t.cleanup_log(before=3)


def test_writes_continue_after_cleanup_at_head(spark, tmp_path):
    """cleanup_log at a head-version checkpoint can delete EVERY
    entry; the next commit must continue the version numbering from
    the checkpoint, and a bare handle must still inherit the logged
    layout from it."""
    root = str(tmp_path / "t")
    t = TxTable(root, partition_by=["ym"], checkpoint_every=2)
    t.init(_df(spark, 0, 10))
    t.append(_df(spark, 10, 15))  # v2 -> checkpoint at 2
    t.cleanup_log()
    d = os.path.join(root, _LOG_DIR)
    assert not [n for n in os.listdir(d) if n.endswith(".json") and not n.startswith(".")]
    bare = TxTable(root)
    assert bare.exists()
    assert bare.partition_by == ["ym"]  # inherited from the checkpoint
    v = bare.append(_df(spark, 15, 20))
    assert v == 3  # numbering continues past the cleaned entries
    assert _ids(bare.read(spark)) == list(range(20))


def test_stream_reads_tail_after_cleanup(spark, tmp_path):
    """A paced stream starting at the checkpointed cutoff consumes the
    surviving tail; starting below it fails with the cleaned-history
    error instead of a silently partial feed."""
    from nyc_crash_mapper_etl_script_spark.sources.txstream import (
        read_txtable_stream,
    )

    root = str(tmp_path / "t")
    t = TxTable(root, retain_history=True, checkpoint_every=2)
    t.init(spark.range(0, 10).withColumn("v", F.col("id")))
    t.append(spark.range(10, 20).withColumn("v", F.col("id")))  # v2: ckpt
    t.append(spark.range(20, 30).withColumn("v", F.col("id")))  # v3
    t.cleanup_log()  # drops v1, v2 entries
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
    got = spark.read.parquet(out)
    assert _ids(got) == list(range(20, 30))
    assert {r["_commit_version"] for r in got.collect()} == {3}


def test_cleanup_keep_versions_window(spark, tmp_path):
    """keep_versions retains a lagging consumer's catch-up range: the
    cutoff is the newest checkpoint at or below head-N."""
    root = str(tmp_path / "t")
    t = TxTable(root, checkpoint_every=2, retain_history=True)
    t.init(_df(spark, 0, 5))
    for i in range(7):  # head = 8, ckpts at 2,4,6,8
        t.append(_df(spark, 5 + i, 6 + i))
    t.cleanup_log(keep_versions=3)  # newest ckpt <= 5 -> cutoff 4
    t._state_cache.clear()
    remaining = [e["version"] for e in t._entries()]
    assert remaining == [5, 6, 7, 8]
    assert _ids(t.read(spark, version=5)) is not None
    with pytest.raises(FileNotFoundError):
        t.read(spark, version=3)
    # a window wider than history is a no-op
    assert t.cleanup_log(keep_versions=100) == 0


def test_checkpointing_disabled_writes_none(spark, tmp_path):
    root = str(tmp_path / "t")
    t = TxTable(root, checkpoint_every=0)
    t.init(_df(spark, 0, 10))
    for i in range(12):
        t.append(_df(spark, 10 + i, 11 + i))
    assert not _ckpt_files(root)
    assert _ids(t.read(spark)) == list(range(10)) + list(range(10, 22))


def test_fresh_stream_from_zero_fails_loud_on_cleaned_log(spark, tmp_path):
    """A fresh consumer with the default starting_version=0 over a
    cleanup_log'd table must FAIL, never silently deliver only the
    surviving tail (its offset would advance past rows it never
    emitted)."""
    from nyc_crash_mapper_etl_script_spark.sources.txstream import (
        read_txtable_stream,
    )

    root = str(tmp_path / "t")
    t = TxTable(root, retain_history=True, checkpoint_every=2)
    t.init(spark.range(0, 10).withColumn("v", F.col("id")))
    t.append(spark.range(10, 20).withColumn("v", F.col("id")))
    t.append(spark.range(20, 30).withColumn("v", F.col("id")))
    t.cleanup_log()  # drops v1, v2 entries
    out, ck = str(tmp_path / "o"), str(tmp_path / "c")
    q = (
        read_txtable_stream(spark, root)  # default: from version 0
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="cleanup_log|incomplete"):
        q.awaitTermination(120)
        raise AssertionError("stream drained a cleaned log silently")


def test_commits_since_rewrite_survives_cleanup(spark, tmp_path):
    """The auto-compaction trigger counts from the state's
    last_rewrite_version, which rides checkpoints -- cleanup_log
    deleting the rewrite's own entry must not cap the counter below
    the compaction threshold (the starvation interaction between the
    two retention policies)."""
    root = str(tmp_path / "t")
    t = TxTable(root, checkpoint_every=2)
    t.init(_df(spark, 0, 10))  # v1: rewrite
    for i in range(5):
        t.append(_df(spark, 10 + i, 11 + i))  # v2..v6
    assert t.commits_since_rewrite() == 5
    t.cleanup_log()  # newest ckpt (v6) -> ALL entries deleted
    t._state_cache.clear()
    assert t.commits_since_rewrite() == 5  # still head - v1, via state


def test_cleanup_refuses_corrupt_cutoff_checkpoint(spark, tmp_path):
    root = str(tmp_path / "t")
    t = TxTable(root, checkpoint_every=2)
    t.init(_df(spark, 0, 10))
    t.append(_df(spark, 10, 15))  # v2: ckpt
    name = _ckpt_files(root)[-1]
    with open(os.path.join(root, _LOG_DIR, name), "w") as f:
        f.write("{corrupt")
    with pytest.raises(ValueError, match="unreadable"):
        t.cleanup_log()
    # nothing was deleted; the table still reads via the full fold
    t._state_cache.clear()
    assert len(t._entries()) == 2
    assert _ids(t.read(spark)) == list(range(15))


def test_vacuum_after_cleanup(spark, tmp_path):
    root = str(tmp_path / "t")
    t = _drive(spark, root, n_commits=12, every=4)
    t.cleanup_log()
    before = _ids(t.read(spark))
    t.vacuum(keep_versions=2)
    t._state_cache.clear()
    assert _ids(t.read(spark)) == before


def test_timestamp_time_travel(spark, tmp_path):
    """read(timestamp=T) resolves to the newest commit at or before T
    (Delta's TIMESTAMP AS OF): between-commit timestamps land on the
    earlier version, pre-history timestamps raise, and the resolution
    composes with dv deletes."""
    import time as _time

    root = str(tmp_path / "t")
    t = TxTable(root, retain_history=True)
    t.init(_df(spark, 0, 10))
    ts1 = [e["ts"] for e in t.history() if e["version"] == 1][0]
    _time.sleep(0.05)
    t.append(_df(spark, 10, 20))
    _time.sleep(0.05)
    t.delete_where(spark, F.col("id") < 5, dv=True)
    ts3 = [e["ts"] for e in t.history() if e["version"] == 3][0]
    assert _ids(t.read(spark, timestamp=ts1)) == list(range(10))
    mid = (ts1 + [e["ts"] for e in t.history() if e["version"] == 2][0]) / 2
    assert _ids(t.read(spark, timestamp=mid)) == list(range(10))
    assert _ids(t.read(spark, timestamp=ts3 + 10)) == list(range(5, 20))
    with pytest.raises(FileNotFoundError, match="no retained commit"):
        t.read(spark, timestamp=ts1 - 10)
    with pytest.raises(ValueError, match="not both"):
        t.read(spark, version=1, timestamp=ts1)


# -- sharded (multi-part) checkpoints (r9 VERDICT #4) -------------------


def _shard_small(monkeypatch, inline_max=5, part_rows=7, part_fmt=None):
    import nyc_crash_mapper_etl_script_spark.sources.txtable as txm

    monkeypatch.setattr(txm, "_CKPT_INLINE_MAX", inline_max)
    monkeypatch.setattr(txm, "_CKPT_PART_ROWS", part_rows)
    if part_fmt is not None:
        # r12: the writer format is an explicit setting (env var /
        # constructor), no longer a patchable import-probe constant
        monkeypatch.setenv(txm._CKPT_FORMAT_ENV, part_fmt)


def _manifests(d):
    return sorted(
        n for n in os.listdir(d)
        if n.startswith(".ckpt_v") and n.endswith(".json")
    )


def _parts(d, version=None):
    pre = f"ckpt_v{version:06d}.p" if version is not None else "ckpt_v"
    return sorted(
        n for n in os.listdir(d)
        if n.startswith(pre)
        and (n.endswith(".jsonl") or n.endswith(".parquet"))
    )


@pytest.mark.parametrize("part_fmt", ["parquet", "jsonl"])
def test_sharded_checkpoint_roundtrips_state(
    spark, tmp_path, monkeypatch, part_fmt
):
    """Past the inline threshold the checkpoint shards into part files
    (parquet by default, JSON-lines fallback) + a CAS-published
    manifest; a fresh handle's fold from it equals the pure entry
    fold, key for key."""
    _shard_small(monkeypatch, part_fmt=part_fmt)
    root = str(tmp_path / "t")
    t = _drive(spark, root, n_commits=12, every=4)
    d0 = os.path.join(root, _LOG_DIR)
    manifests = _manifests(d0)
    parts = _parts(d0)
    assert manifests and parts, "expected sharded checkpoints"
    ext = ".parquet" if part_fmt == "parquet" else ".jsonl"
    assert all(n.endswith(ext) for n in parts)
    newest = manifests[-1]
    m = json.loads(
        open(os.path.join(root, _LOG_DIR, newest), "rb").read()
    )
    assert m.get("format") == "sharded" and m["parts"] >= 2
    assert m.get("part_format") == part_fmt
    assert m["rows"] == sum(m["part_rows"]) and len(m["part_rows"]) == m["parts"]
    assert "sharded-checkpoint" in m.get("requires", []), (
        "sharded manifests must stamp the format feature so old "
        "readers refuse instead of folding an empty state"
    )
    for k in ("live", "stats"):
        assert k not in m, "bulk sections must not ride the manifest"
    # the FILE-scoped format feature never rides the table state
    assert "sharded-checkpoint" not in TxTable(root)._state().get(
        "requires", []
    )
    # checkpoint-resumed fold == pure entry fold
    from_ckpt = TxTable(root)._state()
    d = os.path.join(root, _LOG_DIR)
    pure = TxTable(root)
    for n in list(os.listdir(d)):
        if (
            n.startswith(".ckpt_v")
            or n.endswith(".jsonl")
            or n.endswith(".parquet")
        ):
            os.unlink(os.path.join(d, n))
    ps = pure._state()
    # the checkpoint writer prunes DEAD-file stats/staging (cache
    # hygiene, same as the inline form) -- compare the live substance
    for k in ps:
        if k in ("stats", "dv_staged"):
            continue
        assert ps[k] == from_ckpt[k], k
    for f in ps["live"]:
        assert ps["stats"].get(f) == from_ckpt["stats"].get(f), f
    assert _ids(TxTable(root).read(spark)) == _ids(t.read(spark))


@pytest.mark.parametrize("part_fmt", ["parquet", "jsonl"])
def test_sharded_checkpoint_missing_part_falls_back(
    spark, tmp_path, monkeypatch, part_fmt
):
    """A sharded checkpoint with a vanished part is CORRUPT: readers
    fall back to an older checkpoint or the full fold, never a
    partial state."""
    _shard_small(monkeypatch, part_fmt=part_fmt)
    root = str(tmp_path / "t")
    t = _drive(spark, root, n_commits=12, every=4)
    want = _ids(t.read(spark))
    d = os.path.join(root, _LOG_DIR)
    os.unlink(os.path.join(d, _parts(d)[-1]))  # newest ckpt's shard
    h = TxTable(root)
    assert _ids(h.read(spark)) == want
    # and a manifest-less orphan part set is simply invisible
    for n in list(os.listdir(d)):
        if n.startswith(".ckpt_v") and n.endswith(".json"):
            os.unlink(os.path.join(d, n))
    assert _ids(TxTable(root).read(spark)) == want


@pytest.mark.parametrize("part_fmt", ["parquet", "jsonl"])
def test_cleanup_log_validates_and_prunes_sharded_parts(
    spark, tmp_path, monkeypatch, part_fmt
):
    """cleanup_log against a SHARDED cutoff: refuses when a shard is
    missing (the checkpoint would brick folds once load-bearing),
    deletes superseded checkpoints' parts, sweeps manifest-less
    orphans, skips alien files wearing the part-name shape, and head
    reads keep working after the cleanup."""
    _shard_small(monkeypatch, part_fmt=part_fmt)
    root = str(tmp_path / "t")
    t = _drive(spark, root, n_commits=12, every=4)
    want = _ids(t.read(spark))
    d = os.path.join(root, _LOG_DIR)
    # sabotage the cutoff checkpoint's shard -> refuse
    cut = TxTable(root)._ckpt_version(_manifests(d)[-1])
    victim = _parts(d, cut)[0]
    raw = open(os.path.join(d, victim), "rb").read()
    os.unlink(os.path.join(d, victim))
    with pytest.raises(ValueError, match="unreadable"):
        t.cleanup_log(before=cut)
    # restore; drop an orphan part at a manifest-less version BELOW
    # the cutoff and an alien file that would ValueError a naive
    # int() parse -- neither may abort or survive the sweep
    with open(os.path.join(d, victim), "wb") as f:
        f.write(raw)
    orphan = f"ckpt_v{cut - 1:06d}.p0099.jsonl"
    alien = "ckpt_vSNAPSHOT.part.jsonl"
    for n in (orphan, alien):
        with open(os.path.join(d, n), "w") as f:
            f.write("{}\n")
    removed = t.cleanup_log(before=cut)
    assert removed > 0
    # superseded checkpoints' parts + the orphan are gone; the
    # cutoff's remain; the alien is untouched
    left = [n for n in _parts(d) if n != alien]
    assert left and all(n.startswith(f"ckpt_v{cut:06d}.p") for n in left)
    assert not os.path.exists(os.path.join(d, orphan))
    assert os.path.exists(os.path.join(d, alien))
    assert _ids(TxTable(root).read(spark)) == want


@pytest.mark.parametrize("part_fmt", ["parquet", "jsonl"])
def test_sharded_parts_are_spark_readable(
    spark, tmp_path, monkeypatch, part_fmt
):
    """The scale contract: part files are plain parquet (or
    JSON-lines) Spark can scan directly -- a 100 TB deployment can
    audit/join the live-file inventory without driver-side JSON."""
    _shard_small(monkeypatch, part_fmt=part_fmt)
    root = str(tmp_path / "t")
    t = _drive(spark, root, n_commits=12, every=4)
    d = os.path.join(root, _LOG_DIR)
    cut = TxTable(root)._ckpt_version(_manifests(d)[-1])
    paths = [os.path.join(d, n) for n in _parts(d, cut)]
    rows = (
        spark.read.parquet(*paths)
        if part_fmt == "parquet"
        else spark.read.json(paths)
    )
    live = {
        r["k"] for r in rows.where(F.col("s") == "live").collect()
    }
    assert live == set(t._state(cut)["live"])


# -- r11 hardening: format feature gate, strict unknown formats,
#    reassembly row-count validation, mixed-version safety ----------


def test_old_reader_refuses_sharded_checkpoint(spark, tmp_path, monkeypatch):
    """A build WITHOUT the sharded-checkpoint feature (r10 and older
    validate ``requires`` before looking at ``format``) must refuse
    the table loudly -- NEVER state.update() a bulk-less manifest and
    then retire real data as provably superseded."""
    import nyc_crash_mapper_etl_script_spark.sources.txtable as txm
    from nyc_crash_mapper_etl_script_spark.sources.txtable import (
        UnsupportedTableFeatureError,
    )

    _shard_small(monkeypatch)
    root = str(tmp_path / "t")
    t = _drive(spark, root, n_commits=12, every=4)
    cut = t._ckpt_version(_manifests(os.path.join(root, _LOG_DIR))[-1])
    t.cleanup_log(before=cut)  # the sharded checkpoint is load-bearing
    monkeypatch.setattr(
        txm,
        "_SUPPORTED_FEATURES",
        txm._SUPPORTED_FEATURES - {"sharded-checkpoint"},
    )
    with pytest.raises(UnsupportedTableFeatureError, match="sharded"):
        TxTable(root)._state()


def test_unknown_checkpoint_format_is_corrupt_class(
    spark, tmp_path, monkeypatch
):
    """A manifest naming a format this build does not recognize must
    raise in _read_ckpt (corrupt-class -> callers fall back), never
    fold as an inline blob with empty bulk sections."""
    _shard_small(monkeypatch)
    root = str(tmp_path / "t")
    t = _drive(spark, root, n_commits=12, every=4)
    want = _ids(t.read(spark))
    d = os.path.join(root, _LOG_DIR)
    newest = _manifests(d)[-1]
    p = os.path.join(d, newest)
    m = json.loads(open(p, "rb").read())
    m["format"] = "v3-fancy"
    with open(p, "w") as f:
        json.dump(m, f)
    h = TxTable(root)
    with pytest.raises(ValueError, match="unrecognized format"):
        h._read_ckpt(newest)
    assert _ids(TxTable(root).read(spark)) == want  # fell back
    # unknown PART format: same corrupt-class contract
    m["format"] = "sharded"
    m["part_format"] = "avro"
    with open(p, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="part_format"):
        TxTable(root)._read_ckpt(newest)
    assert _ids(TxTable(root).read(spark)) == want


@pytest.mark.parametrize("part_fmt", ["parquet", "jsonl"])
def test_mixed_partitioning_part_rejected_by_row_counts(
    spark, tmp_path, monkeypatch, part_fmt
):
    """A leftover part from a crashed attempt by a build with a
    DIFFERENT _CKPT_PART_ROWS (adopted silently by put_if_absent) must
    fail the manifest's row-count validation, not reassemble with
    missing/duplicated rows."""
    import nyc_crash_mapper_etl_script_spark.sources.txtable as txm

    _shard_small(monkeypatch, part_fmt=part_fmt)
    root = str(tmp_path / "t")
    t = _drive(spark, root, n_commits=12, every=4)
    want = _ids(t.read(spark))
    d = os.path.join(root, _LOG_DIR)
    newest = _manifests(d)[-1]
    cut = t._ckpt_version(newest)
    # simulate the alien part: rewrite part 0 with FEWER rows (as a
    # crashed small-_CKPT_PART_ROWS writer would have left it)
    victim = os.path.join(d, _parts(d, cut)[0])
    rows = TxTable(root)._decode_ckpt_part(
        open(victim, "rb").read(), part_fmt, victim
    )
    short = rows[:-2]
    os.unlink(victim)
    handle = TxTable(root)
    handle._put_ckpt_part(d, cut, 0, short, part_fmt)
    fresh = TxTable(root)
    with pytest.raises(ValueError, match="rows"):
        fresh._read_ckpt(newest)
    assert _ids(TxTable(root).read(spark)) == want  # fell back


def test_r10_manifest_without_new_keys_still_reads(
    spark, tmp_path, monkeypatch
):
    """Back-compat: an r10-written sharded manifest (jsonl parts, no
    part_format/part_rows/rows/requires keys) reads fine -- the new
    validation only engages when the manifest records the counts."""
    _shard_small(monkeypatch, part_fmt="jsonl")
    root = str(tmp_path / "t")
    t = _drive(spark, root, n_commits=12, every=4)
    want = _ids(t.read(spark))
    d = os.path.join(root, _LOG_DIR)
    newest = _manifests(d)[-1]
    p = os.path.join(d, newest)
    m = json.loads(open(p, "rb").read())
    for k in ("part_format", "part_rows", "rows"):
        m.pop(k, None)
    m["requires"] = [
        r for r in m.get("requires", []) if r != "sharded-checkpoint"
    ] or None
    if m["requires"] is None:
        del m["requires"]
    with open(p, "w") as f:
        json.dump(m, f)
    fresh = TxTable(root)
    st = fresh._read_ckpt(newest)
    assert st["live"] and st["version"] == fresh._ckpt_version(newest)
    assert _ids(TxTable(root).read(spark)) == want


# -- r12: explicit part-format policy + crashed-attempt hygiene ---------


def test_part_format_env_pins_jsonl_despite_pyarrow(
    spark, tmp_path, monkeypatch
):
    """ADVICE r11 (txtable.py:174): a heterogeneous fleet (readers
    without pyarrow are an accepted configuration) pins jsonl so a
    pyarrow-equipped writer can't strand pyarrow-less readers once
    cleanup_log makes a parquet-part checkpoint load-bearing."""
    _shard_small(monkeypatch, part_fmt="jsonl")  # sets the env var
    root = str(tmp_path / "t")
    _drive(spark, root, n_commits=12, every=4)
    d = os.path.join(root, _LOG_DIR)
    assert _parts(d), "expected sharded checkpoints"
    assert all(n.endswith(".jsonl") for n in _parts(d))


def test_part_format_constructor_overrides_env(
    spark, tmp_path, monkeypatch
):
    import nyc_crash_mapper_etl_script_spark.sources.txtable as txm

    pytest.importorskip("pyarrow")
    _shard_small(monkeypatch, part_fmt="jsonl")
    root = str(tmp_path / "t")
    t = TxTable(
        root,
        partition_by=["ym"],
        checkpoint_every=1,
        ckpt_part_format="parquet",
    )
    t.init(_df(spark, 0, 20))
    t.append(_df(spark, 20, 40))
    d = os.path.join(root, _LOG_DIR)
    assert _parts(d) and all(n.endswith(".parquet") for n in _parts(d))
    assert txm  # silence unused-import lint


def test_part_format_validates_eagerly(tmp_path, monkeypatch):
    import nyc_crash_mapper_etl_script_spark.sources.txtable as txm

    with pytest.raises(ValueError, match="part format"):
        TxTable(str(tmp_path / "t"), ckpt_part_format="msgpack")
    monkeypatch.setenv(txm._CKPT_FORMAT_ENV, "bogus")
    with pytest.raises(ValueError, match="part format"):
        txm._resolve_ckpt_part_format()
    # an unsatisfiable parquet pin fails loudly, not mid-checkpoint
    monkeypatch.setattr(txm, "_pa", None)
    with pytest.raises(ValueError, match="pyarrow"):
        txm._resolve_ckpt_part_format("parquet")


@pytest.mark.parametrize("part_fmt", ["parquet", "jsonl"])
def test_adopted_mismatched_part_aborts_checkpoint(
    spark, tmp_path, monkeypatch, part_fmt
):
    """ADVICE r11 (txtable.py:904): put_if_absent adopting a leftover
    part from a crashed DIFFERENT-build attempt must not publish a
    manifest whose counts were computed from this writer's in-memory
    parts -- that checkpoint would be permanently corrupt-class at
    its version.  On byte mismatch the whole attempt aborts BEFORE
    the manifest CAS (best-effort cache: skipping is free)."""
    if part_fmt == "parquet":
        pytest.importorskip("pyarrow")
    _shard_small(monkeypatch, part_fmt=part_fmt)
    root = str(tmp_path / "t")
    t = TxTable(root, partition_by=["ym"], checkpoint_every=0,
                retain_history=True)
    t.init(_df(spark, 0, 30))
    t.append(_df(spark, 30, 60))
    head = t._snapshot_version()
    d = os.path.join(root, _LOG_DIR)
    # the crashed alien attempt left part 0 with foreign bytes
    ext = "parquet" if part_fmt == "parquet" else "jsonl"
    alien = os.path.join(d, f"ckpt_v{head:06d}.p0000.{ext}")
    with open(alien, "wb") as f:
        f.write(b'{"s": "live", "k": "alien", "v": {}}\n')
    w = TxTable(root, checkpoint_every=head)
    w._maybe_checkpoint(head)
    assert not _manifests(d), (
        "manifest published over a part known not to match disk"
    )
    # reads are unaffected (checkpoint is a cache)
    assert len(_ids(TxTable(root).read(spark))) == 60
    # once the stray part is gone the same writer checkpoints fine
    os.unlink(alien)
    w._maybe_checkpoint(head)
    assert _manifests(d)
    assert len(_ids(TxTable(root).read(spark))) == 60


def test_cleanup_fold_failure_names_checkpoint_load_error(
    spark, tmp_path, monkeypatch
):
    """ADVICE r11 (txtable.py:174): pyarrow-equipped writer
    checkpoints in parquet, cleanup_log makes it load-bearing, then a
    pyarrow-LESS reader of the same build must get the informative
    'install pyarrow'-class diagnosis chained into the fold error --
    not a misleading 'cleanup_log removed history'."""
    import nyc_crash_mapper_etl_script_spark.sources.txtable as txm

    pytest.importorskip("pyarrow")
    _shard_small(monkeypatch, part_fmt="parquet")
    root = str(tmp_path / "t")
    t = _drive(spark, root, n_commits=12, every=4)
    assert t.cleanup_log() > 0
    # the same build, minus pyarrow (its own env doesn't pin parquet
    # -- with auto it resolves jsonl and constructs fine; only READS
    # of the parquet-part checkpoint fail)
    monkeypatch.setenv(txm._CKPT_FORMAT_ENV, "auto")
    monkeypatch.setattr(txm, "_pa", None)
    monkeypatch.setattr(txm, "_pq", None)
    h = TxTable(root)
    with pytest.raises(FileNotFoundError, match="pyarrow") as ei:
        h._state()
    assert isinstance(ei.value.__cause__, ValueError)
    assert "pyarrow" in str(ei.value.__cause__)


def test_orphan_parts_above_cutoff_are_swept(
    spark, tmp_path, monkeypatch
):
    """r11 VERDICT item 5: manifest-less orphan parts from a crashed
    attempt at a version that can never become a future cutoff (no
    manifest ever landed, and a newer checkpoint exists) must be
    swept by cleanup_log, not accumulate forever -- even when they
    sit ABOVE the cutoff version."""
    _shard_small(monkeypatch, part_fmt="jsonl")
    root = str(tmp_path / "t")
    t = _drive(spark, root, n_commits=12, every=4)
    d = os.path.join(root, _LOG_DIR)
    cks = sorted(t._ckpt_version(n) for n in _manifests(d))
    assert len(cks) >= 2, cks
    cutoff, newest = cks[-2], cks[-1]
    orphan_v = cutoff + 1  # crashed attempt between the two
    assert orphan_v < newest and orphan_v not in cks
    orphan = os.path.join(d, f"ckpt_v{orphan_v:06d}.p0000.jsonl")
    with open(orphan, "wb") as f:
        f.write(b'{"s": "live", "k": "ghost", "v": {}}\n')
    t.cleanup_log(before=cutoff)
    names = set(os.listdir(d))
    assert os.path.basename(orphan) not in names, "orphan accumulated"
    # the surviving checkpoints' parts are untouched
    assert _parts(d, cutoff) and _parts(d, newest)
    want = _ids(t.read(spark))
    assert _ids(TxTable(root).read(spark)) == want
