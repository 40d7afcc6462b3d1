"""Log-checkpoint A/B (round 9): quantify state-reconstruction cost
on a long-lived table -- the motivating case is a streaming sink
appending one commit per trigger for days, where every open, read,
and commit replays the log.

Builds two tables with an IDENTICAL 300-commit history (tiny appends
through the real API), one with checkpoint_every=10 and one with
checkpointing disabled, then measures:

  state_ms      : fresh-handle _state() (the fold every operation
                  needs), mean of 50 cache-cleared calls
  read_s        : cold TxTable(root).read(spark).count() min-of-3
                  (open + plan + scan)
  commit_s      : one more tiny append at head, min-of-3 (the
                  steady-state per-trigger write cost)
  after_cleanup : the checkpointed table after cleanup_log() --
                  the bounded-log steady state a maintained stream
                  converges to

Writes BENCH_LOG_CKPT.json.  The absolute numbers are sandbox-local;
the SHAPE is the claim: without checkpoints every column grows with
commit count forever, with them it is O(tail) + O(listing).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_COMMITS = int(os.environ.get("AB_CKPT_COMMITS", "300"))


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from nyc_crash_mapper_etl_script_spark.sources.txtable import TxTable

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("ab_log_ckpt")
        .getOrCreate()
    )
    base = tempfile.mkdtemp(prefix="abckpt_")
    results: dict[str, dict] = {}

    def build(root: str, every: int) -> TxTable:
        t = TxTable(root, checkpoint_every=every)
        t.init(spark.range(0, 100).withColumn("v", F.col("id")))
        batch = spark.range(0, 5).withColumn("v", F.col("id")).localCheckpoint()
        for _ in range(N_COMMITS - 1):
            t.append(batch)
        return t

    def measure(root: str, every: int) -> dict:
        # state fold: fresh handle, cache cleared each call
        t = TxTable(root, checkpoint_every=every)
        n_state = 50
        t0 = time.perf_counter()
        for _ in range(n_state):
            # clear BOTH caches: the r10 parsed-entry cache would
            # otherwise make every fold parse-free and this column
            # would measure the cache, not the fresh-handle fold
            t._state_cache.clear()
            t._entry_cache.clear()
            t._state()
        state_ms = (time.perf_counter() - t0) / n_state * 1000
        # the object-store-invariant metric: LOG READ OPS per fold.
        # Local JSON reads are ~free; on an object store each is a
        # GET, so this column IS the latency story at deployment.
        reads = {"n": 0}
        real_read = t.store.read_bytes

        def counting_read(path):
            reads["n"] += 1
            return real_read(path)

        t.store.read_bytes = counting_read
        t._state_cache.clear()
        t._entry_cache.clear()
        t._state()
        t.store.read_bytes = real_read
        log_reads_per_fold = reads["n"]
        read_s = min(
            _timed(lambda: TxTable(root, checkpoint_every=every)
                   .read(spark).count())
            for _ in range(3)
        )
        batch = spark.range(0, 5).withColumn("v", F.col("id")).localCheckpoint()
        commit_s = min(
            _timed(lambda: TxTable(root, checkpoint_every=every).append(batch))
            for _ in range(3)
        )
        n_log = len(os.listdir(os.path.join(root, "_txlog")))
        return {
            "state_ms_mean50": round(state_ms, 2),
            "log_reads_per_fold": log_reads_per_fold,
            "read_s_min3": round(read_s, 3),
            "commit_s_min3": round(commit_s, 3),
            "log_files": n_log,
        }

    def _timed(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    def scale_100k() -> dict:
        """The r9-VERDICT #4 claim, measured: a synthetic 100k-live-
        file state (20 commits x 5k adds with per-file stats, straight
        through _publish -- log layer only, no Spark staging)
        checkpoints in bounded memory via the SHARDED form, and the
        cold fold resumes from it in O(tail).  The inline single-blob
        form is measured alongside for the memory comparison."""
        import tracemalloc

        import nyc_crash_mapper_etl_script_spark.sources.txtable as txm
        from nyc_crash_mapper_etl_script_spark.sources.txtable import (
            TxTable as TX,
        )

        root = os.path.join(base, "scale100k")
        t = TX(root, checkpoint_every=0)
        os.makedirs(t._log_dir(), exist_ok=True)
        for c in range(20):
            files = [f"part-{c:02d}-{i:05d}.parquet" for i in range(5000)]
            t._publish(
                {
                    "op": "append",
                    "add": files,
                    "remove": [],
                    "staged": {f: "" for f in files},
                    "stats": {
                        f: {"id": [c * 5000 + i, c * 5000 + i]}
                        for i, f in enumerate(files)
                    },
                }
            )
        head = t._snapshot_version()
        out: dict[str, dict] = {}
        # r11: the sharded form now defaults to PARQUET parts (Delta's
        # multi-part checkpoint-parquet analog); the jsonl form stays
        # as the dependency-free fallback and is measured alongside
        variants = (
            ("sharded_parquet", 10_000, "parquet"),
            ("sharded_jsonl", 10_000, "jsonl"),
            ("inline", 10**9, "parquet"),
        )
        for label, inline_max, part_fmt in variants:
            saved = txm._CKPT_INLINE_MAX
            txm._CKPT_INLINE_MAX = inline_max
            try:
                # r12: writer part format is a constructor setting
                w = TX(
                    root,
                    checkpoint_every=head,  # due exactly at head
                    ckpt_part_format=part_fmt,
                )
                tracemalloc.start()
                t0 = time.perf_counter()
                w._maybe_checkpoint(head)
                wall = time.perf_counter() - t0
                _, peak = tracemalloc.get_traced_memory()
                tracemalloc.stop()
                d = t._log_dir()
                assert any(
                    n.startswith(".ckpt_v") and n.endswith(".json")
                    for n in os.listdir(d)
                ), "checkpoint write silently failed"
                parts = [
                    n for n in os.listdir(d)
                    if n.endswith(".jsonl") or n.endswith(".parquet")
                ]
                part_bytes = sum(
                    os.path.getsize(os.path.join(d, n)) for n in parts
                )
                r = TX(root)
                t0 = time.perf_counter()
                st = r._state()
                fold = time.perf_counter() - t0
                assert len(st["live"]) == 100_000
                out[label] = {
                    "ckpt_write_s": round(wall, 3),
                    "ckpt_write_peak_mb": round(peak / 1e6, 1),
                    "ckpt_parts": len(parts),
                    "ckpt_part_mb": round(part_bytes / 1e6, 2),
                    "cold_fold_s": round(fold, 3),
                }
                # remove the checkpoint so the next variant re-measures
                for n in os.listdir(d):
                    if (
                        n.startswith(".ckpt_v")
                        or n.endswith(".jsonl")
                        or n.endswith(".parquet")
                    ):
                        os.unlink(os.path.join(d, n))
            finally:
                txm._CKPT_INLINE_MAX = saved
        return out

    try:
        for label, every in (("checkpointed", 10), ("no_checkpoint", 0)):
            root = os.path.join(base, label)
            build(root, every)
            results[label] = measure(root, every)
        # the maintained steady state: cleanup_log bounds the listing
        t = TxTable(os.path.join(base, "checkpointed"), checkpoint_every=10)
        t.cleanup_log()
        results["checkpointed_after_cleanup"] = measure(
            os.path.join(base, "checkpointed"), 10
        )
        results["scale_100k_files"] = scale_100k()
    finally:
        shutil.rmtree(base, ignore_errors=True)

    out = {
        "n_commits": N_COMMITS,
        "variants": results,
        "state_fold_speedup": round(
            results["no_checkpoint"]["state_ms_mean50"]
            / max(0.01, results["checkpointed"]["state_ms_mean50"]),
            1,
        ),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_LOG_CKPT.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
