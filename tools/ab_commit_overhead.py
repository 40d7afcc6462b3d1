"""Commit-path overhead A/B (r9 VERDICT #1): attribute the r9 tx-row
bench drift (tx_stream_drain_steady / tx_delete_where /
tx_pruned_scan FLAGs, +22% envelope median shift around the
OCC-rebase f5ea2ec and schema-enforcement/colmap 4d7a46a commits) to
the r9 features vs host heat, and quantify what the r10 parsed-entry
cache + incremental state fold reclaim.

Two layers, same variants:

1. LOG-LAYER microbench (no Spark): a no-winner commit + head state
   fold against a 300-commit checkpointed log, min-of-50.  This is
   where the r9 features actually execute (schema-advance guard,
   feature validation, colmap resolution, conflict walk), so it
   attributes their cost free of Spark-job noise.

2. SPARK micro-paths: the exact bench rows that FLAGged
   (tx_merge_update, tx_delete_where, tx_pruned_scan,
   tx_stream_drain_steady), min-of-3 per variant, so the artifact
   shows whether the log-layer deltas are visible end-to-end.

Variants:

  r10           : the shipped code -- parsed-entry cache, publish
                  seeding, incremental state fold, all r9 guards on.
  no_cache      : r10 with the caches NEUTRALIZED (every entry read
                  re-parses; every state fold restarts from the
                  newest checkpoint) -- the r9 code's cost model.
  no_guards     : no_cache with the r9 commit-point guards stubbed
                  (schema-advance no-op, colmap lookup empty, rebase
                  returns immediately) -- approximately the r8 cost
                  model.

If no_cache ~= r10 at this SF the r9 drift was host heat; a real gap
is the feature-parse overhead the cache reclaims.  Writes
BENCH_COMMIT_AB.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from contextlib import contextmanager

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nyc_crash_mapper_etl_script_spark.sources.txtable import TxTable

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_COMMIT_AB.json")


@contextmanager
def _variant(name: str):
    """Monkeypatch TxTable into the named cost model; restore after."""
    saved = {}

    def patch(attr, fn):
        saved[attr] = getattr(TxTable, attr)
        setattr(TxTable, attr, fn)

    if name in ("no_cache", "no_guards"):
        orig_read = TxTable._read_entry
        orig_state = TxTable._state

        def uncached_read(self, n):
            self._entry_cache.pop(n, None)
            return orig_read(self, n)

        def uncached_state(self, version=None):
            self._state_cache.clear()
            return orig_state(self, version)

        patch("_read_entry", uncached_read)
        patch("_state", uncached_state)
    if name == "no_guards":
        patch("_assert_schema_advances", lambda self, *a, **k: None)
        patch("_column_map", lambda self, version=None: {})
        patch(
            "_rebase",
            lambda self, entry, base_version, head, read_scope: head,
        )
    try:
        yield
    finally:
        for attr, fn in saved.items():
            setattr(TxTable, attr, fn)


def _blank() -> dict:
    return {"op": "append", "add": [], "remove": [], "staged": {}}


def log_layer() -> dict:
    out: dict[str, dict] = {}
    for name in ("r10", "no_cache", "no_guards"):
        base = tempfile.mkdtemp(prefix="ab_commit_")
        try:
            t = TxTable(os.path.join(base, "t"), checkpoint_every=10)
            os.makedirs(t._log_dir(), exist_ok=True)
            # a realistic entry: schema + stats ride every commit
            schema = json.dumps(
                {
                    "type": "struct",
                    "fields": [
                        {"name": f"c{i}", "type": "long", "nullable": True,
                         "metadata": {}}
                        for i in range(8)
                    ],
                }
            )
            for i in range(300):
                e = _blank()
                e["schema"] = schema
                v = t._publish(e)
                t._maybe_checkpoint(v)
            with _variant(name):
                commit = []
                for _ in range(50):
                    e = _blank()
                    e["schema"] = schema
                    t0 = time.perf_counter()
                    v = t._publish(e)
                    t._state(v)
                    commit.append(time.perf_counter() - t0)
                fold = []
                for _ in range(20):
                    h = TxTable(os.path.join(base, "t"))
                    t0 = time.perf_counter()
                    h._state()
                    fold.append(time.perf_counter() - t0)
                walk = []
                t._state()  # warm the walker's caches where the variant allows
                for _ in range(20):
                    t0 = time.perf_counter()
                    t._rebase(_blank(), t._snapshot_version() - 30,
                              t._snapshot_version(), "files")
                    walk.append(time.perf_counter() - t0)
            out[name] = {
                "no_winner_commit_ms": round(min(commit) * 1e3, 3),
                "cold_head_fold_ms": round(min(fold) * 1e3, 3),
                "rebase_walk_30_ms": round(min(walk) * 1e3, 3),
            }
        finally:
            shutil.rmtree(base, ignore_errors=True)
    return out


def spark_paths(reps: int = 3) -> dict:
    from pyspark.sql import functions as F

    from nyc_crash_mapper_etl_script_spark.schemas import load_table
    from nyc_crash_mapper_etl_script_spark.session import get_spark
    from nyc_crash_mapper_etl_script_spark.sources.txstream import (
        CHANGE_COL,
        read_txtable_stream,
    )
    from nyc_crash_mapper_etl_script_spark.streaming.sizing import (
        state_partitions,
    )

    spark = get_spark()
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice"
    )
    upd = orders.where(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey", (F.col("o_totalprice") * 2).alias("o_totalprice")
    )
    lo, hi = "1994-01-01", "1994-12-31"
    out: dict[str, dict] = {}
    # NOTE the stream planner runs in a SEPARATE python worker
    # process: the _variant monkeypatches do NOT reach it, so the
    # drain row's variant split is driver-side only (commit path of
    # the producing table).  The per-process caches DO apply inside
    # the planner for the r10 variant because the planner reuses one
    # handle (txstream._table); the no-cache variants therefore
    # under-state the r10 win on the drain row.
    for name in ("r10", "no_cache", "no_guards"):
        samples: dict[str, list[float]] = {}

        def rec(row, fn):
            t0 = time.time()
            fn()
            samples.setdefault(row, []).append(time.time() - t0)

        for _ in range(reps):
            base = tempfile.mkdtemp(prefix="ab_commit_spark_")
            try:
                with _variant(name):
                    t = TxTable(
                        os.path.join(base, "orders_tx"),
                        partition_by=["o_orderstatus"],
                        retain_history=True,
                    )
                    t.init(orders)
                    rec(
                        "tx_merge_update",
                        lambda: t.merge_update(
                            upd, "o_orderkey", set_cols=["o_totalprice"]
                        ),
                    )
                    rec(
                        "tx_delete_where",
                        lambda: t.delete_where(
                            spark, F.col("o_orderkey") % 97 == 0
                        ),
                    )
                    rec(
                        "tx_pruned_scan",
                        lambda: t.read_pruned(spark, "o_orderdate", lo, hi)
                        .write.format("noop")
                        .mode("overwrite")
                        .save(),
                    )
                    feed = TxTable(os.path.join(base, "orders_feed"))
                    feed.init(orders.where(F.col("o_orderkey") % 8 == 0))
                    for i in range(1, 8):
                        feed.append(
                            orders.where(F.col("o_orderkey") % 8 == i)
                        )

                    def drain_steady():
                        ck = os.path.join(base, "feed_ck")
                        with state_partitions(spark, 8):
                            q = (
                                read_txtable_stream(
                                    spark,
                                    feed.root,
                                    max_versions_per_batch=1,
                                    columns=["o_orderstatus"],
                                )
                                .groupBy("o_orderstatus", CHANGE_COL)
                                .agg(F.count("*").alias("rows"))
                                .writeStream.format("noop")
                                .outputMode("complete")
                                .option("checkpointLocation", ck)
                                .start()
                            )
                            q.processAllAvailable()
                            q.stop()
                            q.awaitTermination(300)
                        shutil.rmtree(ck, ignore_errors=True)

                    rec("tx_stream_drain_steady", drain_steady)
            finally:
                shutil.rmtree(base, ignore_errors=True)
        out[name] = {k: round(min(v), 3) for k, v in samples.items()}
    return out


if __name__ == "__main__":
    result = {
        "sf_dir": SF_DIR,
        "log_layer": log_layer(),
        "spark_paths": spark_paths(),
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result, indent=2))
