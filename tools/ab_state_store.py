"""State-store commit A/B for the steady drain (r8 VERDICT #6): the
one remaining cost in ``tx_stream_drain_steady`` that is not proven
floor is the per-batch state-store commit traffic of the 8-partition
complete-mode rollup (HDFS provider: one delta file per partition per
batch + periodic snapshots).  This tool measures the levers Spark
exposes, on the exact bench consumer shape:

  hdfs              : HDFSBackedStateStoreProvider, defaults
                      (minDeltasForSnapshot=10) -- the bench row's
                      current configuration.
  hdfs_snap100      : minDeltasForSnapshot=100 -- snapshot
                      consolidation deferred, so the maintenance
                      thread's snapshot writes mostly disappear from
                      a 16-batch window.
  rocksdb           : RocksDBStateStoreProvider (rocksdbjni ships in
                      this pyspark build), default checkpointing
                      (full snapshot per batch).
  rocksdb_changelog : RocksDB + changelogCheckpointing.enabled --
                      per-batch uploads are the changelog only,
                      Delta-style.

Method identical to tools/ab_stream_steady.py: one paced query per
variant (maxVersionsPerBatch=1; default trigger +
processAllAvailable), same total rows split into 8 vs 16 commits,
per_batch = (t16 - t8)/8 so the query bootstrap cancels exactly.
Also records the raw 8-commit total, because the driver-visible bench
row pays bootstrap + 8 batches -- a provider that wins on marginal
but loses on bootstrap can still lose the row.

State-partition count pinned to 8 (the bench row's sizing) in every
variant, so the A/B isolates the PROVIDER, not the partition count
(that lever is already measured in streaming/sizing.py).

Writes BENCH_STATE_AB.json.
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

from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.schemas import load_table
from nyc_crash_mapper_etl_script_spark.session import get_spark
from nyc_crash_mapper_etl_script_spark.sources.txstream import (
    CHANGE_COL,
    read_txtable_stream,
)
from nyc_crash_mapper_etl_script_spark.sources.txtable import TxTable
from nyc_crash_mapper_etl_script_spark.streaming.sizing import state_partitions

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_SNAP_KEY = "spark.sql.streaming.stateStore.minDeltasForSnapshot"
_CHANGELOG_KEY = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)

VARIANTS: dict[str, dict[str, str]] = {
    "hdfs": {},
    "hdfs_snap100": {_SNAP_KEY: "100"},
    "rocksdb": {_PROVIDER_KEY: _ROCKSDB},
    "rocksdb_changelog": {_PROVIDER_KEY: _ROCKSDB, _CHANGELOG_KEY: "true"},
}


@contextmanager
def _confs(spark, kv: dict[str, str]):
    prior = {}
    for k, v in kv.items():
        prior[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, p in prior.items():
            if p is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, p)


def _feed(spark, orders, base: str, n_commits: int) -> TxTable:
    t = TxTable(os.path.join(base, f"feed_{n_commits}"))
    t.init(orders.where(F.col("o_orderkey") % n_commits == 0))
    for i in range(1, n_commits):
        t.append(orders.where(F.col("o_orderkey") % n_commits == i))
    return t


def _run(spark, feed: TxTable, base: str, conf: dict, n_commits: int) -> float:
    ck = tempfile.mkdtemp(prefix="ck_", dir=base)
    with state_partitions(spark, 8), _confs(spark, conf):
        src = read_txtable_stream(
            spark,
            feed.root,
            max_versions_per_batch=1,
            columns=["o_orderstatus"],
        )
        w = (
            src.groupBy("o_orderstatus", CHANGE_COL)
            .agg(F.count("*").alias("rows"))
            .writeStream.format("noop")
            .outputMode("complete")
        )
        t0 = time.time()
        q = w.option("checkpointLocation", os.path.join(ck, "c")).start()
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(300)
        dt = time.time() - t0
    commits = os.path.join(ck, "c", "commits")
    n = len([c for c in os.listdir(commits) if not c.startswith(".")])
    assert n == n_commits, f"{conf}/{n_commits}: ran {n} batches"
    shutil.rmtree(ck, ignore_errors=True)
    return dt


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    spark = get_spark("ab-state-store")
    base = tempfile.mkdtemp(prefix="abstate_")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    feeds = {n: _feed(spark, orders, base, n) for n in (8, 16)}
    for v, conf in VARIANTS.items():  # warm pass: JIT, provider init
        _run(spark, feeds[8], base, conf, 8)
    samples: dict[str, dict[str, list[float]]] = {}
    for v, conf in VARIANTS.items():
        for n, feed in feeds.items():
            samples.setdefault(v, {})[str(n)] = [
                round(_run(spark, feed, base, conf, n), 3)
                for _ in range(reps)
            ]
    mins = {
        v: {n: min(ts) for n, ts in by_n.items()}
        for v, by_n in samples.items()
    }
    per_batch = {v: round((m["16"] - m["8"]) / 8, 3) for v, m in mins.items()}
    doc = {
        "sf_dir": sf_dir,
        "reps": reps,
        "state_partitions": 8,
        "variants": {v: conf for v, conf in VARIANTS.items()},
        "samples": samples,
        "min": mins,
        "per_batch_marginal": per_batch,
        "note": (
            "per_batch_marginal = (min t at 16 commits - min t at 8) / 8; "
            "bootstrap cancels exactly.  min['8'] is what the bench row "
            "tx_stream_drain_steady pays (bootstrap + 8 batches), so "
            "adoption requires winning THAT, not just the marginal."
        ),
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_STATE_AB.json",
    )
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"min": mins, "per_batch_marginal": per_batch}))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
