"""Steady-state change-feed cost (r6 VERDICT item 5): what does a
LONG-RUNNING consumer pay PER MICRO-BATCH, once the ~1.5 s per-query
bootstrap (BENCH_STREAM_FLOOR.json) is amortized away?

Method: one paced query per variant (maxVersionsPerBatch=1, default
trigger + processAllAvailable -- availableNow cannot pace, its
fallback coalesces the backlog into a single batch), over the SAME
total rows split into N commits.  Timing two backlog sizes per
variant and taking the MARGINAL cost

    per_batch = (t_16_commits - t_8_commits) / 8

cancels the query bootstrap exactly -- no cross-trigger-mode floor
subtraction, both terms carry the identical one-time cost.  Variants:

  rollup    : the bench's consumer shape (complete-mode stateful
              rollup) at the session's 32 shuffle partitions.
  rollup4   : the same rollup with state sized to the feed
              (4 shuffle partitions) -- the consumer-side tuning a
              real small-feed subscriber applies; the delta vs
              `rollup` is pure state-store file churn (32 state
              files written per batch vs 4).
  passthru  : stateless append-mode pass-through -- the floor of the
              paced source itself (planner round-trips + offset/commit
              WAL + one-file Arrow read per batch).

Writes BENCH_STREAM_STEADY.json.  Finding (2026-08, this box, sf0.1):
per-batch marginal 0.78 s for the 32-partition stateful rollup,
0.37 s with feed-sized state (4 partitions: the delta is pure
state-store file churn, one commit per partition per batch), 0.28 s
stateless -- 2-5x under the one-shot drain's ~1.5 s bootstrap and
its ~2.5 s total, i.e. the floor genuinely amortizes; see
``tx_stream_drain_steady`` in bench.py for the driver-visible row
(which applies the rollup4-style sizing via
``streaming.sizing.state_partitions``).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.schemas import load_table
from nyc_crash_mapper_etl_script_spark.session import get_spark
from nyc_crash_mapper_etl_script_spark.sources.txstream import (
    CHANGE_COL,
    read_txtable_stream,
)
from nyc_crash_mapper_etl_script_spark.sources.txtable import TxTable


def _feed(spark, orders, base: str, n_commits: int) -> TxTable:
    t = TxTable(os.path.join(base, f"feed_{n_commits}"))
    t.init(orders.where(F.col("o_orderkey") % n_commits == 0))
    for i in range(1, n_commits):
        t.append(orders.where(F.col("o_orderkey") % n_commits == i))
    return t


def _run(spark, feed: TxTable, base: str, variant: str, n_commits: int) -> float:
    from contextlib import nullcontext

    from nyc_crash_mapper_etl_script_spark.streaming.sizing import (
        state_partitions,
    )

    ck = tempfile.mkdtemp(prefix="ck_", dir=base)
    sized = (
        state_partitions(spark, 4) if variant == "rollup4" else nullcontext()
    )
    with sized:
        src = read_txtable_stream(
            spark, feed.root, max_versions_per_batch=1,
            columns=["o_orderstatus"],
        )
        if variant == "passthru":
            w = src.writeStream.format("noop")
        else:
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
    assert n == n_commits, f"{variant}/{n_commits}: ran {n} batches"
    shutil.rmtree(ck, ignore_errors=True)
    return dt


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    spark = get_spark("ab-stream-steady")
    base = tempfile.mkdtemp(prefix="absteady_")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    feeds = {n: _feed(spark, orders, base, n) for n in (8, 16)}
    variants = ("rollup", "rollup4", "passthru")
    for v in variants:  # warm pass: JIT, planner process, state store
        _run(spark, feeds[8], base, v, 8)
    samples: dict[str, dict[str, list[float]]] = {}
    for v in variants:
        for n, feed in feeds.items():
            key = f"{v}_{n}c"
            samples.setdefault(v, {})[str(n)] = [
                round(_run(spark, feed, base, v, n), 3) for _ in range(reps)
            ]
    mins = {
        v: {n: min(ts) for n, ts in by_n.items()} for v, by_n in samples.items()
    }
    per_batch = {
        v: round((m["16"] - m["8"]) / 8, 3) for v, m in mins.items()
    }
    doc = {
        "sf_dir": sf_dir,
        "reps": reps,
        "samples": samples,
        "min": mins,
        "per_batch_marginal": per_batch,
        "note": (
            "per_batch_marginal = (min t at 16 commits - min t at 8) / 8: "
            "the bootstrap cancels exactly (same query shape both terms). "
            "Same total rows per feed regardless of commit count, so the "
            "marginal is pure per-batch overhead + per-batch state commit."
        ),
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_STREAM_STEADY.json",
    )
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"min": mins, "per_batch_marginal": per_batch}))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
