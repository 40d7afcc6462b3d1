"""Subprocess worker for the two-session TxTable concurrency test.

Runs in its OWN python process with its OWN SparkSession (separate
JVM), so the O_EXCL hard-link commit is exercised across real process
boundaries -- no shared in-memory state with the peer.

Protocol: the first merge's snapshot waits (bounded) at a filesystem
barrier until the peer has ALSO taken its first snapshot, so both
stage against the same base version and exactly one publish can win
-- a guaranteed, not probabilistic, conflict.  Losers retry the whole
merge against fresh state (the documented ConcurrentWriteError
contract).  Appends are blind and never conflict.

Usage: txtable_race_worker.py <table_root> <barrier_dir> <worker_id>
       <peer_id> <out_json> [mode]

``mode="merge"`` (default): racing merges + blind appends.
``mode="update"``: racing merge_update rounds on each worker's key
half, then a racing delete_where on each worker's own tombstone
range -- the round-4 RMW ops under real cross-JVM contention.
``mode="overwrite"``: racing whole-table overwrites (last committed
writer's content must be the final state -- the parent test checks
the max-version winner's signature).
``mode="restore"``: worker a races restore(1) against worker b's
blind appends; the parent reconstructs which appends survive from
the version order.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from nyc_crash_mapper_etl_script_spark.sources.txtable import (  # noqa: E402
    ConcurrentWriteError,
    TxTable,
)

N_MERGES = 3
N_APPENDS = 2


class BarrierTable(TxTable):
    """TxTable whose FIRST snapshot rendezvouses with the peer worker
    so both transactions provably race on one base version."""

    def __init__(self, root: str, barrier_dir: str, wid: str, peer: str):
        # TX_LOG_STORE=fake drives the whole cross-JVM race through
        # the object-store-semantics backend (conditional PUT, no
        # links, copy+delete moves) instead of the POSIX link CAS
        store = None
        if os.environ.get("TX_LOG_STORE") == "fake":
            from nyc_crash_mapper_etl_script_spark.sources.logstore import (
                FakeObjectStore,
            )

            store = FakeObjectStore()
        super().__init__(root, log_store=store)
        self._barrier_dir = barrier_dir
        self._wid = wid
        self._peer = peer
        self._snapshots = 0

    def _snapshot_version(self) -> int:
        v = super()._snapshot_version()
        self._snapshots += 1
        if self._snapshots == 1:
            mine = os.path.join(self._barrier_dir, f"snap_{self._wid}")
            with open(mine, "w"):
                pass
            deadline = time.time() + 300
            peer_flag = os.path.join(self._barrier_dir, f"snap_{self._peer}")
            while not os.path.exists(peer_flag) and time.time() < deadline:
                time.sleep(0.05)
        return v


def main() -> None:
    root, barrier_dir, wid, peer, out_json = sys.argv[1:6]
    mode = sys.argv[6] if len(sys.argv) > 6 else "merge"
    spark = (
        SparkSession.builder.appName(f"txrace-{wid}")
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    table = BarrierTable(root, barrier_dir, wid, peer)
    lo = 0 if wid == "a" else 1000
    committed: list[int] = []
    conflicts = 0

    if mode == "restore":
        if wid == "b":
            # blind appends never take a snapshot, so signal the
            # barrier explicitly or the peer waits out its deadline
            with open(os.path.join(barrier_dir, f"snap_{wid}"), "w"):
                pass
        if wid == "a":
            for i in range(3):
                while True:
                    try:
                        committed.append(BarrierTable.restore(table, 1))
                        break
                    except ConcurrentWriteError:
                        conflicts += 1
        else:
            for i in range(3):
                df = spark.createDataFrame(
                    [(7000 + i, f"app-{i}")], "k long, v string"
                )
                committed.append(table.append(df))
        with open(out_json, "w") as fh:
            json.dump(
                {"worker": wid, "committed": committed, "conflicts": conflicts},
                fh,
            )
        spark.stop()
        return

    if mode == "overwrite":
        for i in range(1, 3):
            df = spark.createDataFrame(
                [(j, f"ow-{wid}-{i}") for j in range(10)], "k long, v string"
            )
            while True:
                try:
                    committed.append(table.overwrite(df))
                    break
                except ConcurrentWriteError:
                    conflicts += 1
        with open(out_json, "w") as fh:
            json.dump(
                {"worker": wid, "committed": committed, "conflicts": conflicts},
                fh,
            )
        spark.stop()
        return

    if mode == "update":
        from pyspark.sql import functions as F

        for i in range(1, N_MERGES + 1):
            src = spark.createDataFrame(
                [(lo + j, f"{wid}-{i}") for j in range(20)], "k long, v string"
            )
            while True:
                try:
                    committed.append(
                        table.merge_update(src, "k", set_cols=["v"])
                    )
                    break
                except ConcurrentWriteError:
                    conflicts += 1
        tomb_lo = 8000 + (0 if wid == "a" else 100)
        while True:
            try:
                committed.append(
                    table.delete_where(
                        spark, F.col("k").between(tomb_lo, tomb_lo + 4)
                    )
                )
                break
            except ConcurrentWriteError:
                conflicts += 1
        with open(out_json, "w") as fh:
            json.dump(
                {"worker": wid, "committed": committed, "conflicts": conflicts},
                fh,
            )
        spark.stop()
        return

    for i in range(1, N_MERGES + 1):
        # upsert this worker's key range with round number i
        src = spark.createDataFrame(
            [(lo + j, f"{wid}-{i}") for j in range(20)], "k long, v string"
        )
        while True:
            try:
                committed.append(table.merge(src, "k"))
                break
            except ConcurrentWriteError:
                conflicts += 1

    for i in range(N_APPENDS):
        df = spark.createDataFrame(
            [(5000 + (0 if wid == "a" else 100) + i, f"app-{wid}-{i}")],
            "k long, v string",
        )
        committed.append(table.append(df))

    with open(out_json, "w") as fh:
        json.dump({"worker": wid, "committed": committed, "conflicts": conflicts}, fh)
    spark.stop()


if __name__ == "__main__":
    main()
