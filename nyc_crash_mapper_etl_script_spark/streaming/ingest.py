"""Streaming ingest (reference §2.9 C4): the nightly "fetch trailing
window, insert what's new" loop as a Structured Streaming job.

The reference emulates a stream with cron + a 2-month lookback window
+ a dedup anti-join (main.py:29, 85-132).  The native form:

    readStream(feed dir, SODA schema)
      -> normalize (same codegen pass as batch -- ONE code path)
      -> foreachBatch: in-batch dropDuplicates
                       + anti-join merge vs the on-disk table
                       + reconcile path for already-present keys

Exactly-once comes from the sink's idempotent anti-join merge (a
replayed micro-batch appends 0 rows), NOT from stream-level
``dropDuplicatesWithinWatermark`` -- that would swallow replayed keys
in state *before* the sink sees them, making the late-update
reconcile path (C2/C3) unreachable.  The target is a
:class:`~..sources.txtable.TxTable` (month-partitioned, log-committed):
inserts append files, tally repairs merge only the touched months, and
a crash at any point inside the sink leaves either the previous or the
next committed version -- never a half-written table.  Rows whose socrata_id already
exists are exactly the updates: they flow to tally reconciliation
inside the same foreachBatch (merge-vs-update classification is one
anti-join).  Stream-level keyed state is showcased where it is the
right tool: streaming/stateful.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from nyc_crash_mapper_etl_script_spark.operators.ingest import normalize_soda_feed
from nyc_crash_mapper_etl_script_spark.operators.reconcile import (
    apply_tally_updates,
    tally_mismatches,
)
from nyc_crash_mapper_etl_script_spark.schemas import SODA_FEED_SCHEMA


def stream_ingest(
    spark: SparkSession,
    feed_dir: str,
    target_path: str,
    checkpoint_dir: str,
    reconcile_tallies: bool = True,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Start the streaming ingest; returns the query handle.

    ``trigger_available_now=True`` drains what's on disk then stops --
    the exact cron-batch semantics of the reference, but restart-safe
    and incremental via the checkpoint.  Set False for a continuous
    micro-batch run."""
    from pyspark.sql import functions as F

    from nyc_crash_mapper_etl_script_spark.sources.txtable import TxTable

    raw = spark.readStream.schema(SODA_FEED_SCHEMA).json(feed_dir)
    normalized = normalize_soda_feed(raw)

    def sink(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        # year-month partitioning: inserts append into their own
        # months' dirs, and a tally repair is a TxTable.merge that
        # rewrites ONLY the months containing mismatched keys --
        # O(touched partitions), never O(table), with an atomic log
        # commit instead of the old rewrite-everything directory swap
        batch = batch.dropDuplicates(["socrata_id"]).withColumn(
            "__ym", F.concat_ws("-", "year", "month")
        )
        tx = TxTable(target_path, partition_by=["__ym"])
        if not tx.exists():
            tx.init(batch)
            return
        from nyc_crash_mapper_etl_script_spark.operators.dedup_merge import new_rows

        existing = tx.read(s)
        # localCheckpoint pins the insert/update split BEFORE any
        # write: both sides are micro-batch sized, and without it the
        # lazy anti-join would re-evaluate against the just-appended
        # table (fresh would turn empty mid-sink)
        fresh = new_rows(batch, existing, "socrata_id").localCheckpoint()
        if fresh.count():
            tx.append(fresh)
        if reconcile_tallies:
            # updated rows (key already present): C2 tally reconcile
            updated = batch.join(fresh, "socrata_id", "left_anti").localCheckpoint()
            merged = tx.read(s)
            mismatches = tally_mismatches(updated, merged, "socrata_id")
            if mismatches.limit(1).count():
                # repaired ROWS, not a repaired table: current rows for
                # the mismatched keys with fresh tallies spliced in;
                # the merge rewrites just their partitions
                to_fix = merged.join(
                    mismatches.select("socrata_id"), "socrata_id", "left_semi"
                )
                repaired = apply_tally_updates(to_fix, mismatches, "socrata_id")
                tx.merge(repaired, "socrata_id")

    writer = normalized.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
