"""The reference nightly as a CONTINUOUS incremental pipeline.

``plans/nightly.py`` reproduces the reference main() as one batch DAG
(cron-shaped, like the original).  This module is the streaming
promotion of the same semantics: a Structured Streaming query whose
every micro-batch performs the full ingest->dedup->enrich->blame->
reconcile->rollup cycle INCREMENTALLY against transactional state --
what the reference would be if it were built stream-first instead of
as an hours-long nightly batch (SURVEY §2.9; main.py:1132-1200).

Per micro-batch (foreachBatch -- the sink owns multi-action
transactional logic):

1. in-batch dedup + anti-join against the month-partitioned fact
   TxTable -> the INSERT set (reference main.py:85-132 semantics);
2. the insert set alone is enriched: serial ids continue from the
   table's max key, extent sanity filter, district point-in-polygon
   linkage, vehicle flags + blame allocation folded into one pass --
   O(batch) work, never a table rewrite;
3. enriched inserts APPEND (blind, multi-writer-safe);
4. already-present keys are the UPDATE set: tally mismatches merge
   into only the touched month partitions (C2);
5. the intersection crashcount rollup (the reference's ~10-min
   materialized view rebuild) is maintained INCREMENTALLY: the
   insert set's circle matches delta-refresh a grouped-count MV
   TxTable via ``refresh_additive_mv`` -- O(batch) against O(table).

Updates are handled EXACTLY, not approximately: step 4's tally merge
also feeds the rollup a signed delta (retract the old rows' circle
matches, insert the repaired rows' -- ``operators.mv.
refresh_signed_mv``), so membership-changing updates (a crash whose
injured count flips between 0 and >0) keep the view equal to a full
recompute with O(updated rows) work.  :func:`rebuild_rollup` remains
as the belt-and-braces periodic repair (the reference's own answer),
no longer required for correctness.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from nyc_crash_mapper_etl_script_spark.operators.blame import allocate_blame
from nyc_crash_mapper_etl_script_spark.operators.dedup_merge import new_rows
from nyc_crash_mapper_etl_script_spark.operators.enrichment import (
    filter_to_extent,
    intersection_crash_counts,
    link_districts,
    vehicle_flag_exprs,
)
from nyc_crash_mapper_etl_script_spark.operators.ingest import normalize_soda_feed
from nyc_crash_mapper_etl_script_spark.operators.mv import refresh_additive_mv
from nyc_crash_mapper_etl_script_spark.operators.reconcile import (
    apply_tally_updates,
    tally_mismatches,
)
from nyc_crash_mapper_etl_script_spark.plans.nightly import assign_serial_ids
from nyc_crash_mapper_etl_script_spark.schemas import SODA_FEED_SCHEMA
from nyc_crash_mapper_etl_script_spark.sources.txtable import TxTable


def _enrich(fresh: DataFrame, existing: DataFrame, districts, crosswalk) -> DataFrame:
    """The batch enrichment stack applied to an increment only."""
    fresh = assign_serial_ids(fresh, existing)
    fresh = filter_to_extent(fresh, districts)
    fresh = link_districts(fresh, districts)
    return allocate_blame(fresh, extra_cols=vehicle_flag_exprs(fresh, crosswalk))


def continuous_nightly(
    spark: SparkSession,
    feed_dir: str,
    table_path: str,
    rollup_path: str,
    checkpoint_dir: str,
    districts: DataFrame,
    intersections: DataFrame,
    crosswalk: DataFrame,
    trigger_available_now: bool = True,
    coupled_rollup: bool = True,
) -> StreamingQuery:
    """Start the continuous nightly; returns the query handle.

    State lives in two TxTables: the month-partitioned enriched fact
    table at ``table_path`` and the (cartodb_id, howmany) rollup at
    ``rollup_path``.  ``trigger_available_now=True`` drains the feed
    dir then stops (cron-equivalent, restart-safe); False runs
    continuous micro-batches.

    ``coupled_rollup=False`` turns OFF the in-sink rollup
    maintenance and writes the fact table with
    ``retain_history=True`` instead: the rollup then belongs to a
    SEPARATE stream chained off the fact table's commit log
    (:func:`continuous_nightly_chained`), which is the decoupled
    form -- the ingest writer and any number of downstream consumers
    restart independently, the commit log is the only contract."""
    raw = spark.readStream.schema(SODA_FEED_SCHEMA).json(feed_dir)
    normalized = normalize_soda_feed(raw)

    def sink(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        batch = batch.dropDuplicates(["socrata_id"]).withColumn(
            "__ym", F.concat_ws("-", "year", "month")
        ).localCheckpoint()
        tx = TxTable(
            table_path,
            partition_by=["__ym"],
            retain_history=not coupled_rollup,
        )
        if tx.exists():
            existing = tx.read(s)
            fresh = new_rows(batch, existing, "socrata_id")
        else:
            # bootstrap: no table yet -> everything is fresh; serial
            # ids start from 0 (the empty frame needs the key column
            # for assign_serial_ids' max-key probe)
            existing = batch.where("1=0").withColumn(
                "cartodb_id", F.lit(None).cast("long")
            )
            fresh = batch
        # enrich ONLY the increment; pin before any table mutation
        enriched = _enrich(fresh, existing, districts, crosswalk).localCheckpoint()
        if enriched.count():
            if tx.exists():
                tx.append(enriched)
            else:
                tx.init(enriched)
            if coupled_rollup:  # else the chained stream owns the view
                _maintain_rollup_inline(
                    s, rollup_path, enriched, intersections
                )
        # update set: tally reconcile into touched months only (C2)
        if tx.exists():
            updated = batch.join(
                fresh.select("socrata_id"), "socrata_id", "left_anti"
            ).localCheckpoint()
            if updated.limit(1).count():
                merged = tx.read(s)
                mismatches = tally_mismatches(updated, merged, "socrata_id")
                if mismatches.limit(1).count():
                    to_fix = merged.join(
                        mismatches.select("socrata_id"), "socrata_id", "left_semi"
                    ).localCheckpoint()
                    repaired = apply_tally_updates(
                        to_fix, mismatches, "socrata_id"
                    ).localCheckpoint()
                    tx.merge(repaired, "socrata_id")
                    if coupled_rollup:
                        # SIGNED rollup repair: retraction of the old
                        # rows + insertion of the repaired ones keeps
                        # the view exact under membership-changing
                        # updates (refresh_signed_mv)
                        _signed_rollup_repair(s, rollup_path, to_fix,
                                              repaired, intersections)

    writer = normalized.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _maintain_rollup_inline(s, rollup_path, enriched, intersections):
    """The coupled per-batch rollup refresh (insert path)."""
    delta_counts = intersection_crash_counts(
        enriched, intersections, months_window=None
    )
    # refresh_additive_mv combines RAW delta rows; the circle join
    # already aggregated, so reuse the matched pairs at delta grain
    mv = TxTable(rollup_path)
    if mv.exists():
        cur = mv.read(s)
        fused = refresh_additive_mv(
            cur,
            _circle_matches(enriched, intersections),
            group_cols=["cartodb_id"],
            count_col="howmany",
        ).localCheckpoint()
        mv.merge(fused, "cartodb_id")
    else:
        mv.init(delta_counts.localCheckpoint())


def _signed_rollup_repair(
    spark: SparkSession,
    rollup_path: str,
    old_rows: DataFrame,
    new_rows_df: DataFrame,
    intersections: DataFrame,
) -> None:
    """Adjust the rollup for an UPDATE: retract the old rows' circle
    matches, insert the new rows' -- counts-only refresh_signed_mv,
    O(updated rows).  Touched circles whose count reaches zero are
    deleted from the rollup table."""
    from pyspark.sql import functions as FF

    from nyc_crash_mapper_etl_script_spark.operators.mv import refresh_signed_mv

    mv = TxTable(rollup_path)
    if not mv.exists():
        return
    dels = _circle_matches(old_rows, intersections).localCheckpoint()
    ins = _circle_matches(new_rows_df, intersections).localCheckpoint()
    if not dels.limit(1).count() and not ins.limit(1).count():
        return
    cur = mv.read(spark)
    fused = refresh_signed_mv(
        cur, ins, dels, ["cartodb_id"], count_col="howmany"
    ).localCheckpoint()
    mv.merge(fused, "cartodb_id")
    touched = dels.unionByName(ins).select("cartodb_id").distinct()
    gone = (
        touched.join(fused.select("cartodb_id"), "cartodb_id", "left_anti")
        .join(mv.read(spark).select("cartodb_id"), "cartodb_id", "left_semi")
        .localCheckpoint()
    )
    if gone.limit(1).count():
        mv.delete(gone.select(FF.col("cartodb_id")), "cartodb_id")


def _circle_matches(crashes: DataFrame, intersections: DataFrame) -> DataFrame:
    """(crash, circle) match rows -- the raw delta grain
    ``refresh_additive_mv`` aggregates per cartodb_id."""
    from nyc_crash_mapper_etl_script_spark.operators.spatial_join import (
        points_in_circles,
    )

    filtered = crashes.where(
        (F.col("number_of_persons_injured") > 0)
        | (F.col("number_of_persons_killed") > 0)
    ).where(F.col("the_geom").isNotNull())
    circles = intersections.select(
        F.col("cartodb_id").alias("__i_id"),
        F.col("the_geom.center").alias("center"),
        F.col("the_geom.radius_m").alias("radius_m"),
    )
    joined = points_in_circles(filtered.select("the_geom"), circles, how="inner")
    return joined.select(F.col("g.__i_id").alias("cartodb_id"))


def rebuild_rollup(
    spark: SparkSession,
    table_path: str,
    rollup_path: str,
    intersections: DataFrame,
) -> None:
    """Periodic full recompute of the rollup (the reference's nightly
    MV rebuild): repairs drift from membership-changing UPDATES that
    the insert-only incremental path cannot see."""
    tx = TxTable(table_path, partition_by=["__ym"])
    counts = intersection_crash_counts(
        tx.read(spark), intersections, months_window=None
    ).localCheckpoint()
    mv = TxTable(rollup_path)
    if mv.exists():
        # full-state replace: merge on the key set union
        mv.merge(counts, "cartodb_id")
        stale = mv.read(spark).join(
            counts.select("cartodb_id"), "cartodb_id", "left_anti"
        )
        if stale.limit(1).count():
            mv.delete(stale.select("cartodb_id"), "cartodb_id")
    else:
        mv.init(counts)


def chain_rollup_stream(
    spark: SparkSession,
    fact: TxTable,
    rollup: TxTable,
    group_cols: list[str],
    checkpoint_dir: str,
    count_col: str = "n",
    sum_cols: dict[str, str] | None = None,
    starting_version: int = 0,
    trigger_available_now: bool = True,
    transform=None,
    max_versions_per_batch: int | None = None,
    max_bytes_per_batch: int | None = None,
    columns: "list[str] | None" = None,
) -> StreamingQuery:
    """TABLE-TO-TABLE chaining (r3 VERDICT item 2): a downstream
    pipeline consumes an upstream TxTable's commit log through the
    streaming source (``sources/txstream.py`` -- commit versions as
    offsets) and maintains a derived rollup TxTable with signed-delta
    MV refresh.  This is the Spark-native form of the reference's
    chained nightly stages, each consuming the previous stage's
    committed state (main.py:1132-1200) -- except the downstream
    keeps its own offset in the streaming checkpoint, so an upstream
    writer and any number of downstream consumers are fully
    decoupled (restart either side independently; the log is the
    contract).

    Per micro-batch: the change feed splits into inserts/deletes,
    ``refresh_signed_mv`` folds them into the current rollup (exact
    under updates AND under the feed's rewrite noise -- equal-value
    +/- pairs cancel in signed arithmetic), and the result replaces
    the rollup table in one atomic ``overwrite`` commit.  Work per
    batch is O(changed files) + O(rollup dimension), never O(fact
    table).

    Exactly-once: the sink is BATCH-ID-AWARE (Delta's
    ``txnAppId``/``txnVersion`` idempotent-writes pattern).  Each
    rollup commit records ``(app_id, batch_id)``; when Spark replays
    a micro-batch after a crash that landed BETWEEN the rollup
    commit and the streaming checkpoint's commit, the sink sees
    ``batch_id <= last_txn_version`` and no-ops instead of folding
    the same signed deltas twice.  The app_id is derived from the
    checkpoint location, so independent queries over the same rollup
    track their own positions.

    Without a ``transform`` the feed is auto-projected at the source
    to exactly the group keys + sum sources (the txtable-changes
    ``columns`` option); with one, pass ``columns`` to prune to what
    the transform reads.

    No auto-compaction knob here, deliberately: a signed-MV rollup
    refreshed by ``overwrite`` is file-bounded by construction (every
    commit replaces the whole file set), so ``compact_if_due``'s
    commits-since-rewrite counter would reset each batch and the
    policy could never fire -- the knob belongs to the APPEND-based
    pipelines (``corpus_prep_stream``, ``semantic_dedup_stream``)."""
    from nyc_crash_mapper_etl_script_spark.operators.mv import (
        refresh_signed_mv,
        signed_mv_init,
    )
    from nyc_crash_mapper_etl_script_spark.sources.txstream import (
        CHANGE_COL,
        read_txtable_stream,
    )

    app_id = f"chain_rollup:{os.path.abspath(checkpoint_dir)}"

    def sink(batch: DataFrame, batch_id: int) -> None:
        last = rollup.last_txn_version(app_id) if rollup.exists() else None
        if last is not None and batch_id <= last:
            return  # replayed micro-batch: deltas already folded
        if transform is not None:
            # derive the rollup's input rows from the raw change feed
            # (e.g. a spatial circle-match join); the transform MUST
            # carry _change_type through so retractions stay signed
            batch = transform(batch)
        ins = batch.where(F.col(CHANGE_COL) == "insert")
        dels = batch.where(F.col(CHANGE_COL) == "delete")
        cur = (
            rollup.read(spark)
            if rollup.exists()
            else signed_mv_init(ins.limit(0), group_cols, count_col, sum_cols)
        )
        nxt = refresh_signed_mv(
            cur, ins, dels, group_cols, count_col=count_col, sum_cols=sum_cols
        )
        if rollup.exists():
            rollup.overwrite(nxt, app_txn=(app_id, batch_id))
        else:
            rollup.init(nxt, app_txn=(app_id, batch_id))

    if columns is None and transform is None:
        # the rollup's plan is fully known here: project exactly the
        # group keys + sum sources at the SOURCE (r6 columns option),
        # so parquet I/O and Arrow transport never ship the rest of
        # the fact row.  A transform sees the raw feed, so its column
        # needs are its own: pass `columns` explicitly to prune.
        columns = list(
            dict.fromkeys(list(group_cols) + list((sum_cols or {}).values()))
        )
    writer = (
        read_txtable_stream(
            spark,
            fact.root,
            starting_version,
            max_versions_per_batch=max_versions_per_batch,
            max_bytes_per_batch=max_bytes_per_batch,
            columns=columns,
        )
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def continuous_nightly_chained(
    spark: SparkSession,
    feed_dir: str,
    table_path: str,
    rollup_path: str,
    checkpoint_dir: str,
    districts: DataFrame,
    intersections: DataFrame,
    crosswalk: DataFrame,
) -> tuple[StreamingQuery, "callable"]:
    """The DECOUPLED nightly: ingest and rollup as two chained
    streams instead of one foreachBatch doing both.

    Stream 1 (returned query): feed -> enriched fact TxTable ONLY
    (``coupled_rollup=False``; the table retains history so its
    change feed stays readable).  Stream 2 (returned thunk; call it
    after -- or concurrently with -- stream 1): the fact table's
    commit log -> per-circle signed rollup via
    :func:`chain_rollup_stream`, with the spatial circle-match join
    applied to the change feed as the transform (``_change_type``
    rides through the join, so an update's retraction decrements the
    old circles and the repaired row increments the new ones -- the
    same exactness contract as the coupled form, now across a
    process boundary).  Either side restarts independently from its
    own checkpoint; the commit log is the only coupling.
    """
    q_ingest = continuous_nightly(
        spark,
        feed_dir,
        table_path,
        rollup_path,
        checkpoint_dir + "/ingest",
        districts,
        intersections,
        crosswalk,
        trigger_available_now=True,
        coupled_rollup=False,
    )

    from nyc_crash_mapper_etl_script_spark.sources.txstream import CHANGE_COL

    def circle_transform(batch: DataFrame) -> DataFrame:
        from nyc_crash_mapper_etl_script_spark.operators.spatial_join import (
            points_in_circles,
        )

        filtered = batch.where(
            (F.col("number_of_persons_injured") > 0)
            | (F.col("number_of_persons_killed") > 0)
        ).where(F.col("the_geom").isNotNull())
        circles = intersections.select(
            F.col("cartodb_id").alias("__i_id"),
            F.col("the_geom.center").alias("center"),
            F.col("the_geom.radius_m").alias("radius_m"),
        )
        joined = points_in_circles(
            filtered.select("the_geom", CHANGE_COL), circles, how="inner"
        )
        return joined.select(
            F.col("g.__i_id").alias("cartodb_id"),
            F.col(f"p.{CHANGE_COL}").alias(CHANGE_COL),
        )

    def start_rollup_stream() -> StreamingQuery:
        return chain_rollup_stream(
            spark,
            TxTable(table_path, partition_by=["__ym"], retain_history=True),
            TxTable(rollup_path),
            ["cartodb_id"],
            checkpoint_dir + "/rollup",
            count_col="howmany",
            transform=circle_transform,
        )

    return q_ingest, start_rollup_stream
