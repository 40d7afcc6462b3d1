"""TxTable streaming source (sources/txstream.py): readStream over
the commit log -- version offsets, file-level change replay, restart
recovery from the checkpointed offset, signed-rollup exactness."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.sources.txstream import (
    read_txtable_stream,
    stream_schema,
)
from nyc_crash_mapper_etl_script_spark.sources.txtable import TxTable


def _rows(spark, pairs):
    return spark.createDataFrame(
        [(k, v, ym) for k, v, ym in pairs], "k long, v string, ym string"
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"), partition_by=["ym"], retain_history=True)
    t.init(
        _rows(
            spark,
            [(1, "a", "2024-05"), (2, "b", "2024-05"), (3, "c", "2024-06")],
        )
    )
    return t


def _drain(spark, root, out, ckpt, starting_version=0):
    q = (
        read_txtable_stream(spark, root, starting_version)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_change_feed_contents(spark, table, tmp_path):
    """Init snapshot arrives as inserts; an append as inserts; a merge
    as the touched partition's delete+insert file replay (unchanged
    rewritten rows appear as an equal-value +/- pair)."""
    table.append(_rows(spark, [(4, "d", "2024-06")]))
    table.merge(_rows(spark, [(2, "B", "2024-05")]), "k")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, table.root, out, ckpt)
    got = sorted(
        (r["k"], r["v"], r["_change_type"], r["_commit_version"])
        for r in spark.read.parquet(out).collect()
    )
    assert got == [
        (1, "a", "delete", 3),
        (1, "a", "insert", 1),
        (1, "a", "insert", 3),
        (2, "B", "insert", 3),
        (2, "b", "delete", 3),
        (2, "b", "insert", 1),
        (3, "c", "insert", 1),
        (4, "d", "insert", 2),
    ]
    # partition column came back typed from the hive path
    assert {r["ym"] for r in spark.read.parquet(out).collect()} == {
        "2024-05",
        "2024-06",
    }


def test_signed_feed_reduces_to_table_state(spark, table, tmp_path):
    """The raw file-level feed is exact under signed aggregation: sum
    of +1/-1 per row multiset == the final table -- rewrite noise
    cancels, which is the consumer contract the stream is designed
    for."""
    table.merge(_rows(spark, [(2, "B", "2024-05"), (5, "e", "2024-06")]), "k")
    table.delete(spark.createDataFrame([(3,)], "k long"), "k")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, table.root, out, ckpt)
    feed = spark.read.parquet(out)
    net = (
        feed.withColumn(
            "sgn", F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        )
        .groupBy("k", "v", "ym")
        .agg(F.sum("sgn").alias("n"))
        .where(F.col("n") != 0)
    )
    assert {r["n"] for r in net.collect()} == {1}
    got = {(r["k"], r["v"], r["ym"]) for r in net.collect()}
    want = {
        (r["k"], r["v"], r["ym"]) for r in table.read(spark).collect()
    }
    assert got == want


def test_restart_resumes_from_checkpointed_offset(spark, table, tmp_path):
    """Offset recovery: drain, stop, mutate the table, restart with
    the SAME checkpoint -- only the new versions replay (no duplicate
    rows for the old ones), and starting_version is ignored in favor
    of the checkpoint."""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, table.root, out, ckpt)
    first = spark.read.parquet(out).count()
    assert first == 3  # the init snapshot

    table.append(_rows(spark, [(4, "d", "2024-06")]))
    table.merge(_rows(spark, [(2, "B", "2024-05")]), "k")
    _drain(spark, table.root, out, ckpt)  # restart, same checkpoint

    feed = spark.read.parquet(out)
    # v1's three insert rows appear exactly once each
    v1 = feed.where(F.col("_commit_version") == 1)
    assert v1.count() == 3
    assert v1.groupBy("k").count().where("count > 1").count() == 0
    # and the net state is still exact after the incremental drain
    net = (
        feed.withColumn(
            "sgn", F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        )
        .groupBy("k", "v")
        .agg(F.sum("sgn").alias("n"))
        .where("n != 0")
    )
    assert {(r["k"], r["v"]) for r in net.collect()} == {
        (1, "a"),
        (2, "B"),
        (3, "c"),
        (4, "d"),
    }


def test_starting_version_skips_snapshot(spark, table, tmp_path):
    """starting_version=v emits only changes AFTER v -- the caller
    already holding a snapshot as of v sees no replayed history."""
    v1 = table._snapshot_version()
    table.append(_rows(spark, [(4, "d", "2024-06")]))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, table.root, out, ckpt, starting_version=v1)
    got = [(r["k"], r["_change_type"]) for r in spark.read.parquet(out).collect()]
    assert got == [(4, "insert")]


def test_schema_includes_evolved_columns_and_nulls_old_files(
    spark, tmp_path
):
    """After add-column evolution, the stream schema is the LOGGED
    schema: pre-evolution files surface NULL for the new column."""
    t = TxTable(str(tmp_path / "t"), retain_history=True)
    t.init(spark.createDataFrame([(1, "a")], "k long, v string"))
    t.append(
        spark.createDataFrame([(2, "b", 9.5)], "k long, v string, score double"),
        evolve_schema=True,
    )
    assert [f.name for f in stream_schema(t).fields] == [
        "k",
        "v",
        "score",
        "_change_type",
        "_commit_version",
    ]
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, t.root, out, ckpt)
    got = {r["k"]: r["score"] for r in spark.read.parquet(out).collect()}
    assert got == {1: None, 2: 9.5}


def test_chain_rollup_stream_table_to_table(spark, tmp_path):
    """plans/continuous.chain_rollup_stream: a downstream consumer
    maintains a rollup TxTable off an upstream TxTable's commit log;
    drains, upstream mutations, and a restart from the checkpoint all
    keep rollup == batch recompute of current state."""
    from nyc_crash_mapper_etl_script_spark.operators.mv import signed_mv_view
    from nyc_crash_mapper_etl_script_spark.plans.continuous import (
        chain_rollup_stream,
    )

    fact = TxTable(str(tmp_path / "fact"), retain_history=True)
    fact.init(
        spark.createDataFrame(
            [(1, "x", 10.0), (2, "x", 20.0), (3, "y", 5.0)],
            "k long, grp string, val double",
        )
    )
    rollup = TxTable(str(tmp_path / "rollup"))
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = chain_rollup_stream(
            spark,
            fact,
            rollup,
            ["grp"],
            ckpt,
            sum_cols={"total": "val"},
        )
        q.awaitTermination(300)

    def rolled():
        return {
            (r["grp"], r["n"], r["total"])
            for r in signed_mv_view(
                rollup.read(spark), ["grp"], sum_cols={"total": "val"}
            ).collect()
        }

    def expected():
        return {
            (r["grp"], r["n"], r["total"])
            for r in fact.read(spark)
            .groupBy("grp")
            .agg(F.count("*").alias("n"), F.sum("val").alias("total"))
            .collect()
        }

    drain()
    assert rolled() == expected()

    # upstream mutations: update, insert, delete -- then an
    # incremental restart off the same checkpoint
    fact.merge(
        spark.createDataFrame([(2, "y", 99.0)], "k long, grp string, val double"),
        "k",
    )
    fact.append(
        spark.createDataFrame([(4, "z", 1.0)], "k long, grp string, val double")
    )
    fact.delete(spark.createDataFrame([(1,)], "k long"), "k")
    drain()
    assert rolled() == expected()
    # group x emptied by the update+delete -> gone from the rollup
    assert "x" not in {g for g, _, _ in rolled()}


def test_chain_rollup_replayed_batch_is_not_double_counted(
    spark, tmp_path
):
    """Exactly-once under micro-batch replay: crash BETWEEN the
    rollup's overwrite commit and the streaming checkpoint's commit
    (simulated by deleting the checkpoint's last commit marker) makes
    Spark re-run the batch on restart; the batch-id-aware sink must
    no-op instead of folding the same signed deltas twice."""
    from nyc_crash_mapper_etl_script_spark.operators.mv import signed_mv_view
    from nyc_crash_mapper_etl_script_spark.plans.continuous import (
        chain_rollup_stream,
    )

    fact = TxTable(str(tmp_path / "fact"), retain_history=True)
    fact.init(
        spark.createDataFrame(
            [(1, "x", 10.0), (2, "y", 20.0)], "k long, grp string, val double"
        )
    )
    rollup = TxTable(str(tmp_path / "rollup"))
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = chain_rollup_stream(
            spark, fact, rollup, ["grp"], ckpt, sum_cols={"total": "val"}
        )
        q.awaitTermination(300)

    def rolled():
        return {
            (r["grp"], r["n"], r["total"])
            for r in signed_mv_view(
                rollup.read(spark), ["grp"], sum_cols={"total": "val"}
            ).collect()
        }

    drain()
    fact.append(
        spark.createDataFrame([(3, "x", 5.0)], "k long, grp string, val double")
    )
    drain()
    want = rolled()
    assert ("x", 2, 15.0) in want

    # simulate the crash window: rollup committed, stream commit lost
    commits = sorted(os.listdir(os.path.join(ckpt, "commits")))
    last = [c for c in commits if not c.startswith(".")][-1]
    os.remove(os.path.join(ckpt, "commits", last))
    crc = os.path.join(ckpt, "commits", f".{last}.crc")
    if os.path.exists(crc):  # hadoop checksum sidecar blocks re-commit
        os.remove(crc)
    drain()  # Spark re-runs the last micro-batch
    assert rolled() == want, "replayed batch was folded twice"


def test_max_versions_per_batch_paces_the_backlog(spark, table, tmp_path):
    """maxVersionsPerBatch=1: a 4-version backlog drains as four
    single-commit micro-batches (the ReadLimit analog), and the union
    of batches is still the full feed."""
    table.append(_rows(spark, [(4, "d", "2024-06")]))
    table.append(_rows(spark, [(5, "e", "2024-06")]))
    table.append(_rows(spark, [(6, "f", "2024-07")]))

    batches = []

    def sink(batch_df, batch_id):
        batches.append(
            sorted({r["_commit_version"] for r in batch_df.collect()})
        )

    q = (
        read_txtable_stream(spark, table.root, max_versions_per_batch=1)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    non_empty = [b for b in batches if b]
    assert non_empty == [[1], [2], [3], [4]]


def _version_sizes(t):
    """Per-version changed-file bytes, resolved like the reader."""
    sizes = {}
    for e in t._entries():
        total = 0
        for rel in list(e.get("add", [])) + list(e.get("remove", [])):
            for cand in (
                os.path.join(t.root, rel),
                os.path.join(t.root, "_archive", rel),
            ):
                if os.path.exists(cand):
                    total += os.path.getsize(cand)
                    break
        sizes[e["version"]] = total
    return sizes


def _simulate_byte_pacing(sizes, cap):
    """Reference pacing: greedily group versions in order, first
    version of each batch always taken whole (soft cap)."""
    batches, cur, cum = [], [], 0
    for v in sorted(sizes):
        if cur and cum + sizes[v] > cap:
            batches.append(cur)
            cur, cum = [], 0
        cur.append(v)
        cum += sizes[v]
    if cur:
        batches.append(cur)
    return batches


def test_max_bytes_per_batch_paces_by_commit_size(spark, table, tmp_path):
    """maxBytesPerBatch groups the backlog by changed-file SIZE, not
    commit count: small commits coalesce, a commit that would blow the
    cap starts the next batch, an oversized commit still ships whole
    (soft cap), and the union of batches is the full feed."""
    # v2: one big commit (120 rows); v3-v5: tiny single-row commits
    table.append(
        _rows(spark, [(100 + i, f"x{i}", "2024-06") for i in range(120)])
    )
    table.append(_rows(spark, [(4, "d", "2024-06")]))
    table.append(_rows(spark, [(5, "e", "2024-06")]))
    table.append(_rows(spark, [(6, "f", "2024-07")]))

    sizes = _version_sizes(table)
    # cap sized to take the init commit alone, the big commit alone,
    # and coalesce the three tiny ones -- derived from real sizes so
    # the expectation is exact, not guessed
    cap = sizes[3] + sizes[4] + sizes[5]
    assert sizes[2] > cap, "fixture: big commit must exceed the cap"
    expect = _simulate_byte_pacing(sizes, cap)

    batches = []

    def sink(batch_df, batch_id):
        batches.append(
            sorted({r["_commit_version"] for r in batch_df.collect()})
        )

    q = (
        read_txtable_stream(spark, table.root, max_bytes_per_batch=cap)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = [b for b in batches if b]
    assert got == expect, f"sizes={sizes} cap={cap}"
    # soft cap: the oversized v2 shipped alone, nothing stalled
    assert [2] in got
    assert sorted(v for b in got for v in b) == sorted(sizes)


def test_byte_and_version_caps_compose(spark, table, tmp_path):
    """Both caps engaged: whichever binds first wins -- with a byte
    cap generous enough for the whole backlog but versions capped at
    1, pacing is one commit per batch; with versions uncapped the
    byte cap coalesces them."""
    table.append(_rows(spark, [(4, "d", "2024-06")]))
    table.append(_rows(spark, [(5, "e", "2024-06")]))

    batches = []

    def sink(batch_df, batch_id):
        batches.append(
            sorted({r["_commit_version"] for r in batch_df.collect()})
        )

    q = (
        read_txtable_stream(
            spark,
            table.root,
            max_versions_per_batch=1,
            max_bytes_per_batch=1 << 30,
        )
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert [b for b in batches if b] == [[1], [2], [3]]

    batches.clear()
    q = (
        read_txtable_stream(spark, table.root, max_bytes_per_batch=1 << 30)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert [b for b in batches if b] == [[1, 2, 3]]


def test_byte_pacing_survives_restart(spark, table, tmp_path):
    """Byte pacing shares the restart-safe anchor with version pacing:
    after a stop/resume with backlog built while down, delivery never
    regresses or duplicates and the byte cap stays engaged (one tiny
    commit per batch at a min cap)."""
    ckpt = str(tmp_path / "ckpt")
    table.append(_rows(spark, [(4, "d", "2024-06")]))  # v2
    table.append(_rows(spark, [(5, "e", "2024-06")]))  # v3

    batches: list[list[int]] = []

    def sink(batch_df, batch_id):
        batches.append(
            sorted({r["_commit_version"] for r in batch_df.collect()})
        )

    def run():
        q = (
            read_txtable_stream(spark, table.root, max_bytes_per_batch=1)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(300)

    run()
    assert [b for b in batches if b] == [[1], [2], [3]]
    table.append(_rows(spark, [(6, "f", "2024-07")]))  # v4
    table.append(_rows(spark, [(7, "g", "2024-07")]))  # v5
    batches.clear()
    run()
    got = [b for b in batches if b]
    delivered = [v for b in got for v in b]
    assert delivered == [4, 5], f"lost/duplicated/regressed: {got}"
    assert got == [[4], [5]], f"byte pacing lost across restart: {got}"


def test_restart_with_max_versions_never_regresses_offset(
    spark, table, tmp_path
):
    """Restart + maxVersionsPerBatch together: the pacing cap must not
    anchor at starting_version when the checkpointed offset is already
    past it -- a capped latestOffset below the committed offset would
    WAL a regressed offset and the next batch would re-deliver
    versions the sink already processed.  Spark's restart re-init call
    (partitions(end, end) / the uncommitted-batch re-run) seeds the
    true position BEFORE the first latestOffset, so pacing stays
    engaged across the restart with no regression and no loss."""
    ckpt = str(tmp_path / "ckpt")
    table.append(_rows(spark, [(4, "d", "2024-06")]))  # v2
    table.append(_rows(spark, [(5, "e", "2024-06")]))  # v3
    table.append(_rows(spark, [(6, "f", "2024-07")]))  # v4

    batches: list[list[int]] = []

    def sink(batch_df, batch_id):
        batches.append(
            sorted({r["_commit_version"] for r in batch_df.collect()})
        )

    def run(drains_after=()):
        q = (
            read_txtable_stream(
                spark, table.root, max_versions_per_batch=1
            )
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        for mutate in drains_after:
            mutate()
            q.processAllAvailable()
        q.stop()

    run()  # fresh query: paced 1 commit per batch up to v4
    assert [b for b in batches if b] == [[1], [2], [3], [4]]

    # backlog builds while the query is down; checkpoint sits at v4,
    # far past starting_version=0
    table.append(_rows(spark, [(7, "g", "2024-07")]))  # v5
    table.append(_rows(spark, [(8, "h", "2024-07")]))  # v6
    batches.clear()
    run(
        drains_after=[
            lambda: table.append(_rows(spark, [(9, "i", "2024-08")]))  # v7
        ]
    )
    got = [b for b in batches if b]
    delivered = [v for b in got for v in b]
    assert delivered == sorted(delivered), f"offset regressed: {got}"
    assert delivered == [5, 6, 7], f"lost or duplicated versions: {got}"
    # the restart re-init seeded the position, so every post-restart
    # batch is still paced at one commit each
    assert got == [[5], [6], [7]], f"pacing lost across restart: {got}"


def test_vacuum_retention_vs_lagging_stream(spark, table, tmp_path):
    """Retention contract: a lagging consumer survives
    vacuum(keep_versions=k) while its backlog is inside the window,
    and fails with the explanatory FileNotFound path once vacuum(0)
    reclaims archived files it still needs -- the Delta
    retention-vs-streaming-lag trade, made explicit."""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, table.root, out, ckpt)  # consumer at v1

    table.merge(_rows(spark, [(2, "B", "2024-05")]), "k")  # v2 archives v1 files
    table.append(_rows(spark, [(4, "d", "2024-06")]))      # v3
    table.vacuum(keep_versions=3)  # window covers the consumer's backlog
    _drain(spark, table.root, out, ckpt)  # catches up fine
    net = (
        spark.read.parquet(out)
        .withColumn(
            "sgn", F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        )
        .groupBy("k", "v")
        .agg(F.sum("sgn").alias("n"))
        .where("n != 0")
    )
    assert {(r["k"], r["v"]) for r in net.collect()} == {
        (1, "a"), (2, "B"), (3, "c"), (4, "d"),
    }

    # now lag again and reclaim ALL history: the stream's next drain
    # needs v4's removed files, which vacuum(0) deleted
    table.merge(_rows(spark, [(4, "D", "2024-06")]), "k")  # v4
    table.vacuum(keep_versions=0)
    with pytest.raises(Exception, match="(?i)retain_history|unreadable|exist"):
        _drain(spark, table.root, out, ckpt)


def test_bucket_aware_stream_layout_and_local_agg(spark, tmp_path):
    """Bucket-aware reads over a cluster_by table: every micro-batch
    arrives as EXACTLY n_buckets partitions with partition index ==
    bucket id (murmur3-pmod of the bucket key), so bucket_local_agg
    computes exact per-key aggregates in a plan with ZERO Exchange."""
    from nyc_crash_mapper_etl_script_spark.sources.bucketed import (
        bucket_local_agg,
    )

    n_buckets = 4
    t = TxTable(
        str(tmp_path / "tl"),
        cluster_by=(["k"], ["k"], n_buckets),
        retain_history=True,
    )
    t.init(
        spark.createDataFrame(
            [(i, float(i)) for i in range(40)], "k long, val double"
        )
    )
    t.append(
        spark.createDataFrame(
            [(i, 100.0) for i in range(0, 40, 3)], "k long, val double"
        )
    )
    t.merge(spark.createDataFrame([(7, -1.0)], "k long, val double"), "k")

    seen = []

    def sink(batch_df, batch_id):
        if not batch_df.take(1):
            return
        n_parts = batch_df.rdd.getNumPartitions()
        misplaced = (
            batch_df.withColumn("__pid", F.spark_partition_id())
            .where(
                F.col("__pid") != F.pmod(F.hash("k"), F.lit(n_buckets))
            )
            .count()
        )
        agg = bucket_local_agg(
            batch_df.withColumn(
                "sgn_val",
                F.when(F.col("_change_type") == "insert", F.col("val")).otherwise(
                    -F.col("val")
                ),
            ),
            ["k"],
            sum_cols={"net": "sgn_val"},
            count_col="n",
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        got = {(r["k"], r["n"], r["net"]) for r in agg.collect()}
        want = {
            (r["k"], r["n"], r["net"])
            for r in batch_df.withColumn(
                "sgn_val",
                F.when(F.col("_change_type") == "insert", F.col("val")).otherwise(
                    -F.col("val")
                ),
            )
            .groupBy("k")
            .agg(F.count("*").alias("n"), F.sum("sgn_val").alias("net"))
            .collect()
        }
        seen.append((n_parts, misplaced, "Exchange" in plan, got == want))

    q = (
        read_txtable_stream(spark, t.root)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert seen, "no non-empty micro-batch arrived"
    for n_parts, misplaced, has_exchange, agg_ok in seen:
        assert n_parts == n_buckets  # stable partition->bucket mapping
        assert misplaced == 0  # partition index IS the bucket id
        assert not has_exchange  # zero-shuffle per-key aggregation
        assert agg_ok  # and it's exact, not partial

    # layout is an optimization, not a row-set change: the per-file
    # layout (bucketAware=false) delivers the same multiset
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    for out, aware in ((out_a, True), (out_b, False)):
        q = (
            read_txtable_stream(spark, t.root, bucket_aware=aware)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", out + "_ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    rows = lambda p: sorted(  # noqa: E731
        (r["k"], r["val"], r["_change_type"], r["_commit_version"])
        for r in spark.read.parquet(p).collect()
    )
    assert rows(out_a) == rows(out_b)


def test_stream_over_clustered_table(spark, tmp_path):
    """The txtable-changes source reads cluster_by tables too: bucket
    filenames resolve like any other, and the signed feed still
    reduces to table state after a compact (whose rewrite noise
    cancels)."""
    t = TxTable(
        str(tmp_path / "tl"),
        cluster_by=(["k"], ["k"], 4),
        retain_history=True,
    )
    t.init(spark.createDataFrame([(i, f"v{i}") for i in range(8)], "k long, v string"))
    t.append(spark.createDataFrame([(100, "x")], "k long, v string"))
    t.compact(spark)  # full rewrite: every row a cancelling +/- pair
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, t.root, out, ckpt)
    feed = spark.read.parquet(out)
    net = (
        feed.withColumn(
            "sgn", F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        )
        .groupBy("k", "v")
        .agg(F.sum("sgn").alias("n"))
        .where("n != 0")
    )
    got = {(r["k"], r["v"]) for r in net.collect()}
    want = {(r["k"], r["v"]) for r in t.read(spark).collect()}
    assert got == want and len(got) == 9


def test_size_packed_partitions_default_and_opt_out(spark, table, tmp_path):
    """Small-file packing (the FilePartition analog): a batch of many
    small changed files arrives as FEWER input partitions than files
    by default (bounded by the openCost floor), one-per-file with
    maxBytesPerPartition=0 -- and both layouts deliver the identical
    row multiset (packing is an optimization, never a row-set
    change)."""
    # several commits touching both partitions -> many small files
    table.append(_rows(spark, [(10, "x", "2024-05"), (11, "y", "2024-06")]))
    table.merge(_rows(spark, [(1, "A", "2024-05"), (3, "C", "2024-06")]), "k")
    table.append(_rows(spark, [(12, "z", "2024-05")]))

    layouts = {}
    for label, mbpp in (("packed", None), ("perfile", 0)):
        seen = []

        def sink(batch, batch_id, seen=seen):
            seen.append(
                (batch.rdd.getNumPartitions(), batch.count())
            )

        q = (
            read_txtable_stream(
                spark, table.root, max_bytes_per_partition=mbpp
            )
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / f"ck_{label}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        layouts[label] = seen

    # row counts agree between layouts
    assert sum(n for _, n in layouts["packed"]) == sum(
        n for _, n in layouts["perfile"]
    )
    n_packed = sum(p for p, _ in layouts["packed"])
    n_perfile = sum(p for p, _ in layouts["perfile"])
    # the fixture's files are tiny: 4-MiB open costs pack ~32 of them
    # per 128-MiB bin, so the packed layout must be strictly smaller
    assert n_packed < n_perfile, (n_packed, n_perfile)

    # and the full feeds are byte-identical as multisets
    out_a, out_b = str(tmp_path / "fa"), str(tmp_path / "fb")
    q = (
        read_txtable_stream(spark, table.root)
        .writeStream.format("parquet")
        .option("path", out_a)
        .option("checkpointLocation", out_a + "_ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q = (
        read_txtable_stream(spark, table.root, max_bytes_per_partition=0)
        .writeStream.format("parquet")
        .option("path", out_b)
        .option("checkpointLocation", out_b + "_ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    key = lambda p: sorted(  # noqa: E731
        (r["k"], r["v"], r["ym"], r["_change_type"], r["_commit_version"])
        for r in spark.read.parquet(p).collect()
    )
    assert key(out_a) == key(out_b)


def test_version_bytes_warns_on_vacuumed_file_and_prunes_cache(spark, tmp_path):
    """Byte pacing over vacuumed history: a changed file resolving to
    neither live nor archive warns with a named cause instead of
    silently sizing the version at 0; and the per-version size cache
    drops entries at or below the paced anchor so a long-lived query
    stays O(pending versions), not O(history) (r8 ADVICE)."""
    import warnings

    from nyc_crash_mapper_etl_script_spark.sources.txstream import (
        TxTableStreamReader,
    )

    # retain_history=False: overwrite DELETES the superseded file
    t = TxTable(str(tmp_path / "t"))
    t.init(_rows(spark, [(1, "a", "2024-05")]))
    t.overwrite(_rows(spark, [(2, "b", "2024-06")]))
    entries = t._entries()
    reader = TxTableStreamReader(
        stream_schema(t), {"path": t.root, "maxbytesperbatch": "1"}
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        reader._version_bytes(entries[1])  # v2: remove side is gone
    assert any("neither live nor archived" in str(x.message) for x in w)

    # cache prune: sizes cached for v1/v2, anchor advancing to 2 in
    # partitions() drops both (never sized again)
    reader._version_bytes(entries[0])
    assert set(reader._version_bytes_cache) == {1, 2}
    reader.partitions({"version": 2}, {"version": 2})
    assert reader._version_bytes_cache == {}


def test_mid_stream_drop_column_fails_loudly(spark, tmp_path):
    """drop_column on a never-renamed column logs NO column_map key,
    so the rename guard never fires -- before the fix the running
    stream kept its fixed schema and silently emitted NULL for the
    dropped column from post-drop files.  It must fail like the
    rename case (r9 ADVICE)."""
    t = TxTable(str(tmp_path / "t"), retain_history=True)
    t.init(
        spark.createDataFrame(
            [(1, "a", 9.5)], "k long, v string, score double"
        )
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, t.root, out, ckpt)  # snapshot batch, schema fixed
    t.drop_column("score")
    t.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    # the RESTARTED consumer still carries the checkpointed pre-drop
    # run's progress, but a fresh query re-fixes its schema post-drop;
    # to model a RUNNING stream crossing the drop, drive the reader
    # directly with the pre-drop schema
    from nyc_crash_mapper_etl_script_spark.sources.txstream import (
        TxTableStreamReader,
        stream_schema,
    )

    pre_drop = stream_schema(TxTable(t.root))  # post-drop logical
    import pyspark.sql.types as T

    fixed = T.StructType(
        [T.StructField("score", T.DoubleType(), True)] + list(pre_drop.fields)
    )
    rdr = TxTableStreamReader(fixed, {"path": t.root})
    with pytest.raises(ValueError, match="dropped"):
        rdr.partitions({"version": 1}, {"version": 3})


def test_restarted_stream_sails_past_old_drop(spark, tmp_path):
    """dropped_physical is cumulative: a consumer restarted AGAINST
    the post-drop schema must replay commits at or after the drop
    without tripping the tombstone guard."""
    t = TxTable(str(tmp_path / "t"), retain_history=True)
    t.init(
        spark.createDataFrame(
            [(1, "a", 9.5)], "k long, v string, score double"
        )
    )
    t.drop_column("score")
    t.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drain(spark, t.root, out, ckpt)  # fresh query, post-drop schema
    got = sorted(
        (r["k"], r["_change_type"]) for r in spark.read.parquet(out).collect()
    )
    # snapshot insert + post-drop append insert; no NULL-score rows
    assert got == [(1, "insert"), (2, "insert")]
    cols = set(spark.read.parquet(out).columns)
    assert "score" not in cols


def test_mid_stream_narrowing_overwrite_fails_loudly(spark, tmp_path):
    """An overwrite that LOSES a field the stream's fixed schema binds
    must fail the stream -- NULL-filling a column the table no longer
    has is a silent wrong answer."""
    t = TxTable(str(tmp_path / "t"), retain_history=True)
    t.init(
        spark.createDataFrame(
            [(1, "a", 9.5)], "k long, v string, score double"
        )
    )
    from nyc_crash_mapper_etl_script_spark.sources.txstream import (
        TxTableStreamReader,
        stream_schema,
    )

    fixed = stream_schema(t)  # pre-overwrite: includes score
    t.overwrite(spark.createDataFrame([(9, "z")], "k long, v string"))
    rdr = TxTableStreamReader(fixed, {"path": t.root})
    with pytest.raises(ValueError, match="lost or retyped"):
        rdr.partitions({"version": 1}, {"version": 2})
