"""Streaming as-of enrichment: the stream sees dimension versions
as-of each event's OWN timestamp, and a TxTable merge committed
between micro-batches is visible to the next batch."""

from __future__ import annotations

import datetime as dt
import json
import os


def _write_feed(feed_dir: str, name: str, rows: list[dict]) -> None:
    path = os.path.join(feed_dir, name)
    with open(path + ".tmp", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(path + ".tmp", path)


def test_enrich_stream_asof_point_in_time_and_freshness(spark, tmp_path_factory):
    from nyc_crash_mapper_etl_script_spark.sources.txtable import TxTable
    from nyc_crash_mapper_etl_script_spark.streaming.enrich import (
        enrich_stream_asof,
    )

    base = tmp_path_factory.mktemp("enrich")
    feed = base / "feed"
    out_rows: list[tuple] = []
    feed.mkdir()

    # SCD2-ish dimension: key 1 was 'old' from minute 0, 'new' from minute 10
    dim = TxTable(str(base / "dim"), partition_by=None)
    dim.init(
        spark.createDataFrame(
            [
                (1, dt.datetime(2024, 1, 1, 0, 0), "old"),
                (1, dt.datetime(2024, 1, 1, 0, 10), "new"),
            ],
            "k long, valid_from timestamp, state string",
        )
    )

    def sink(df, batch_id):
        out_rows.extend(
            (r["k"], r["ts"], r["asof_state"]) for r in df.collect()
        )

    # batch 1: one event before the change, one after
    _write_feed(str(feed), "b1.json", [
        {"k": 1, "ts": "2024-01-01T00:05:00"},
        {"k": 1, "ts": "2024-01-01T00:15:00"},
    ])
    stream = spark.readStream.schema("k long, ts timestamp").json(str(feed))
    q = enrich_stream_asof(
        stream,
        dim,
        key_col="k",
        ts_col="ts",
        valid_from_col="valid_from",
        dim_value_cols=["state"],
        sink=sink,
        checkpoint_dir=str(base / "ckpt"),
    )
    q.processAllAvailable()

    got = {ts.minute: s for (_, ts, s) in out_rows}
    assert got[5] == "old"    # event at :05 resolves the :00 version
    assert got[15] == "new"   # event at :15 resolves the :10 version

    # merge a newer version BETWEEN batches -- next batch must see it
    dim.append(
        spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1, 0, 20), "newer")],
            "k long, valid_from timestamp, state string",
        )
    )
    out_rows.clear()
    _write_feed(str(feed), "b2.json", [
        {"k": 1, "ts": "2024-01-01T00:25:00"},
        {"k": 1, "ts": "2024-01-01T00:12:00"},  # late event: historic version
    ])
    q.processAllAvailable()
    q.stop()

    got = {ts.minute: s for (_, ts, s) in out_rows}
    assert got[25] == "newer"  # fresh commit visible without restart
    assert got[12] == "new"    # late event gets the version valid AT its ts


def test_enrich_stream_static_left_join(spark, tmp_path_factory):
    from nyc_crash_mapper_etl_script_spark.streaming.enrich import enrich_stream

    base = tmp_path_factory.mktemp("enrich2")
    feed = base / "feed"
    out = base / "out"
    feed.mkdir()
    dim = spark.createDataFrame(
        [(1, "alpha")], "k long, label string"
    )
    _write_feed(str(feed), "b1.json", [{"k": 1, "v": 5}, {"k": 2, "v": 6}])
    stream = spark.readStream.schema("k long, v long").json(str(feed))
    q = (
        enrich_stream(stream, dim, "k", ["label"])
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(base / "ckpt"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {r["k"]: r["label"] for r in spark.read.parquet(str(out)).collect()}
    assert rows == {1: "alpha", 2: None}  # left join keeps unmatched events


def test_near_dedup_stream_maintains_band_index(spark, tmp_path_factory):
    """Two micro-batches through the streaming near-dedup: within-batch
    near-dups drop (first id wins), a later batch's near-dup of a
    STORED doc drops, unique docs pass and extend the index."""
    from nyc_crash_mapper_etl_script_spark.sources.txtable import TxTable
    from nyc_crash_mapper_etl_script_spark.streaming.dedup import (
        near_dedup_stream,
    )

    base = tmp_path_factory.mktemp("neardedup")
    feed = base / "feed"
    feed.mkdir()
    index = TxTable(str(base / "bandindex"))
    kept_ids: list[int] = []

    BASE = "the quick brown fox jumps over the lazy dog and runs far away today"
    NEAR = BASE.replace("quick", "swift")
    OTHER = "completely different prose concerning maritime navigation and charts"

    def sink(df, batch_id):
        kept_ids.extend(r["doc_id"] for r in df.collect())

    _write_feed(str(feed), "b1.json", [
        {"doc_id": 1, "text": BASE},
        {"doc_id": 2, "text": OTHER},
        {"doc_id": 3, "text": NEAR},   # within-batch near-dup of 1
    ])
    stream = spark.readStream.schema("doc_id long, text string").json(str(feed))
    q = near_dedup_stream(
        stream, index, "doc_id", "text",
        sink=sink, checkpoint_dir=str(base / "ckpt"), threshold=0.5,
    )
    q.processAllAvailable()
    assert sorted(kept_ids) == [1, 2]

    kept_ids.clear()
    _write_feed(str(feed), "b2.json", [
        {"doc_id": 4, "text": BASE},   # near-dup of STORED doc 1
        {"doc_id": 5, "text": "a genuinely novel document about spark plans"},
    ])
    q.processAllAvailable()
    q.stop()
    assert sorted(kept_ids) == [5]
    # index holds band rows for exactly the surviving docs
    ids = {r["id"] for r in index.read(spark).select("id").distinct().collect()}
    assert ids == {1, 2, 5}
