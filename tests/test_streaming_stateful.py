"""Stateful streaming CDC: per-key fingerprint state survives a
checkpointed restart and classifies insert/update/skip like the
batch classifier (reference walkmapper/mysql2carto.py:203-248)."""

from __future__ import annotations

import json

from nyc_crash_mapper_etl_script_spark.streaming.stateful import stateful_cdc_classify


def _run_once(spark, feed_dir, out_dir, ckpt):
    stream = (
        spark.readStream.schema("id long, status string, prio string")
        .json(str(feed_dir))
    )
    classified = stateful_cdc_classify(stream, "id", ["status", "prio"])
    q = (
        classified.writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stateful_cdc_across_restarts(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("stateful")
    feed = root / "feed"
    feed.mkdir()
    out = root / "out"
    ckpt = root / "ckpt"

    with open(feed / "b1.jsonl", "w") as f:
        f.write(json.dumps({"id": 1, "status": "O", "prio": "HIGH"}) + "\n")
        f.write(json.dumps({"id": 2, "status": "O", "prio": "LOW"}) + "\n")
    _run_once(spark, feed, out, ckpt)
    first = {r["key"]: r["cdc_class"] for r in spark.read.parquet(str(out)).collect()}
    assert first == {1: "insert", 2: "insert"}

    # restart with the same checkpoint: key 1 unchanged -> skip,
    # key 2 changed -> update, key 3 new -> insert
    with open(feed / "b2.jsonl", "w") as f:
        f.write(json.dumps({"id": 1, "status": "O", "prio": "HIGH"}) + "\n")
        f.write(json.dumps({"id": 2, "status": "F", "prio": "LOW"}) + "\n")
        f.write(json.dumps({"id": 3, "status": "N", "prio": "MED"}) + "\n")
    _run_once(spark, feed, out, ckpt)
    rows = spark.read.parquet(str(out)).collect()
    second = {}
    for r in rows:
        second.setdefault(r["key"], []).append(r["cdc_class"])
    assert sorted(second[1]) == ["insert", "skip"]
    assert sorted(second[2]) == ["insert", "update"]
    assert second[3] == ["insert"]


def test_windowed_counts_with_late_data(spark, tmp_path_factory):
    """Watermarked windowed rollup: an in-watermark late row revises
    its window; a beyond-watermark row is dropped."""
    import json as _json

    from nyc_crash_mapper_etl_script_spark.streaming.windowed import windowed_counts

    root = tmp_path_factory.mktemp("windowed")
    feed = root / "feed"
    feed.mkdir()
    out = root / "out"
    ckpt = root / "ckpt"

    def write_batch(name, rows):
        with open(feed / name, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    def drain():
        stream = spark.readStream.schema("ts timestamp, k string, v double").json(
            str(feed)
        )
        q = (
            windowed_counts(stream, "ts", "k", window="1 day", watermark="2 days",
                            value_col="v")
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (str(r["window_start"])[:10], r["k"]): (r["n"], r["total"])
            for r in spark.read.parquet(str(out)).collect()
        }

    write_batch("b1.jsonl", [
        {"ts": "2024-01-01T10:00:00", "k": "a", "v": 1.0},
        {"ts": "2024-01-01T11:00:00", "k": "a", "v": 2.0},
        {"ts": "2024-01-05T09:00:00", "k": "a", "v": 4.0},  # advances watermark to 01-03
    ])
    # Jan 1 window is past the watermark -> closed and emitted
    got1 = drain()
    assert got1[("2024-01-01", "a")] == (2, 3.0)

    write_batch("b2.jsonl", [
        {"ts": "2024-01-05T10:00:00", "k": "a", "v": 8.0},   # on-time
        {"ts": "2024-01-01T12:00:00", "k": "a", "v": 99.0},  # beyond watermark -> dropped
        {"ts": "2024-01-09T00:00:00", "k": "a", "v": 16.0},  # advances watermark past 01-05
    ])
    got2 = drain()
    # Jan 1 window unchanged (late row dropped); Jan 5 window closed with both rows
    assert got2[("2024-01-01", "a")] == (2, 3.0)
    assert got2[("2024-01-05", "a")] == (2, 12.0)
