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
