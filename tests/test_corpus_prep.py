"""Corpus-prep operators: stratified sampling determinism and rates,
vocabulary counts/top-k/doc-frequency, streaming exact dedup (both
unbounded and watermark-scoped state)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.operators.sampling import stratified_sample
from nyc_crash_mapper_etl_script_spark.operators.vocab import (
    doc_frequency,
    vocab_counts,
    vocab_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stratified_sample_rates_and_determinism(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "lang")
    fr = {"en": 0.5, "de": 1.0}
    s1 = {r["doc_id"] for r in stratified_sample(d, "doc_id", "lang", fr).collect()}
    s2 = {r["doc_id"] for r in stratified_sample(d, "doc_id", "lang", fr).collect()}
    assert s1 == s2  # pure function of (salt, key)
    by_lang = {
        r["lang"]: r["n"]
        for r in stratified_sample(d, "doc_id", "lang", fr)
        .groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    totals = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang["de"] == totals["de"]          # rate 1.0 keeps all
    assert 0 < by_lang["en"] < totals["en"]       # rate 0.5 keeps some
    assert set(by_lang) == {"en", "de"}           # unlisted strata drop
    # a different salt reshuffles membership but not determinism
    s3 = {r["doc_id"] for r in stratified_sample(d, "doc_id", "lang", fr, salt="v2").collect()}
    assert s3 != s1


def test_vocab_counts_and_topk(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the hat"), (2, "The  cat"), (3, None), (4, "  ")],
        "doc_id long, text string",
    )
    counts = {r["token"]: r["n"] for r in vocab_counts(df).collect()}
    assert counts == {"the": 3, "cat": 2, "and": 1, "hat": 1}
    top = [(r["token"], r["n"]) for r in vocab_topk(df, k=2).collect()]
    assert top == [("the", 3), ("cat", 2)]
    # tie-break: equal counts order token-asc at the boundary
    top3 = [(r["token"], r["n"]) for r in vocab_topk(df, k=3).collect()]
    assert top3[2] == ("and", 1)
    dfreq = {r["token"]: r["df"] for r in doc_frequency(df).collect()}
    assert dfreq == {"the": 2, "cat": 2, "and": 1, "hat": 1}


def _drain_dedup(spark, feed, out, ckpt, within_watermark: bool):
    from nyc_crash_mapper_etl_script_spark.streaming.dedup import (
        dedup_stream,
        dedup_stream_within_watermark,
    )

    stream = spark.readStream.schema("id long, ts timestamp, v string").json(str(feed))
    dd = (
        dedup_stream_within_watermark(stream, ["id"], "ts", "1 hour")
        if within_watermark
        else dedup_stream(stream, ["id"])
    )
    q = (
        dd.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sorted(
        (r["id"], str(r["ts"]), r["v"])
        for r in spark.read.parquet(str(out)).collect()
    )


def test_dedup_stream_drops_cross_batch_duplicates(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sdedup")
    feed = root / "feed"; feed.mkdir()
    with open(feed / "b1.jsonl", "w") as f:
        f.write(json.dumps({"id": 1, "ts": "2024-01-01T10:00:00", "v": "a"}) + "\n")
        f.write(json.dumps({"id": 1, "ts": "2024-01-01T10:05:00", "v": "dup"}) + "\n")
        f.write(json.dumps({"id": 2, "ts": "2024-01-01T10:10:00", "v": "b"}) + "\n")
    got = _drain_dedup(spark, feed, root / "out", root / "ckpt", False)
    assert [r[0] for r in got] == [1, 2]
    with open(feed / "b2.jsonl", "w") as f:
        f.write(json.dumps({"id": 2, "ts": "2024-01-02T09:00:00", "v": "dup"}) + "\n")
        f.write(json.dumps({"id": 3, "ts": "2024-01-02T09:01:00", "v": "c"}) + "\n")
    got = _drain_dedup(spark, feed, root / "out", root / "ckpt", False)
    # id 2's second arrival dropped even a day later: state never expires
    assert [r[0] for r in got] == [1, 2, 3]


def test_dedup_stream_within_watermark_expires_state(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("swdedup")
    feed = root / "feed"; feed.mkdir()
    with open(feed / "b1.jsonl", "w") as f:
        f.write(json.dumps({"id": 1, "ts": "2024-01-01T10:00:00", "v": "a"}) + "\n")
        f.write(json.dumps({"id": 1, "ts": "2024-01-01T10:30:00", "v": "dup"}) + "\n")
    got = _drain_dedup(spark, feed, root / "out", root / "ckpt", True)
    assert [r[0] for r in got] == [1]
    with open(feed / "b2.jsonl", "w") as f:
        # advances the watermark far past id 1's state lifetime...
        f.write(json.dumps({"id": 9, "ts": "2024-01-03T00:00:00", "v": "x"}) + "\n")
    _drain_dedup(spark, feed, root / "out", root / "ckpt", True)
    with open(feed / "b3.jsonl", "w") as f:
        # ...so a fresh id-1 row is admitted again (state was reclaimed)
        f.write(json.dumps({"id": 1, "ts": "2024-01-03T00:05:00", "v": "again"}) + "\n")
    got = _drain_dedup(spark, feed, root / "out", root / "ckpt", True)
    assert sorted(r[0] for r in got) == [1, 1, 9]
