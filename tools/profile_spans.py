"""Decompose dedup_substring_spans cost on the heavy corpus.

Times each prefix of the operator's plan (explode+hash windows ->
first-occurrence agg -> probe join -> interval merge -> final) with
the noop sink so the serial bottleneck the 8-vs-32-core ratio points
at gets a name.  Pure measurement tool -- no product code.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nyc_crash_mapper_etl_script_spark.operators.dedup_text import (
    _ensure_parallelism,
    substring_span_stats,
)
from nyc_crash_mapper_etl_script_spark.session import get_spark


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, df):
    spark.sparkContext.setJobDescription(f"spans-profile: {label}")
    try:
        t0 = time.time()
        _noop(df)
        dt = time.time() - t0
    finally:
        spark.sparkContext.setJobDescription(None)
    print(f"{label}: {dt:.2f}s", flush=True)
    return round(dt, 3)


def main() -> int:
    heavy_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_heavy"
    k = 40
    spark = get_spark("spans-profile")
    docs = spark.read.parquet(f"{heavy_dir}/documents.parquet")
    out = {}

    d = _ensure_parallelism(docs)
    base = d.select(
        F.col("doc_id").alias("id"),
        F.coalesce(F.col("text"), F.lit("")).alias("__t"),
    )
    tl = F.length(F.col("__t"))
    idx = F.when(
        tl >= k, F.sequence(F.lit(1), tl - F.lit(k - 1))
    ).otherwise(F.array().cast("array<int>"))
    win = F.col("__t").substr(F.col("pos"), F.lit(k))
    windows = base.select("id", "__t", F.explode(idx).alias("pos")).select(
        "id",
        "pos",
        F.xxhash64(win).alias("h1"),
        F.xxhash64(F.lit("\x01"), win).alias("h2"),
    )
    out["n_docs"] = docs.count()
    out["n_windows"] = windows.count()
    print("n_windows:", out["n_windows"], flush=True)

    out["a_windows_noop"] = timed(spark, "a: explode+hash", windows)

    enc = (
        F.col("id").cast("decimal(19,0)")
        * F.lit(10_000_000_000).cast("decimal(11,0)")
        + F.col("pos").cast("decimal(10,0)")
    )
    keyed = windows.withColumn("__e", enc)
    firsts = keyed.groupBy("h1", "h2").agg(F.min("__e").alias("__f"))
    out["b_firsts_agg"] = timed(spark, "b: firsts agg", firsts)

    dups = (
        keyed.join(firsts, ["h1", "h2"])
        .where(F.col("__e") != F.col("__f"))
        .select("id", "pos", (F.col("pos") + F.lit(k)).alias("__end"))
    )
    out["c_probe_join"] = timed(spark, "c: probe join", dups)
    out["n_dups"] = dups.count()
    print("n_dups:", out["n_dups"], flush=True)

    w_doc = Window.partitionBy("id").orderBy("pos")
    prev_end = F.max("__end").over(
        w_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = dups.withColumn(
        "__isl",
        F.sum(
            F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0)
        ).over(w_doc),
    )
    out["d_islands"] = timed(spark, "d: interval merge", islands)

    out["e_full"] = timed(
        spark, "e: full operator", substring_span_stats(docs, k=40)
    )
    doc = {"heavy_dir": heavy_dir, "cpus": os.environ.get("SPARK_GRAFT_CPUS"), "rows": out}
    print(json.dumps(doc))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
