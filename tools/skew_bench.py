"""Skew A/B at bench scale (VERDICT r2 item 8): wall-clock of the
salted vs unsalted forms of the as-of join and the mid-size-dimension
equi-join on a synthetic hot key over the sf0.1 events table.

The structural pin (max per-task key-group bounded by hot/n_salts and
by the chunk width) lives in tests/test_skew_validation.py; this
script produces the measured wall-clock numbers recorded in SURVEY.md.

Usage: python tools/skew_bench.py [hot_share ...]   (default 0.01 0.3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nyc_crash_mapper_etl_script_spark.operators.skew import salted_join  # noqa: E402
from nyc_crash_mapper_etl_script_spark.operators.temporal_join import (  # noqa: E402
    asof_join,
    asof_join_salted,
)
from nyc_crash_mapper_etl_script_spark.schemas import load_table  # noqa: E402
from nyc_crash_mapper_etl_script_spark.session import get_spark  # noqa: E402


def hot_events(spark, sf_dir: str, hot_share: float, mult: int = 1):
    """events with `hot_share` of rows forced onto key 0.  ``mult``
    explodes each row into `mult` distinct-timestamp copies so the hot
    key's row count actually stresses a single task (at sf0.1 the raw
    table is 600k rows -- small enough that even a 30% hot key sorts
    in one task in ~0.1s, which is exactly why the salted form's win
    only shows once a key's rows outgrow one task)."""
    ev = load_table(spark, sf_dir, "events")
    if mult > 1:
        ev = ev.withColumn(
            "__m", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
        ).withColumn("ts", F.col("ts") + F.make_dt_interval(secs=F.col("__m") * 13))
    return ev.select(
        F.when(F.xxhash64("event_id") % 10_000 < int(hot_share * 10_000), F.lit(0))
        .otherwise(F.col("user_id"))
        .alias("k"),
        F.col("ts"),
        F.col("value"),
    )


def timed(df, reps: int = 3) -> float:
    df.write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    shares = [float(s) for s in sys.argv[1:]] or [0.01, 0.3]
    mult = int(os.environ.get("SKEW_BENCH_MULT", "16"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("skew-bench")
    out = {}
    for share in shares:
        fact = hot_events(spark, sf_dir, share, mult=mult)
        ref = hot_events(spark, sf_dir, share).sample(0.01, seed=7).select(
            "k", "ts", F.col("value").alias("ref_value")
        )
        dim = spark.range(0, 100_000).select(
            F.col("id").alias("k"), (F.col("id") % 13).alias("label")
        )
        res = {
            # windows have NO AQE skew rescue -- the salted form is the
            # only defense, and it wins as soon as the hot key's rows
            # outgrow one task's comfortable sort
            "asof_plain": timed(
                asof_join(fact, ref, "k", "ts", "ts", ["ref_value"], probe_cols=["value"])
            ),
            "asof_salted": timed(
                asof_join_salted(
                    fact, ref, "k", "ts", "ts", ["ref_value"],
                    probe_cols=["value"], chunk_seconds=86400,
                )
            ),
        }
        # JOIN skew: AQE's skewJoin splitting already rescues the plain
        # shuffle join at runtime -- measure all three regimes so the
        # cost model is explicit: (a) plain+AQE (the default; usually
        # fine), (b) plain with skew splitting off (the pathological
        # case salting exists for), (c) salted with splitting off.
        res["join_plain_aqe_skew"] = timed(fact.join(dim.hint("shuffle_hash"), "k"))
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        try:
            res["join_plain_no_skewjoin"] = timed(
                fact.join(dim.hint("shuffle_hash"), "k")
            )
            res["join_salted_no_skewjoin"] = timed(
                salted_join(fact, dim.hint("shuffle_hash"), "k")
            )
        finally:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        out[str(share)] = res
    print(json.dumps({"sf_dir": sf_dir, "results": out}))


if __name__ == "__main__":
    main()
