"""nightly_e2e stage profile (r12 VERDICT item 6).

The bench row is ONE action over the composed DAG, so per-stage cost
is invisible in the row time.  This tool times cumulative PREFIXES of
the same DAG through the noop sink (fresh plan per timing, labeled
jobs); consecutive deltas attribute wall time to each stage:

  feed        synth feed scan + SODA normalization projection
  staged      + dedup/new-rows/serial-ids + extent filter (the
                relation the shared materialization pins)
  linked      + district linkage (the pip join + matches join-back)
  full        + vehicle flags + blame allocation (= the bench row)

Writes PROFILE_NIGHTLY_r13.json.  Run on a quiet box.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_PROFILE_REPS", "3"))


def main() -> int:
    spark = get_spark("profile-nightly")
    from nyc_crash_mapper_etl_script_spark.operators.enrichment import (
        vehicle_flag_exprs,
    )
    from nyc_crash_mapper_etl_script_spark.operators.blame import allocate_blame
    from nyc_crash_mapper_etl_script_spark.operators.enrichment import (
        link_districts,
    )
    from nyc_crash_mapper_etl_script_spark.operators.ingest import (
        filter_to_extent,
        new_rows,
        normalize_soda_feed,
    )
    from nyc_crash_mapper_etl_script_spark.plans.macro_bench import (
        synth_dims,
        synth_feed,
    )
    from nyc_crash_mapper_etl_script_spark.plans.nightly import assign_serial_ids
    from nyc_crash_mapper_etl_script_spark.schemas import CRASHES_SCHEMA
    from nyc_crash_mapper_etl_script_spark.functions.materialize import (
        share_corpus_subtree,
    )

    districts, intersections, crosswalk = synth_dims(spark)
    empty = spark.createDataFrame([], CRASHES_SCHEMA)

    def feed_stage():
        return normalize_soda_feed(synth_feed(spark, SF))

    def staged_stage():
        staged = feed_stage()
        fresh = assign_serial_ids(new_rows(staged, empty, "socrata_id"), empty)
        merged = empty.unionByName(fresh, allowMissingColumns=True)
        return filter_to_extent(merged, districts)

    def staged_ckpt():
        return share_corpus_subtree(staged_stage())

    def linked_stage():
        return link_districts(staged_ckpt(), districts)

    def full_stage():
        m = linked_stage()
        return allocate_blame(m, extra_cols=vehicle_flag_exprs(m, crosswalk))

    stages = [
        ("feed", feed_stage),
        ("staged", staged_stage),
        ("staged_ckpt", staged_ckpt),
        ("linked", linked_stage),
        ("full", full_stage),
    ]
    out: dict[str, float] = {}
    for label, fn in stages:
        best = None
        for _ in range(REPS):
            df = fn()
            spark.sparkContext.setJobDescription(f"nightly-profile: {label}")
            try:
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
            finally:
                spark.sparkContext.setJobDescription(None)
            best = dt if best is None else min(best, dt)
            # free dead checkpoints between timings
            import gc

            gc.collect()
            try:
                jmap = spark.sparkContext._jsc.getPersistentRDDs()
                for rid in list(jmap.keySet().toArray()):
                    jmap.get(rid).unpersist(False)
            except Exception:  # noqa: BLE001
                pass
        out[label] = round(best, 3)
        print(f"{label}: {best:.3f}s")
    deltas = {}
    order = [s for s, _ in stages]
    for a, b in zip(order, order[1:]):
        deltas[f"{b}-{a}"] = round(out[b] - out[a], 3)
    doc = {"sf_dir": SF, "reps": REPS, "cumulative": out, "deltas": deltas}
    print(json.dumps(doc))
    with open("PROFILE_NIGHTLY_r13.json", "w") as fh:
        json.dump(doc, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
