"""Single-run variance for the scheduler-jitter-dominated bench rows
(r6 VERDICT item 3, the c1/c3 investigation): why do sub-second rows
exceed a 10-run min-of-3 envelope on hot driver rounds when even a
24-process synthetic co-load cannot push their min-of-3 that high?

Finding: these rows are multi-stage shuffles whose per-run time is
dominated by task-scheduling jitter, with a long right tail --
c1_cdc_classify single runs span ~0.36-0.88 s at sf0.1 on this box
(2.4x).  bench.py reports min-of-3, which dodges UNCORRELATED noise;
but hypervisor-level steal on a shared VM stalls all three reps
TOGETHER (in-VM spinners cannot reproduce this -- they compete for
cores, they do not slow Spark's own cycles), and a min over
correlated draws behaves like a SINGLE draw.  So the right reference
distribution for a hot-round driver sample is the single-run
spread, which this tool measures and commits: N single executions
per row (fresh plan each, cache released between, one session),
for every headline row whose envelope median is under the
threshold (the jitter-dominated class; big rows are
data-bound and track the envelope).

Usage::

    python tools/bench_micro_variance.py [n_runs] [med_threshold_s]

Writes BENCH_MICRO_VARIANCE.json; tools/adjudicate_bench.py uses it
as its final test (verdict ``scheduler-tail``): a min-of-3 sample can
never exceed the single-run max under the same conditions, so a
driver row inside the single-run range is jitter, not regression.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    med_threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench as bench_mod
    from nyc_crash_mapper_etl_script_spark import harness
    from nyc_crash_mapper_etl_script_spark.session import get_spark

    with open(os.path.join(REPO, "BENCH_ENVELOPE.json")) as f:
        env = json.load(f)
    rows = [
        q
        for q in bench_mod.HEADLINE
        if q in env["queries"] and env["queries"][q]["med"] < med_threshold
    ]
    spark = get_spark("micro-variance")
    qs = harness.queries()

    def release():
        gc.collect()
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rid in list(jmap.keySet().toArray()):
                jmap.get(rid).unpersist(False)
        except Exception:  # noqa: BLE001 -- best-effort, like bench.py
            pass

    out: dict[str, dict] = {}
    for q in rows:
        qs[q](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(n_runs):
            release()
            df = qs[q](spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        ss = sorted(samples)
        out[q] = {
            "min": ss[0],
            "med": ss[len(ss) // 2],
            "max": ss[-1],
            "samples": samples,
        }
        print(f"{q}: [{ss[0]}, {ss[len(ss) // 2]}, {ss[-1]}]", flush=True)
    doc = {
        "n_runs": n_runs,
        "med_threshold": med_threshold,
        "sf_dir": sf_dir,
        "note": (
            "single-run (NOT min-of-3) distributions for the "
            "jitter-dominated rows; reference for correlated-stall "
            "driver samples (see module docstring)"
        ),
        "queries": out,
    }
    path = os.path.join(REPO, "BENCH_MICRO_VARIANCE.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
