"""kmv-protocol row probe (r10 VERDICT item 1): for each named bench
row, (a) run N dedicated single executions at the bench SF -- fresh
plan per run, caches released between, one session -- and print the
spread, and (b) diff the row's CURRENT physical plan shape against
its committed PLANS.md section, so a FLAGged driver row can be
adjudicated "host, not code" (spread covers the sample + plan
unchanged) or escalated (plan drifted / spread genuinely shifted).

Usage::

    python tools/probe_rows.py j1_dedup_anti_join dedup_minhash_lsh \
        [--runs 6] [--json out.json]

Plan comparison normalizes volatile tokens (plan ids ``#123``,
exchange ids, file paths, statistics) and compares the ordered list
of operator heads -- the same notion of "plan shape" the plan gate in
tests/test_query_plans.py asserts over.
"""

from __future__ import annotations

import gc
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_shape(plan: str) -> list[str]:
    """Ordered operator heads of a physical-plan string, volatile
    tokens stripped."""
    heads = []
    for line in plan.splitlines():
        line = line.strip()
        # tree-drawing + codegen markers off the front
        line = re.sub(r"^[:+\-*() 0-9]*", "", line)
        m = re.match(r"([A-Za-z][A-Za-z0-9_]*)", line)
        if not m:
            continue
        head = m.group(1)
        if head in ("Arguments", "Input", "Output", "Results", "Batched",
                    "Location", "ReadSchema", "PushedFilters", "Condition",
                    "Keys", "Functions", "Aggregate", "Join", "Subquery",
                    "AdaptiveSparkPlan", "ReusedExchange", "Exchange"):
            # attribute lines of the formatted mode / volatile wrappers
            if head not in ("Exchange", "ReusedExchange"):
                continue
        heads.append(head)
    return heads


def main() -> None:
    args = list(sys.argv[1:])
    runs = 6
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    names = args
    assert names, "usage: probe_rows.py <row> [<row> ...]"

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plan_sf = "/root/testdata/sf0.001"  # PLANS.md's generation SF

    from nyc_crash_mapper_etl_script_spark import harness
    from nyc_crash_mapper_etl_script_spark.session import get_spark

    qs = harness.queries()
    with open(os.path.join(REPO, "PLANS.md")) as f:
        plans_md = f.read()

    spark = get_spark("probe-rows")

    def release():
        gc.collect()
        try:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for rid in list(jmap.keySet().toArray()):
                jmap.get(rid).unpersist(False)
        except Exception:  # noqa: BLE001
            pass

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        # plan diff first (cheap, sf0.001)
        cur = fn(spark, plan_sf)._jdf.queryExecution().executedPlan().toString()
        m = re.search(
            rf"^## {re.escape(name)}\n\n```\n(.*?)\n```", plans_md, re.S | re.M
        )
        committed = m.group(1) if m else ""
        same = plan_shape(cur) == plan_shape(committed)
        # timed spread: warm once, then N single executions
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(runs):
            release()
            df = fn(spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
        out[name] = {
            "samples": samples,
            "min": min(samples),
            "max": max(samples),
            "plan_shape_unchanged": same,
        }
        print(
            f"{name}: spread {samples} "
            f"plan_shape_unchanged={same}",
            flush=True,
        )
        if not same:
            print("  current heads:  ", plan_shape(cur)[:20])
            print("  committed heads:", plan_shape(committed)[:20])
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "runs": runs, "rows": out}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
