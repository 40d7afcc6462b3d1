"""Repeated-run determinism repro for the two driver-red rows
(txtable_merge_update, txtable_stream_rollup).

Runs each query function N times inside ONE Spark session at the given
sf, prints every run's raw (status, n, total_cents) triples, and diffs
them against the DuckDB oracle.  Any run-to-run variation or
spark-vs-duckdb delta is printed with the exact differing cells.

Usage: python tools/repro_txtable_nondet.py [sf_dir] [N] [--json out.json]

Env: SPARK_GRAFT_REPRO_BARE=1 uses a driver-faithful bare session
(default confs) instead of the tuned one.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from nyc_crash_mapper_etl_script_spark.schemas import TESTDATA_TABLES
from nyc_crash_mapper_etl_script_spark.session import get_spark

ROWS = ["txtable_merge_update", "txtable_stream_rollup"]


def main() -> int:
    args = list(sys.argv[1:])
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    n_runs = int(args[1]) if len(args) > 1 else 10
    if os.environ.get("SPARK_GRAFT_REPRO_BARE") == "1":
        # driver-faithful session: the driver builds its OWN session
        # (default confs -- shuffle.partitions=200, no UTC pin, no AQE
        # overrides, arrow off), not our tuned one
        from pyspark.sql import SparkSession

        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        spark = (
            SparkSession.builder.appName("repro-bare")
            .master(f"local[{cpus}]")
            .getOrCreate()
        )
    else:
        spark = get_spark("repro-txtable-nondet")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = 0
    report: dict[str, dict] = {}
    for name in ROWS:
        want = sorted(tuple(r) for r in con.execute(oracles[name]).fetchall())
        print(f"== {name}  oracle: {want}")
        seen = set()
        for i in range(n_runs):
            got = sorted(
                tuple(r) for r in qs[name](spark, sf_dir).collect()
            )
            tag = "OK " if got == want else "DIFF"
            if got != want:
                bad += 1
                for a, b in zip(got, want):
                    if a != b:
                        print(f"   run {i}: {tag} spark={a} oracle={b}")
            else:
                print(f"   run {i}: {tag}")
            seen.add(tuple(got))
        if len(seen) > 1:
            print(f"   NONDETERMINISTIC across runs: {len(seen)} variants")
            for v in seen:
                print(f"     {v}")
        report[name] = {
            "n_runs": n_runs,
            "n_variants": len(seen),
            "all_match_oracle": all(v == tuple(want) for v in seen),
            "oracle": [list(r) for r in want],
        }
    print(f"\n{'FAIL' if bad else 'PASS'}: {bad} mismatching runs")
    if json_out:
        import json as _json

        with open(json_out, "w") as fh:
            _json.dump(
                {
                    "sf_dir": sf_dir,
                    "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                    "bare_session": os.environ.get("SPARK_GRAFT_REPRO_BARE") == "1",
                    "rows": report,
                    "mismatching_runs": bad,
                },
                fh,
                indent=1,
            )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
