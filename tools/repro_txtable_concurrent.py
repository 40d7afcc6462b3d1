"""Concurrency repro for the two r12-driver-flagged rows: run
txtable_merge_update / txtable_stream_rollup in PARALLEL THREADS of
one shared SparkSession (alongside other TxTable queries), the way a
thread-pooled gate would, and diff every result against the DuckDB
oracle.  Exercises cross-thread session interference (catalog, confs,
CacheManager, the Python DataSource registry) that the sequential
repro (repro_txtable_nondet.py) cannot.

Usage: python tools/repro_txtable_concurrent.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from nyc_crash_mapper_etl_script_spark.schemas import TESTDATA_TABLES
from nyc_crash_mapper_etl_script_spark.session import get_spark

TARGETS = ["txtable_merge_update", "txtable_stream_rollup"]
#: concurrent company: other TxTable mutators + a streaming consumer
#: + a plain scan, so the targets race real catalog/tempdir/registry
#: traffic
COMPANY = ["txtable_changes_cdc", "txtable_dv_delete", "q1_pricing_summary"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("repro-txtable-concurrent")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    want = {
        n: sorted(tuple(r) for r in con.execute(oracles[n]).fetchall())
        for n in TARGETS
    }
    bad = 0
    for rnd in range(rounds):
        names = TARGETS + COMPANY

        def run(name):
            return name, sorted(
                tuple(r) for r in qs[name](spark, sf_dir).collect()
            )

        with ThreadPoolExecutor(max_workers=len(names)) as pool:
            got = dict(pool.map(run, names))
        for n in TARGETS:
            ok = got[n] == want[n]
            print(f"round {rnd} {n}: {'OK' if ok else 'DIFF'}")
            if not ok:
                bad += 1
                for a, b in zip(got[n], want[n]):
                    if a != b:
                        print(f"   spark={a} oracle={b}")
    print(f"\n{'FAIL' if bad else 'PASS'}: {bad} mismatches")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
