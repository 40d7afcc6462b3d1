"""Deletion-vector vs rewrite DELETE A/B (round 9): quantify the
headline claim -- a sparse delete's write cost should be O(deleted
rows), not O(touched-file bytes).

Method: build one TxTable per variant from sf0.1 lineitem (~600k
rows, compacted to a handful of ~target-size files so every file
holds doomed rows -- the worst case for the rewrite path and the
realistic shape of a curated corpus), then delete a ~0.1% sparse
predicate three ways and record wall seconds, bytes WRITTEN by the
delete commit (staged data or dv sidecar), and files churned:

  rewrite      : delete_where(cond)            -- rewrites every file
                                                  holding a match
  dv           : delete_where(cond, dv=True)   -- position sidecar
  dv_then_read : dv delete + one full read()   -- charges the dv
                 variant its read-side anti-join so the comparison
                 cannot hide the deferred cost

Each variant runs on a fresh table in a fresh temp dir; timings are
min-of-3 on the delete step (the build is not timed).  Writes
BENCH_DV_AB.json.

At 100 TB the byte asymmetry IS the story: the rewrite path's bytes
scale with table size (every file with >=1 match rewrites whole),
the dv path's with the delete set.  The wall-clock gap at sf0.1 is
modest because both pay the same probe scan; the bytes column is the
scale-invariant evidence.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _tree_bytes(root, sub=""):
    total = 0
    base = os.path.join(root, sub) if sub else root
    for dirpath, _, files in os.walk(base):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from nyc_crash_mapper_etl_script_spark.sources.txtable import (
        _DV_DIR,
        TxTable,
    )

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .appName("ab_dv_delete")
        .getOrCreate()
    )
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    )
    cond = F.col("l_orderkey") % 997 == 0  # ~0.1% of rows, spread wide

    results: dict[str, dict] = {}
    for variant in ("rewrite", "dv", "dv_then_read"):
        samples = []
        meta: dict = {}
        for _ in range(3):
            base = tempfile.mkdtemp(prefix=f"abdv_{variant}_")
            try:
                t = TxTable(os.path.join(base, "t"))
                t.init(li)
                t.compact(spark, target_mb=32)  # realistic few-file layout
                files_before = set(t._live_files())
                data_bytes = _tree_bytes(t.root) - _tree_bytes(
                    t.root, "_txlog"
                )
                t0 = time.perf_counter()
                t.delete_where(spark, cond, dv=(variant != "rewrite"))
                if variant == "dv_then_read":
                    t.read(spark).agg(F.count(F.lit(1))).collect()
                dt = time.perf_counter() - t0
                samples.append(dt)
                files_after = set(t._live_files())
                if variant == "rewrite":
                    written = sum(
                        os.path.getsize(os.path.join(t.root, f))
                        for f in files_after - files_before
                    )
                else:
                    written = _tree_bytes(t.root, _DV_DIR)
                meta = {
                    "table_data_bytes": data_bytes,
                    "bytes_written_by_delete": written,
                    "files_churned": len(files_before - files_after),
                    "rows_deleted": int(
                        li.where(cond).count()
                    ),
                }
            finally:
                shutil.rmtree(base, ignore_errors=True)
        results[variant] = {"sec_min3": round(min(samples), 3), **meta}

    out = {
        "sf_dir": SF_DIR,
        "predicate": "l_orderkey % 997 == 0 (~0.1% of rows)",
        "variants": results,
        "write_amplification_rewrite_over_dv": round(
            results["rewrite"]["bytes_written_by_delete"]
            / max(1, results["dv"]["bytes_written_by_delete"]),
            1,
        ),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_DV_AB.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
