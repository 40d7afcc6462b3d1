"""A/B the r2 sim_ivf_topk changes in isolation (VERDICT r2 item 1).

Each variant builds a fresh plan and executes via the noop sink,
min-of-3 after one warm pass -- identical methodology to bench.py.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.session import get_spark
from nyc_crash_mapper_etl_script_spark.operators.similarity import ivf_topk

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("ab-ivf")
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def build(hash_fn, assign_impl):
        q = e.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )
        return ivf_topk(
            e, q, k=5, n_cells=8, n_probe=2, hash_fn=hash_fn, assign_impl=assign_impl
        )

    variants = {
        "r2_current(md5,arrow)": lambda: build("md5", "arrow"),
        "xxhash64,arrow": lambda: build("xxhash64", "arrow"),
        "md5,column": lambda: build("md5", "column"),
        "xxhash64,column": lambda: build("xxhash64", "column"),
    }
    for name, f in variants.items():
        f().write.format("noop").mode("overwrite").save()  # warm
        ts = []
        for _ in range(3):
            t_decl0 = time.time()
            df = f()
            decl = time.time() - t_decl0
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        print(f"{name}: exec min={min(ts):.3f} all={[round(t,3) for t in ts]} decl={decl:.3f}")


if __name__ == "__main__":
    main()
