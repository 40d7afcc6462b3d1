"""Decompose sim_ivf_topk execution cost stage-by-stage."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.session import get_spark
from nyc_crash_mapper_etl_script_spark.operators import similarity as S

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timeit(name, f):
    f().write.format("noop").mode("overwrite").save()
    ts = []
    for _ in range(3):
        df = f()
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.time() - t0)
    print(f"{name}: min={min(ts):.3f} all={[round(t,3) for t in ts]}")


def lit_centroids(spark, rows, vec_type):
    structs = [
        F.struct(
            F.lit(int(r["cell_id"])).cast("int").alias("cell_id"),
            F.array(*[F.lit(float(x)) for x in r["cv"]]).cast(vec_type).alias("cv"),
        )
        for r in rows
    ]
    return spark.range(1).select(F.inline(F.array(*structs)))


def main() -> None:
    spark = get_spark("ab-ivf2")
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vec_type = e.schema["embedding"].dataType.simpleString()

    cents_df = S.select_centroids(e, 8, hash_fn="xxhash64")
    rows = cents_df.orderBy("cell_id").collect()
    cents_lit = lit_centroids(spark, rows, vec_type)

    def q():
        return e.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )

    # (a) assignment alone, arrow impl, literal centroids
    timeit("assign_only(arrow)", lambda: S.ivf_assign(e, cents_lit, impl="arrow"))
    # (b) probes alone
    timeit("probes_only", lambda: S._probe_cells(q(), cents_lit, 2))
    # (c) full with literal centroids
    def full():
        assigned = S.ivf_assign(e, cents_lit, impl="arrow")
        probes = S._probe_cells(q(), cents_lit, 2)
        return S._score_probed(assigned, probes, 5)
    timeit("full(lit cents)", full)
    # (d) full with createDataFrame cents (current impl)
    cents_cdf = spark.createDataFrame(rows, cents_df.schema)
    def full_cdf():
        assigned = S.ivf_assign(e, cents_cdf, impl="arrow")
        probes = S._probe_cells(q(), cents_cdf, 2)
        return S._score_probed(assigned, probes, 5)
    timeit("full(createDataFrame cents)", full_cdf)
    # (e) full with raw subtree cents (r1 shape)
    def full_sub():
        assigned = S.ivf_assign(e, cents_df, impl="arrow")
        probes = S._probe_cells(q(), cents_df, 2)
        return S._score_probed(assigned, probes, 5)
    timeit("full(subtree cents)", full_sub)
    # (f) shuffle partitions influence: final window with fewer partitions
    print("shuffle.partitions =", spark.conf.get("spark.sql.shuffle.partitions"))


if __name__ == "__main__":
    main()
