"""Falsify/attribute the tx_stream_drain cost (r5 VERDICT item 5):
how much of the drain is OUR source vs Spark's per-query streaming
bootstrap?

Method: time three availableNow queries back to back in one session,
min-of-reps after a warm run --

  trivial : a do-nothing Python streaming source (empty partitions,
            zero rows) through the noop sink.  Everything it costs is
            harness: the per-query Python planner process spawn, the
            offset/commit WAL, query lifecycle.
  empty   : the txtable-changes source over an ALREADY-DRAINED offset
            range (starting_version == head) -- adds our planner
            (log read) to the floor, still zero rows.
  drain   : the bench's actual tx_stream_drain body (3 RMW commits,
            ~750k change rows, complete-mode rollup).

Writes BENCH_STREAM_FLOOR.json.  Finding (2026-08, this box): the
trivial source costs ~1.6 s/query -- the availableNow fallback runs
ONE micro-batch for the whole backlog (the Python DataSource API
cannot declare Trigger.AvailableNow support), so there is no
per-version overhead to coalesce; the floor is per-QUERY bootstrap,
which amortizes across micro-batches in any long-running consumer but
is paid in full by a one-shot drain benchmark.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, DataSourceStreamReader
from pyspark.sql.types import LongType, StructField, StructType

from nyc_crash_mapper_etl_script_spark.schemas import load_table
from nyc_crash_mapper_etl_script_spark.session import get_spark
from nyc_crash_mapper_etl_script_spark.sources.txstream import (
    CHANGE_COL,
    read_txtable_stream,
)
from nyc_crash_mapper_etl_script_spark.sources.txtable import TxTable


class _TrivialReader(DataSourceStreamReader):
    def initialOffset(self):
        return {"v": 0}

    def latestOffset(self):
        return {"v": 0}

    def partitions(self, start, end):
        return []

    def read(self, p):
        return iter(())

    def commit(self, end):
        pass


class TrivialStreamSource(DataSource):
    @classmethod
    def name(cls):
        return "trivial-stream"

    def schema(self):
        return StructType([StructField("x", LongType())])

    def streamReader(self, schema):
        return _TrivialReader()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    spark = get_spark("ab-stream-floor")
    spark.dataSource.register(TrivialStreamSource)

    base = tempfile.mkdtemp(prefix="abfloor_")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice"
    )
    upd = orders.where(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey", (F.col("o_totalprice") * 2).alias("o_totalprice")
    )
    t = TxTable(
        os.path.join(base, "orders_tx"),
        partition_by=["o_orderstatus"],
        retain_history=True,
    )
    t.init(orders)
    t.merge_update(upd, "o_orderkey", set_cols=["o_totalprice"])
    t.delete_where(spark, F.col("o_orderkey") % 97 == 0)
    head = t._snapshot_version()

    def run(df_builder) -> float:
        ck = tempfile.mkdtemp(prefix="ck_", dir=base)
        t0 = time.time()
        q = (
            df_builder()
            .option("checkpointLocation", os.path.join(ck, "c"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return time.time() - t0

    variants = {
        "trivial": lambda: (
            spark.readStream.format("trivial-stream").load()
            .writeStream.format("noop")
        ),
        "empty": lambda: (
            read_txtable_stream(spark, t.root, starting_version=head)
            .writeStream.format("noop")
        ),
        "drain": lambda: (
            read_txtable_stream(spark, t.root)
            .groupBy("o_orderstatus", CHANGE_COL)
            .agg(F.count("*").alias("rows"))
            .writeStream.format("noop")
            .outputMode("complete")
        ),
    }
    for fn in variants.values():  # warm pass
        run(fn)
    samples = {
        name: [round(run(fn), 3) for _ in range(reps)]
        for name, fn in variants.items()
    }
    doc = {
        "sf_dir": sf_dir,
        "reps": reps,
        "samples": samples,
        "min": {k: min(v) for k, v in samples.items()},
        "note": (
            "trivial = Spark per-query Python-streaming bootstrap floor; "
            "drain - trivial = the txtable-changes source's actual work "
            "(single micro-batch: availableNow falls back to one batch)"
        ),
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_STREAM_FLOOR.json",
    )
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(doc["min"]))

    import shutil

    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
