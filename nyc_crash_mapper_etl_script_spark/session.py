"""SparkSession factory.

Local test/bench runs use ``local[$SPARK_GRAFT_CPUS]``; on a real
cluster the same conf block applies unchanged (AQE re-plans joins and
coalesces shuffle partitions at runtime, so the static
``shuffle.partitions`` value is a ceiling, not a tuning knob the user
must touch per scale factor).

Scale notes (100 TB design targets):
 - AQE on: runtime join-strategy switches (broadcast when a side turns
   out small), skew-join splitting, partition coalescing.
 - ``maxPartitionBytes`` 128m keeps scan tasks right-sized; at 100 TB
   that is ~800k input tasks, which Spark schedules fine.
 - Arrow enabled for the few pandas-UDF operators (multimodal, ANN).
 - Session timezone pinned UTC so timestamp semantics match the
   reference (CARTO stored timestamptz in UTC; main.py:178,281) and
   the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP = "nyc-crash-mapper-spark"


def tuned_builder(app_name: str = DEFAULT_APP) -> SparkSession.Builder:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if not os.environ.get("SPARK_MASTER_URL"):
        builder = builder.master(f"local[{cpus}]")
    return builder


def get_spark(app_name: str = DEFAULT_APP) -> SparkSession:
    """Get or create the tuned session (idempotent)."""
    return tuned_builder(app_name).getOrCreate()
