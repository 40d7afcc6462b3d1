"""Rolling time-range window aggregates.

``rolling_time_agg`` computes, for every event, aggregates over that
key's events in the trailing ``window_seconds`` (inclusive both
ends) -- the standard "activity in the last hour" feature.  Spark
shape: ONE shuffle on the key; the frame is ``rangeBetween`` over an
integer epoch-microsecond ordering column (Spark range frames need a
numeric order), which is exact at microsecond resolution and
replayable as ``RANGE BETWEEN INTERVAL .. PRECEDING`` in ANSI/DuckDB.

Range frames (unlike row frames) treat tied timestamps as one group
on both engines, so results are deterministic without a tiebreak.

At 100 TB the cost model is the same as sessionize: hash exchange on
the key, per-partition sort, linear scan with a sliding two-pointer
frame -- no O(n^2) re-aggregation (Spark's window exec maintains the
sliding frame incrementally for sum/count/min/max).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def rolling_time_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    window_seconds: int,
    aggs: dict[str, Column],
) -> DataFrame:
    """Append trailing-window aggregate columns to every row.

    ``aggs`` maps output column name -> aggregate Column over the
    frame (e.g. ``{"n_1h": F.count(F.lit(1)), "sum_1h":
    F.sum("value")}``).
    """
    from nyc_crash_mapper_etl_script_spark.functions.scratch import reserve

    reserve(df, "__us")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    df = df.withColumn("__us", us)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("__us").asc())
        .rangeBetween(-int(window_seconds) * 1_000_000, 0)
    )
    out = df
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(w))
    return out.drop("__us")
