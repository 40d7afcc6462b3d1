"""Windowed streaming aggregation with late-data handling.

The reference maintains its rollups (per-intersection crash counts,
main.py:618-647; daily ingest volumes logged at main.py:100-295) by
full recomputation every night.  Streamed, the same rollup is a
watermarked windowed aggregate: counts per (key, event-time window)
update as rows arrive, late rows within the watermark revise their
window, and rows later than the watermark are dropped — the exact
semantic the reference approximates with its 2-month re-fetch loop
(main.py:29, 85).

State size is bounded by (keys x open windows); the watermark closes
windows, so at 100 TB/day state holds only the trailing
watermark-width of windows per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    stream: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "1 day",
    watermark: str = "3 days",
    value_col: str | None = None,
) -> DataFrame:
    """Per-key event-time-window rollup over a streaming DataFrame.

    Emits (window_start, window_end, key, n[, total]) in update mode;
    with ``trigger(availableNow=True)`` + append it drains closed
    windows batch-style."""
    aggs: list[Column] = [F.count("*").alias("n")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("total"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            *(["n"] if value_col is None else ["n", "total"]),
        )
    )
