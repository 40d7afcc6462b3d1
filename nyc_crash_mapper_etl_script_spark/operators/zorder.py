"""Z-order (Morton-curve) clustering for multi-column data skipping.

At 100 TB the cheapest query is the one that never reads the file: a
range sort clusters ONE column's min/max per file, but a filter on
any other column still touches everything.  Interleaving the bits of
two quantized key columns (the Morton / Z-curve) makes files tight in
BOTH dimensions at once, so parquet footer min/max prune on either
predicate -- the standard clustering layout behind Delta/Iceberg
``OPTIMIZE ZORDER BY``, built here from plain Column bit arithmetic
(codegen, no UDF) plus ``repartitionByRange`` + in-partition sort.

Quantization uses the columns' global min/max (a broadcast 1-row
aggregate): each value maps to a ``bits``-wide integer rank, and the
z-value interleaves x's bit i into position 2i+1 and y's into 2i.
Everything is deterministic integer math, so the z-value itself is
oracle-replayable in ANSI SQL.

Reference parity: the reference's CARTO tables rely on warehouse-side
spatial indexes (main.py's the_geom queries); this is the
Spark-native analog for lat/lng (or any 2-key) workloads: cluster the
parquet by z(lng, lat) and bbox scans read a sliver of files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["quantize", "interleave_bits", "zorder_value", "cluster_write"]


def quantize(col: Column, vmin: Column, vmax: Column, bits: int) -> Column:
    """Rank a value into [0, 2^bits): floor((v - min) / span * 2^bits),
    clamped so v == max lands in the top bucket.  Degenerate span
    (min == max) maps everything to 0."""
    span = vmax - vmin
    scaled = F.floor(
        (col.cast("double") - vmin) / span * F.lit(float(1 << bits))
    ).cast("long")
    return F.when(span > 0, F.least(scaled, F.lit((1 << bits) - 1))).otherwise(
        F.lit(0).cast("long")
    )


def interleave_bits(qx: Column, qy: Column, bits: int) -> Column:
    """Morton interleave of two ``bits``-wide ints: x's bit i goes to
    position 2i+1, y's to 2i.  An unrolled sum of masked shifts --
    2*bits codegen'd integer terms, no loop at runtime."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(qx, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        z = z + F.shiftleft(F.shiftright(qy, i).bitwiseAND(F.lit(1)), 2 * i)
    return z


def zorder_value(
    df: DataFrame, x_col: str, y_col: str, bits: int = 16, out_col: str = "zv"
) -> DataFrame:
    """Append the z-value of (x, y) quantized against their global
    min/max (one broadcast 1-row aggregate; NULL coords get z = -1 so
    they cluster together at the front)."""
    ext = df.agg(
        F.min(x_col).alias("__xmin"),
        F.max(x_col).alias("__xmax"),
        F.min(y_col).alias("__ymin"),
        F.max(y_col).alias("__ymax"),
    )
    qx = quantize(F.col(x_col), F.col("__xmin"), F.col("__xmax"), bits)
    qy = quantize(F.col(y_col), F.col("__ymin"), F.col("__ymax"), bits)
    zv = F.when(
        F.col(x_col).isNull() | F.col(y_col).isNull(), F.lit(-1).cast("long")
    ).otherwise(interleave_bits(qx, qy, bits))
    return (
        df.crossJoin(F.broadcast(ext))
        .withColumn(out_col, zv)
        .drop("__xmin", "__xmax", "__ymin", "__ymax")
    )


def cluster_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write parquet clustered by z(x, y): range-partition on the
    z-value (contiguous curve segments per file -- tight min/max
    boxes in both dimensions) and sort within each partition so row
    groups prune too.  The z column itself is written, so readers can
    range-filter on it directly for box queries."""
    zorder_value(df, x_col, y_col, bits).repartitionByRange(
        n_files, "zv"
    ).sortWithinPartitions("zv").write.mode("overwrite").parquet(path)
