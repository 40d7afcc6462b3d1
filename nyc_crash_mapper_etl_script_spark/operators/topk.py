"""Top-k and per-group top-n (reference §2.5 W1, §2.6 O3).

O3 -- the materialized view ``ORDER BY crashcount DESC LIMIT 500``
(highcrash_intersections/refresh_intersections_highestcrashes.py:41,
K=500 at :24).  ``orderBy().limit()`` compiles to Spark's
TakeOrderedAndProject: per-partition heaps + a driver merge of k rows
-- no global sort, no shuffle of the full table.  That plan is exactly
right at 100 TB (k rows per partition flow to the driver).

W1 -- first-5-images-per-obstruction pivoted to ``image1..image5``
(walkmapper/mysql2carto.py:164-201, done row-by-row in Python there
because MySQL 5 lacks window functions).  Here: row_number window +
conditional-first pivot, one shuffle on the partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k(df: DataFrame, order_col: str, k: int, *tiebreak: str,
          ascending: bool = False) -> DataFrame:
    """Global top-k with deterministic tie-breaking."""
    order = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    order += [F.col(c).asc() for c in tiebreak]
    return df.orderBy(*order).limit(k)


def per_group_top_n_pivot(
    df: DataFrame,
    group_col: str,
    order_col: str | list[str],
    value_col: str,
    n: int = 5,
    out_prefix: str = "item",
    bounded_groups: bool = True,
) -> DataFrame:
    """Per group: first n values by order_col(s) spread into
    ``{out_prefix}1..{out_prefix}n`` columns (W1).

    ``bounded_groups=True`` (default): ONE hash aggregate —
    ``slice(sort_array(collect_list(struct(order..., value))), 1, n)``
    — a single shuffle with map-side partial aggregation and no sort
    of the full table.  Right whenever group size is bounded (images
    per obstruction ≤ dozens, lineitems per order ≤ 7).

    ``bounded_groups=False``: row_number window + conditional pivot
    (two shuffles, but rows stream through the sort) — the safe plan
    when one group could hold millions of rows and a collected list
    would not fit in task memory.

    Pass a fully-deterministic ordering (unique within group) or the
    column assignment is arbitrary."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    if bounded_groups:
        # when the value is itself one of the ordering columns, read
        # it back from that struct field instead of shipping a
        # duplicate __v field through the shuffle (w1 orders by
        # (linenumber, partkey, suppkey) and emits partkey -- the
        # dedup trims a quarter of the per-row shuffle payload)
        if value_col in order_cols:
            vfield = f"__o{order_cols.index(value_col)}"
            skey = F.struct(
                *[F.col(c).alias(f"__o{j}") for j, c in enumerate(order_cols)]
            )
        else:
            vfield = "__v"
            skey = F.struct(
                *[F.col(c).alias(f"__o{j}") for j, c in enumerate(order_cols)],
                F.col(value_col).alias("__v"),
            )
        agged = df.groupBy(group_col).agg(
            F.slice(F.sort_array(F.collect_list(skey)), 1, n).alias("__top")
        )
        return agged.select(
            group_col,
            *[
                # try_: NULL past the end of a short group (ANSI mode)
                F.try_element_at(F.col("__top"), F.lit(i))[vfield].alias(
                    f"{out_prefix}{i}"
                )
                for i in range(1, n + 1)
            ],
        )
    from nyc_crash_mapper_etl_script_spark.functions.scratch import reserve

    reserve(df, "__rn")
    w = Window.partitionBy(group_col).orderBy(*[F.col(c).asc() for c in order_cols])
    ranked = df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= n)
    aggs = [
        F.max(F.when(F.col("__rn") == i, F.col(value_col))).alias(f"{out_prefix}{i}")
        for i in range(1, n + 1)
    ]
    return ranked.groupBy(group_col).agg(*aggs)
