"""Incremental materialized-view maintenance.

The reference rebuilds its materialized view from scratch
(``CREATE TABLE .. AS SELECT``, main.py:1046-1115, ~10 min per
refresh); for an additive aggregate (COUNT / SUM) the delta-refresh
identity ``MV' = combine(MV, agg(delta))`` turns that into
O(batch) work: aggregate only the new rows, full-outer-join onto the
current MV on the group key, and add.  At 100 TB the delta agg is a
map-side-combined shuffle of the BATCH (not the corpus), and the
combine join shuffles only group keys -- bounded by the dimension
cardinality, not the fact table.

Groups can only appear or grow here (counts/sums of appends);
retractions (deletes) would need the signed-delta generalization,
which composes the same way with negative contributions.

The oracle twin for this operator is deliberately the FULL
recompute: incremental maintenance is correct exactly when it is
indistinguishable from rebuilding, which is the property worth
pinning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def refresh_additive_mv(
    mv: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    count_col: str = "n",
    sum_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Combine a current MV (grouped counts/sums) with a raw delta
    batch.  ``sum_cols`` maps MV sum-column name -> delta source
    column.  Output schema == MV schema."""
    sum_cols = sum_cols or {}
    delta_agg = delta.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(count_col),
        *[F.sum(src).alias(dst) for dst, src in sum_cols.items()],
    )
    m, d = mv.alias("m"), delta_agg.alias("d")
    # eqNullSafe join keys: groupBy treats NULL as a group, but a
    # plain equi full-outer never matches NULL==NULL, so a NULL group
    # present on both sides would come out as TWO rows where a full
    # rebuild makes one.
    cond = None
    for c in group_cols:
        term = F.col(f"m.{c}").eqNullSafe(F.col(f"d.{c}"))
        cond = term if cond is None else (cond & term)
    merged = m.join(d, on=cond, how="full_outer")
    metric_cols = [count_col, *sum_cols]
    return merged.select(
        *[
            F.coalesce(F.col(f"m.{c}"), F.col(f"d.{c}")).alias(c)
            for c in group_cols
        ],
        *[
            # NULL-sum preservation: a group whose sum inputs are all
            # NULL must stay NULL (what a fresh groupBy produces), so
            # only coalesce-to-0 when at least one side contributed a
            # non-NULL value -- keeps the incremental==rebuild
            # contract exact
            F.when(
                F.col(f"m.{c}").isNull() & F.col(f"d.{c}").isNull(),
                F.lit(None),
            )
            .otherwise(
                F.coalesce(F.col(f"m.{c}"), F.lit(0))
                + F.coalesce(F.col(f"d.{c}"), F.lit(0))
            )
            .alias(c)
            for c in metric_cols
        ],
    )


def refresh_signed_mv(
    mv: DataFrame,
    inserts: DataFrame,
    deletes: DataFrame,
    group_cols: list[str],
    count_col: str = "n",
    sum_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Signed-delta MV maintenance: the retraction generalization of
    :func:`refresh_additive_mv`.  ``inserts``/``deletes`` are raw fact
    rows (e.g. a table format's change feed -- ``TxTable.changes``
    splits exactly this way); inserts contribute +1/+x, deletes -1/-x,
    and a group whose count reaches zero disappears, so ANY
    insert/update/delete workload maintains the view incrementally --
    O(changed rows), never O(table).

    Exact NULL-sum parity with a full rebuild needs one extra piece of
    state per sum column: the count of NON-NULL contributions
    (``__nn_<col>``), because "sum is 0" and "sum over zero non-NULL
    inputs" are indistinguishable from the running sum alone.  The MV
    therefore carries those bookkeeping columns; project them away (or
    build the public view) with :func:`signed_mv_view`.  Initialize
    with ``signed_mv_init``.
    """
    sum_cols = sum_cols or {}

    def tagged(df: DataFrame, sgn: int) -> DataFrame:
        return df.select(
            *group_cols,
            F.lit(sgn).cast("long").alias("__sgn"),
            *[F.col(src).alias(f"__v_{dst}") for dst, src in sum_cols.items()],
        )

    delta = tagged(inserts, 1).unionByName(tagged(deletes, -1))
    aggs = [F.sum("__sgn").alias(count_col)]
    for dst in sum_cols:
        v = F.col(f"__v_{dst}")
        aggs.append(F.sum(F.col("__sgn") * F.coalesce(v, F.lit(0))).alias(dst))
        aggs.append(
            F.sum(F.when(v.isNotNull(), F.col("__sgn")).otherwise(F.lit(0))).alias(
                f"__nn_{dst}"
            )
        )
    delta_agg = delta.groupBy(*group_cols).agg(*aggs)

    m, d = mv.alias("m"), delta_agg.alias("d")
    cond = None
    for c in group_cols:
        term = F.col(f"m.{c}").eqNullSafe(F.col(f"d.{c}"))
        cond = term if cond is None else (cond & term)
    merged = m.join(d, on=cond, how="full_outer")

    def both(c):
        return (
            F.coalesce(F.col(f"m.{c}"), F.lit(0)) + F.coalesce(F.col(f"d.{c}"), F.lit(0))
        )

    metric_cols = [count_col] + [x for dst in sum_cols for x in (dst, f"__nn_{dst}")]
    out = merged.select(
        *[F.coalesce(F.col(f"m.{c}"), F.col(f"d.{c}")).alias(c) for c in group_cols],
        *[both(c).alias(c) for c in metric_cols],
    )
    return out.where(F.col(count_col) > 0)


def signed_mv_init(
    facts: DataFrame,
    group_cols: list[str],
    count_col: str = "n",
    sum_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Build the augmented MV (counts + raw sums + non-NULL counts)
    from a full fact scan -- the bootstrap for refresh_signed_mv."""
    sum_cols = sum_cols or {}
    aggs = [F.count(F.lit(1)).alias(count_col)]
    for dst, src in sum_cols.items():
        aggs.append(F.sum(F.coalesce(F.col(src), F.lit(0))).alias(dst))
        aggs.append(
            F.count(F.col(src)).alias(f"__nn_{dst}")  # count skips NULLs
        )
    return facts.groupBy(*group_cols).agg(*aggs)


def signed_mv_view(
    mv: DataFrame,
    group_cols: list[str],
    count_col: str = "n",
    sum_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Public projection of the augmented MV: sums surface NULL when
    the group holds zero non-NULL inputs (exactly what a fresh
    groupBy produces), bookkeeping columns dropped."""
    sum_cols = sum_cols or {}
    return mv.select(
        *group_cols,
        F.col(count_col),
        *[
            F.when(F.col(f"__nn_{dst}") > 0, F.col(dst)).alias(dst)
            for dst in sum_cols
        ],
    )
