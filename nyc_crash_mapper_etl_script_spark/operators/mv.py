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
