"""Slowly-changing-dimension (type 2) history from a change log.

The reference keeps only current state (CARTO rows updated in place,
main.py:944-960 UPDATE path); a warehouse consumer of the same feed
usually wants the full validity history instead.  ``scd2_history``
builds it from an append-only change log in one pass: per key, order
changes by (ts, tiebreak) and close each version with ``lead(ts)``.

One shuffle on the key (the window partition), pure codegen -- the
canonical Spark shape for SCD2 when the input is already a log.
Change-capture from snapshot pairs (the harder case) is the existing
CDC operator (operators/cdc.py); composing classify() -> scd2_history
gives snapshot-to-history.

Collapse of consecutive duplicate states (``collapse_runs=True``)
drops a change row whose tracked state equals the previous row's
state for the same key, so validity ranges describe *distinct* states
-- done with one lag() inside the same window shuffle, then a second
lead() pass after the filter (same partitioning, no extra exchange:
Catalyst reuses the hash partitioning across both windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    log: DataFrame,
    key_col: str,
    ts_col: str,
    state_cols: list[str],
    tiebreak_col: str | None = None,
    collapse_runs: bool = True,
) -> DataFrame:
    """Versioned history: one row per (key, state version) with
    ``valid_from`` / ``valid_to`` (NULL = still current),
    ``version_seq`` (1-based per key) and ``is_current``."""
    from nyc_crash_mapper_etl_script_spark.functions.scratch import reserve

    reserve(log, "__prev_state", "__rn_first")
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(key_col).orderBy(*order)

    df = log
    if collapse_runs:
        state = F.struct(*[F.col(c) for c in state_cols])
        # eqNullSafe, not "!=": with a NULL state column, plain struct
        # inequality evaluates to NULL and the row would be dropped as
        # a "duplicate" -- i.e. a tracked change TO NULL would vanish
        # from the history.  The lag() itself is NULL only for each
        # key's first row, which eqNullSafe handles without a separate
        # isNull branch (first row never equals a NULL lag unless the
        # state itself is all-NULL -- and an all-NULL first state is
        # still a version, so guard it explicitly).
        prev = F.lag(state).over(w)
        df = (
            df.withColumn("__prev_state", prev)
            .withColumn("__rn_first", F.row_number().over(w))
            .where(
                (F.col("__rn_first") == 1)
                | ~state.eqNullSafe(F.col("__prev_state"))
            )
            .drop("__prev_state", "__rn_first")
        )

    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(F.col(ts_col)).over(w))
        .withColumn("version_seq", F.row_number().over(w).cast("long"))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(
            key_col,
            *state_cols,
            "valid_from",
            "valid_to",
            "version_seq",
            "is_current",
        )
    )
