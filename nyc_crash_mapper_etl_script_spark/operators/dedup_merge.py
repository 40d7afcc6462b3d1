"""Dedup-insert merge (reference §2.3 J1/J3, §2.1 S8).

The reference inserts staged rows whose key is absent from the fact
table via ``INSERT ... SELECT ... WHERE socrata_id NOT IN (SELECT
socrata_id FROM target WHERE socrata_id IS NOT NULL)``
(main.py:301-375, esp. 368-371) after a client-side set pre-filter
(main.py:200-203).  Both collapse to one left-anti join here.

Scale: the anti-join shuffles both sides on the key unless the new
batch is small -- it always is in the nightly pattern (200-500 rows vs
1.5M, main.py:82), so we broadcast the *staged* side and Spark turns
it into a broadcast anti-join probe over the fact table with zero
shuffle of the big side.  At 100 TB the same plan holds: the daily
increment stays tiny relative to the base.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def new_rows(staged: DataFrame, existing: DataFrame, key: str) -> DataFrame:
    """Staged rows whose ``key`` is not already present (NULL-keyed
    existing rows ignored, matching ``socrata_id IS NOT NULL`` at
    main.py:370).

    NULL-keyed *staged* rows are dropped too: the reference's
    ``socrata_id NOT IN (...)`` evaluates to NULL (never TRUE) for a
    NULL left key against a non-empty key set, so such rows never
    insert.  A bare left_anti would instead keep them (NULL never
    matches), silently diverging on dirty feeds — filter first so
    Spark, the reference, and the SQL oracle agree on every input."""
    existing_keys = existing.select(key).where(F.col(key).isNotNull()).distinct()
    return (
        staged.where(F.col(key).isNotNull())
        .join(existing_keys, on=key, how="left_anti")
    )


def dedup_merge(staged: DataFrame, existing: DataFrame, key: str) -> DataFrame:
    """Existing table + only-new staged rows (idempotent: re-running
    with the same staged batch adds 0 rows)."""
    return existing.unionByName(
        new_rows(staged, existing, key), allowMissingColumns=True
    )
