"""Late-arriving-data reconciliation (reference §2.9 C2/C3).

C2 -- tally reconciliation (main.py:817-965): re-fetch the trailing
90-day window of source rows whose ``:updated_at`` date is later than
``:created_at``; compare the 8 injury/fatality tally columns against
the warehouse; update mismatches.  The reference NULLs downstream
blame columns to force recompute (main.py:949); functionally we just
recompute them (blame.py is deterministic).

C3 -- geometry reconciliation (main.py:968-1079): same window; a row
needs update when the point is new, or moved more than 15 m by the
reference's integer haversine (threshold main.py:1039).

Scale: snapshot⋈source is one shuffle on the key; the update-window
side is tiny (90 days of updates) -> broadcast it, zero shuffle of the
fact table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.functions.geo import haversine_m

#: meters a point must move before we call it an update (main.py:1039)
GEOM_MOVE_THRESHOLD_M = 15

TALLY_COLS = [
    "number_of_motorist_injured",
    "number_of_motorist_killed",
    "number_of_cyclist_injured",
    "number_of_cyclist_killed",
    "number_of_pedestrian_injured",
    "number_of_pedestrian_killed",
    "number_of_persons_injured",
    "number_of_persons_killed",
]


def _any_differs(src_prefix: str, tgt_prefix: str, cols: list[str]) -> Column:
    pred = F.lit(False)
    for c in cols:
        s, t = F.col(f"{src_prefix}.{c}"), F.col(f"{tgt_prefix}.{c}")
        pred = pred | (~s.eqNullSafe(t))
    return pred


def tally_mismatches(
    source: DataFrame, snapshot: DataFrame, key: str, tally_cols: list[str] | None = None
) -> DataFrame:
    """Keys + fresh tallies for rows whose any-of-8 tallies differ
    (main.py:906-943).  ``source`` rows carry the new truth."""
    cols = tally_cols or TALLY_COLS
    s = source.alias("s")
    t = snapshot.alias("t")
    j = s.join(t, F.col(f"s.{key}") == F.col(f"t.{key}"), "inner")
    return j.where(_any_differs("s", "t", cols)).select(
        F.col(f"s.{key}").alias(key), *[F.col(f"s.{c}").alias(c) for c in cols]
    )


def apply_tally_updates(snapshot: DataFrame, updates: DataFrame, key: str,
                        tally_cols: list[str] | None = None) -> DataFrame:
    """Functional UPDATE: overwrite the tally columns for matched keys
    (S9 row-UPDATE sink reformulated as join+coalesce)."""
    cols = tally_cols or TALLY_COLS
    renamed = updates.select(
        F.col(key), *[F.col(c).alias(f"__new_{c}") for c in cols]
    )
    out = snapshot.join(renamed, key, "left")
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.col(f"__new_{c}"), F.col(c)))
    return out.drop(*[f"__new_{c}" for c in cols])


def moved_geoms(
    source: DataFrame,
    snapshot: DataFrame,
    key: str,
    src_lng: str = "longitude",
    src_lat: str = "latitude",
    tgt_lng: str = "longitude",
    tgt_lat: str = "latitude",
    threshold_m: int = GEOM_MOVE_THRESHOLD_M,
) -> DataFrame:
    """Keys whose point is new (target NULL, source present) or moved
    > threshold meters by the reference-faithful integer haversine
    (main.py:1033-1056).  Returns key, new lng/lat, move distance."""
    s, t = source.alias("s"), snapshot.alias("t")
    j = s.join(t, F.col(f"s.{key}") == F.col(f"t.{key}"), "inner")
    dist = haversine_m(
        F.col(f"s.{src_lng}"), F.col(f"s.{src_lat}"),
        F.col(f"t.{tgt_lng}"), F.col(f"t.{tgt_lat}"),
    )
    is_new = (
        F.col(f"t.{tgt_lng}").isNull() & F.col(f"s.{src_lng}").isNotNull()
    )
    return j.where(is_new | (dist > threshold_m)).select(
        F.col(f"s.{key}").alias(key),
        F.col(f"s.{src_lng}").alias("new_lng"),
        F.col(f"s.{src_lat}").alias("new_lat"),
        F.coalesce(dist, F.lit(-1)).alias("moved_m"),
    )
