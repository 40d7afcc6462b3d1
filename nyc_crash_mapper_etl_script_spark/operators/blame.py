"""Blame allocation (reference §2.8 F3/F4, main.py:650-790).

The reference runs three chained UPDATE statements ("up to ~15 min"
server-side, main.py:1189).  Here the whole cascade is a single
narrow projection -- ~75 Column expressions evaluated in one
whole-stage-codegen pass over the fact table; no shuffle at all.

Stage 1 (main.py:658-701):
  * ``hasvehicle_other_unspecified`` = TRUE when no flag set, else
    ``hasvehicle_other``
  * ``bike_blame`` = (bicycle|scooter) present and no motor vehicle
  * ``blame_factor`` = 1 / #blameable-vehicles (NULLIF-guarded -> NULL
    propagates when the denominator is 0)
Stage 2 (main.py:702-713): per-mode ``*_allocated`` = blame_factor *
  tally; ``persons_*`` uses the SUM of the three mode tallies, not the
  source persons column.
Stage 3 (main.py:714-789): 64-way spread ``<mode>_<outcome>_by<veh>``
  -- bike/scooter gated on ``bike_blame``, ``byother`` gated on
  ``hasvehicle_other_unspecified``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MOTOR_FLAGS = [
    "hasvehicle_motorcycle",
    "hasvehicle_busvan",
    "hasvehicle_car",
    "hasvehicle_suv",
    "hasvehicle_truck",
    "hasvehicle_other",
]
ALL_FLAGS = ["hasvehicle_bicycle"] + ["hasvehicle_scooter"] + MOTOR_FLAGS

#: by-vehicle spread: output suffix -> (gate flag, needs bike_blame)
BY_VEHICLE = {
    "bike": ("hasvehicle_bicycle", True),
    "scooter": ("hasvehicle_scooter", True),
    "motorcycle": ("hasvehicle_motorcycle", False),
    "busvan": ("hasvehicle_busvan", False),
    "car": ("hasvehicle_car", False),
    "suv": ("hasvehicle_suv", False),
    "truck": ("hasvehicle_truck", False),
    "other": ("hasvehicle_other_unspecified", False),
}

MODE_TALLY = {
    "cyclist": ("number_of_cyclist_injured", "number_of_cyclist_killed"),
    "motorist": ("number_of_motorist_injured", "number_of_motorist_killed"),
    "pedestrian": ("number_of_pedestrian_injured", "number_of_pedestrian_killed"),
}


def _i(name: str) -> Column:
    """bool flag -> 0/1 int, NULL treated as unset (the reference's
    ``::int`` on a NULL yields NULL and the sum-comparison ``= 0``
    then fails; flags are always written before blame runs, but be
    defensive and treat NULL as 0)."""
    return F.coalesce(F.col(name).cast("int"), F.lit(0))


def allocate_blame(
    df: DataFrame,
    only_null: bool = True,
    extra_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """Append/overwrite the 2+8+64 blame columns.

    ``only_null=True`` honors the reference's incremental guards
    (``WHERE hasvehicle_other_unspecified IS NULL`` etc.,
    main.py:700,712,788): rows already blamed keep their values.

    ``extra_cols`` folds upstream column definitions (the vehicle
    flags from ``enrichment.vehicle_flag_exprs``) into stage 1's OWN
    projection: stage-1 expressions inline the provided expressions
    wherever they read those columns, saving the composed nightly DAG
    a whole Catalyst analysis pass over the wide tree; codegen's
    subexpression elimination keeps runtime cost identical.
    """
    extra_cols = extra_cols or {}

    def fref(name: str) -> Column:
        # a column being (re)defined in this same projection must be
        # read through its defining expression, not the stale input
        return extra_cols.get(name, F.col(name))

    def _i(name: str) -> Column:
        return F.coalesce(fref(name).cast("int"), F.lit(0))

    motor_sum = sum([_i(c) for c in MOTOR_FLAGS[:-1]], _i("hasvehicle_other"))
    all_sum = sum([_i(c) for c in ALL_FLAGS[1:]], _i(ALL_FLAGS[0]))
    bike_or_scooter = (
        F.coalesce(fref("hasvehicle_bicycle"), F.lit(False))
        | F.coalesce(fref("hasvehicle_scooter"), F.lit(False))
    )

    other_unspec = F.when(all_sum == 0, F.lit(True)).otherwise(fref("hasvehicle_other"))
    bike_blame = F.when(bike_or_scooter & (motor_sum == 0), F.lit(True)).otherwise(
        F.lit(False)
    )
    bike_denom = F.nullif(
        (_i("hasvehicle_bicycle") + _i("hasvehicle_scooter")).cast("double"), F.lit(0.0)
    )
    # the +1 accounts for other_unspecified having just been set TRUE
    # when nothing else was flagged (main.py:688-698)
    motor_denom = F.nullif(
        (motor_sum + F.when(all_sum == 0, F.lit(1)).otherwise(F.lit(0))).cast("double"),
        F.lit(0.0),
    )
    blame_factor = F.when(
        bike_or_scooter & (motor_sum == 0), F.lit(1.0) / bike_denom
    ).otherwise(F.lit(1.0) / motor_denom)

    def guarded(name: str, expr: Column, guard: Column) -> Column:
        if only_null and name in df.columns:
            return F.when(guard, expr).otherwise(F.col(name))
        return expr

    # stage-1 guard: WHERE hasvehicle_other_unspecified IS NULL
    g1 = (
        F.col("hasvehicle_other_unspecified").isNull()
        if "hasvehicle_other_unspecified" in df.columns and only_null
        else F.lit(True)
    )
    out = df.withColumns(
        {
            **extra_cols,
            "hasvehicle_other_unspecified": guarded(
                "hasvehicle_other_unspecified", other_unspec, g1
            ),
            "bike_blame": guarded("bike_blame", bike_blame, g1),
            "blame_factor": guarded("blame_factor", blame_factor, g1),
        }
    )

    # stage 2: WHERE persons_injured_allocated IS NULL
    g2 = (
        F.col("persons_injured_allocated").isNull()
        if "persons_injured_allocated" in out.columns and only_null
        else F.lit(True)
    )
    bf = F.col("blame_factor")
    alloc = {}
    for mode, (inj, kil) in MODE_TALLY.items():
        alloc[f"{mode}_injured_allocated"] = bf * F.col(inj)
        alloc[f"{mode}_killed_allocated"] = bf * F.col(kil)
    alloc["persons_injured_allocated"] = bf * (
        F.col("number_of_pedestrian_injured")
        + F.col("number_of_cyclist_injured")
        + F.col("number_of_motorist_injured")
    )
    alloc["persons_killed_allocated"] = bf * (
        F.col("number_of_pedestrian_killed")
        + F.col("number_of_cyclist_killed")
        + F.col("number_of_motorist_killed")
    )
    alloc_final = {
        k: (F.when(g2, v).otherwise(F.col(k)) if only_null and k in out.columns else v)
        for k, v in alloc.items()
    }

    # stage 3: WHERE cyclist_injured_bycar IS NULL.  Folded into the
    # SAME projection as stage 2 by inlining each allocated expression
    # into its spread columns (stage-3 guards and fallbacks only touch
    # by* columns, which stage 2 never writes, so the merge is
    # semantics-preserving) -- one fewer Catalyst analysis pass over
    # the wide composed tree, and codegen's subexpression elimination
    # evaluates each allocated value once at runtime.
    g3 = (
        F.col("cyclist_injured_bycar").isNull()
        if "cyclist_injured_bycar" in out.columns and only_null
        else F.lit(True)
    )
    spread = {}
    for veh, (flag, needs_bike_blame) in BY_VEHICLE.items():
        gate = F.col(flag) == F.lit(True)
        if needs_bike_blame:
            gate = (F.col("bike_blame") == F.lit(True)) & gate
        for mode in ["cyclist", "motorist", "pedestrian", "persons"]:
            for outcome in ["injured", "killed"]:
                src = alloc_final[f"{mode}_{outcome}_allocated"]
                spread[f"{mode}_{outcome}_by{veh}"] = F.when(gate, src).otherwise(
                    F.lit(0.0)
                )
    merged_cols = dict(alloc_final)
    merged_cols.update(
        {k: (F.when(g3, v).otherwise(F.col(k)) if only_null and k in out.columns else v)
         for k, v in spread.items()}
    )
    return out.withColumns(merged_cols)
