"""Ingest-normalize stage: raw SODA feed rows -> typed crash-fact
rows (reference format_soda_response, main.py:185-298).

Faithful quirks:
 - timestamp = date-part of ``crash_date`` + 'T' + ``crash_time``
   (main.py:205-206)
 - street names trimmed; absent -> '' (main.py:226-243); quote
   escaping disappears (no SQL-string channel)
 - zip absent -> '' (main.py:246-249)
 - borough deliberately '' ("update_borough() does a better job",
   main.py:280)
 - ``number_of_persons_*`` reconstructed as motorist+cyclist+
   pedestrians when absent (main.py:251-255); note the feed's plural
   ``pedestrians`` is renamed to the warehouse's singular
   ``pedestrian`` (main.py:314-315, 908)
 - geom NULL unless both coordinates are present AND non-empty --
   Python string truthiness (main.py:219-224): '0' IS truthy, so a
   '0' latitude still builds a point (the sentinel is filtered at the
   SODA query layer instead, main.py:981); '' is falsy
 - arrays from the 5 numbered columns with the inconsistent
   underscore pattern (main.py:150-155), comma-split + quote-strip
   (main.py:158-161)
 - year/month strings, crash_count literal 1 (main.py:287-289)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.functions.arrays import collapse_numbered_columns
from nyc_crash_mapper_etl_script_spark.functions.datetime_fns import (
    combine_date_time,
    derive_year_month,
)
from nyc_crash_mapper_etl_script_spark.functions.geo import point

_CF_COLS = [f"contributing_factor_vehicle_{i}" for i in range(1, 6)]
#: no underscore slots 1-2, underscore slots 3-5 (main.py:150-155)
_VT_COLS = ["vehicle_type_code1", "vehicle_type_code2"] + [
    f"vehicle_type_code_{i}" for i in range(3, 6)
]


def _street(c: Column) -> Column:
    return F.coalesce(F.trim(c), F.lit(""))


def _toint(c: Column) -> Column:
    return c.cast("int")


def normalize_soda_feed(raw: DataFrame) -> DataFrame:
    """One codegen pass: no UDFs, no shuffle."""
    date_val = combine_date_time(F.col("crash_date"), F.col("crash_time"))
    year, month = derive_year_month(date_val)

    # Python truthiness: present and non-empty ('0' is truthy)
    lng_ok = F.col("longitude").isNotNull() & (F.col("longitude") != "")
    lat_ok = F.col("latitude").isNotNull() & (F.col("latitude") != "")
    both = lng_ok & lat_ok
    lng = F.when(both, F.col("longitude").cast("double"))
    lat = F.when(both, F.col("latitude").cast("double"))

    persons_killed = F.coalesce(
        _toint(F.col("number_of_persons_killed")),
        _toint(F.col("number_of_motorist_killed"))
        + _toint(F.col("number_of_cyclist_killed"))
        + _toint(F.col("number_of_pedestrians_killed")),
    )
    persons_injured = F.coalesce(
        _toint(F.col("number_of_persons_injured")),
        _toint(F.col("number_of_motorist_injured"))
        + _toint(F.col("number_of_cyclist_injured"))
        + _toint(F.col("number_of_pedestrians_injured")),
    )

    return raw.select(
        F.col("collision_id").cast("long").alias("socrata_id"),
        date_val.alias("date_val"),
        year.alias("year"),
        month.alias("month"),
        F.lit(1).cast("int").alias("crash_count"),
        F.coalesce(F.col("zip_code"), F.lit("")).alias("zip_code"),
        _street(F.col("on_street_name")).alias("on_street_name"),
        _street(F.col("off_street_name")).alias("off_street_name"),
        _street(F.col("cross_street_name")).alias("cross_street_name"),
        F.lit("").alias("borough"),  # main.py:280
        lng.alias("longitude"),
        lat.alias("latitude"),
        point(lng, lat).alias("the_geom"),
        _toint(F.col("number_of_motorist_injured")).alias("number_of_motorist_injured"),
        _toint(F.col("number_of_motorist_killed")).alias("number_of_motorist_killed"),
        _toint(F.col("number_of_cyclist_injured")).alias("number_of_cyclist_injured"),
        _toint(F.col("number_of_cyclist_killed")).alias("number_of_cyclist_killed"),
        # plural -> singular rename happens HERE (main.py:314-315)
        _toint(F.col("number_of_pedestrians_injured")).alias("number_of_pedestrian_injured"),
        _toint(F.col("number_of_pedestrians_killed")).alias("number_of_pedestrian_killed"),
        persons_injured.alias("number_of_persons_injured"),
        persons_killed.alias("number_of_persons_killed"),
        collapse_numbered_columns(*[F.col(c) for c in _VT_COLS]).alias("vehicle_type"),
        collapse_numbered_columns(*[F.col(c) for c in _CF_COLS]).alias(
            "contributing_factor"
        ),
    )
