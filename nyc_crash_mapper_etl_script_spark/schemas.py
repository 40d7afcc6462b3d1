"""Declared schemas.

The reference hard-codes its column lists inside generated SQL
(insert list at reference main.py:309-333; enrichment columns at
main.py:408-533, 650-790, 1082-1102; SODA feed keys at
main.py:185-298).  Here they are first-class ``StructType`` schemas so
every reader is schema-on-read with Catalyst-visible types.

Harness tables (TESTDATA.md) are plain parquet; ``load_tables`` gives
named DataFrames for them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Crash domain (FIXTURES.md; reference file:line cited per group)
# ---------------------------------------------------------------------------

#: Raw Socrata SODA feed row: every field is an untyped JSON string and
#: may be absent (reference main.py:856 "SODA uses JSON but doesn't use
#: typing").  ``created_at``/``updated_at`` mirror the ``:created_at`` /
#: ``:updated_at`` system columns fetched via ``$select=':*,*'``
#: (main.py:834-835).
SODA_FEED_SCHEMA = T.StructType(
    [
        T.StructField("collision_id", T.StringType()),
        T.StructField("crash_date", T.StringType()),
        T.StructField("crash_time", T.StringType()),
        T.StructField("latitude", T.StringType()),
        T.StructField("longitude", T.StringType()),
        T.StructField("on_street_name", T.StringType()),
        T.StructField("off_street_name", T.StringType()),
        T.StructField("cross_street_name", T.StringType()),
        T.StructField("zip_code", T.StringType()),
        T.StructField("borough", T.StringType()),
        T.StructField("number_of_motorist_injured", T.StringType()),
        T.StructField("number_of_motorist_killed", T.StringType()),
        T.StructField("number_of_cyclist_injured", T.StringType()),
        T.StructField("number_of_cyclist_killed", T.StringType()),
        # plural in the feed; renamed to singular on insert (main.py:314-315,908)
        T.StructField("number_of_pedestrians_injured", T.StringType()),
        T.StructField("number_of_pedestrians_killed", T.StringType()),
        T.StructField("number_of_persons_injured", T.StringType()),
        T.StructField("number_of_persons_killed", T.StringType()),
        T.StructField("contributing_factor_vehicle_1", T.StringType()),
        T.StructField("contributing_factor_vehicle_2", T.StringType()),
        T.StructField("contributing_factor_vehicle_3", T.StringType()),
        T.StructField("contributing_factor_vehicle_4", T.StringType()),
        T.StructField("contributing_factor_vehicle_5", T.StringType()),
        # inconsistent underscore pattern preserved from the source
        # (main.py:150-155): no underscore slots 1-2, underscore 3-5.
        T.StructField("vehicle_type_code1", T.StringType()),
        T.StructField("vehicle_type_code2", T.StringType()),
        T.StructField("vehicle_type_code_3", T.StringType()),
        T.StructField("vehicle_type_code_4", T.StringType()),
        T.StructField("vehicle_type_code_5", T.StringType()),
        T.StructField("created_at", T.TimestampType()),
        T.StructField("updated_at", T.TimestampType()),
    ]
)

#: Point geometry: SRID-4326 lng/lat struct (PostGIS ``Point`` at
#: main.py:220).  NULL struct == NULL geom (missing coordinates).
POINT_SCHEMA = T.StructType(
    [T.StructField("lng", T.DoubleType()), T.StructField("lat", T.DoubleType())]
)

#: Polygon ring: closed or open vertex list (x=lng, y=lat).
POLYGON_SCHEMA = T.ArrayType(
    T.StructType([T.StructField("x", T.DoubleType()), T.StructField("y", T.DoubleType())])
)

_CRASH_CORE = [
    T.StructField("cartodb_id", T.LongType()),
    T.StructField("socrata_id", T.LongType()),
    T.StructField("date_val", T.TimestampType()),
    T.StructField("year", T.StringType()),
    T.StructField("month", T.StringType()),
    T.StructField("crash_count", T.IntegerType()),
    T.StructField("zip_code", T.StringType()),
    T.StructField("on_street_name", T.StringType()),
    T.StructField("off_street_name", T.StringType()),
    T.StructField("cross_street_name", T.StringType()),
    T.StructField("longitude", T.DoubleType()),
    T.StructField("latitude", T.DoubleType()),
    T.StructField("the_geom", POINT_SCHEMA),
    T.StructField("number_of_motorist_injured", T.IntegerType()),
    T.StructField("number_of_motorist_killed", T.IntegerType()),
    T.StructField("number_of_cyclist_injured", T.IntegerType()),
    T.StructField("number_of_cyclist_killed", T.IntegerType()),
    # singular after the rename (main.py:314-315)
    T.StructField("number_of_pedestrian_injured", T.IntegerType()),
    T.StructField("number_of_pedestrian_killed", T.IntegerType()),
    T.StructField("number_of_persons_injured", T.IntegerType()),
    T.StructField("number_of_persons_killed", T.IntegerType()),
    T.StructField("vehicle_type", T.ArrayType(T.StringType())),
    T.StructField("contributing_factor", T.ArrayType(T.StringType())),
]

_DISTRICT_COLS = [
    T.StructField("borough", T.StringType()),
    T.StructField("city_council", T.IntegerType()),
    T.StructField("community_board", T.IntegerType()),
    T.StructField("neighborhood", T.StringType()),
    T.StructField("nypd_precinct", T.IntegerType()),
    T.StructField("senate", T.IntegerType()),
    T.StructField("assembly", T.IntegerType()),
    T.StructField("businessdistrict", T.StringType()),
]

VEHICLE_KINDS = [
    "bicycle",
    "motorcycle",
    "scooter",
    "busvan",
    "car",
    "suv",
    "truck",
    "other",
    "other_unspecified",
]

#: Canonical crosswalk codes (main.py:1176-1185) -> hasvehicle column kind.
CROSSWALK_CODE_TO_KIND = {
    "BICYCLE": "bicycle",
    "MOTORCYCLE-MOPED": "motorcycle",
    "E-BIKE-SCOOT": "scooter",
    "BUS-VAN": "busvan",
    "CAR": "car",
    "SUV": "suv",
    "TRUCK": "truck",
    "OTHER": "other",
}

_VEHICLE_FLAG_COLS = [T.StructField(f"hasvehicle_{k}", T.BooleanType()) for k in VEHICLE_KINDS]

BLAME_MODES = ["cyclist", "motorist", "pedestrian", "persons"]
BLAME_OUTCOMES = ["injured", "killed"]
BLAME_BY = ["bike", "scooter", "motorcycle", "busvan", "car", "suv", "truck", "other"]

_BLAME_COLS = (
    [T.StructField("bike_blame", T.BooleanType()), T.StructField("blame_factor", T.DoubleType())]
    + [
        T.StructField(f"{m}_{o}_allocated", T.DoubleType())
        for m in BLAME_MODES
        for o in BLAME_OUTCOMES
    ]
    + [
        T.StructField(f"{m}_{o}_by{b}", T.DoubleType())
        for m in BLAME_MODES
        for o in BLAME_OUTCOMES
        for b in BLAME_BY
    ]
)

#: Full fact-table schema (``crashes_all_prod``): 23 insert columns +
#: 8 district columns + 9 vehicle flags + 2+8+64 blame columns.
CRASHES_SCHEMA = T.StructType(_CRASH_CORE + _DISTRICT_COLS + _VEHICLE_FLAG_COLS + _BLAME_COLS)

#: One polygon dimension standing in for the 8 ``nyc_*`` tables
#: (main.py:414-533); ``kind`` discriminates the family.
DISTRICTS_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("identifier", T.StringType()),
        T.StructField("the_geom", POLYGON_SCHEMA),
    ]
)

#: ``nyc_intersections``: circle buffers (center + radius in meters).
INTERSECTIONS_SCHEMA = T.StructType(
    [
        T.StructField("cartodb_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("borough", T.StringType()),
        T.StructField(
            "the_geom",
            T.StructType(
                [
                    T.StructField("center", POINT_SCHEMA),
                    T.StructField("radius_m", T.DoubleType()),
                ]
            ),
        ),
        T.StructField("crashcount", T.IntegerType()),
    ]
)

CROSSWALK_SCHEMA = T.StructType(
    [
        T.StructField("nyc_vehicletype", T.StringType()),
        T.StructField("crashmapper_vehicletype", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Harness tables (TESTDATA.md)
# ---------------------------------------------------------------------------

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one harness parquet table (columnar scan; Catalyst prunes
    columns/filters into the scan automatically).

    ``events.parquet`` stores TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects; read nanos as long and convert to a
    microsecond timestamp (integer div -- float division would lose
    precision on int64 nanos).  DuckDB truncates NS->US the same way on
    ``CAST(ts AS TIMESTAMP)``.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F

        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}
