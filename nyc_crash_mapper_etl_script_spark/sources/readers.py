"""Readers (reference §2.1 S1-S5).

The reference's sources are HTTP endpoints (Socrata SODA, CARTO SQL
API, MySQL).  In the Spark engine each becomes a schema-on-read scan;
the SoQL/SQL pushdown the reference hand-builds ($where/$select,
main.py:89-97, 831-838) is Catalyst's filter/column pushdown for
free -- callers just ``.filter``/``.select`` and the scan narrows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nyc_crash_mapper_etl_script_spark.schemas import SODA_FEED_SCHEMA


def read_soda_snapshot(spark: SparkSession, path: str) -> DataFrame:
    """S1/S2: SODA feed snapshot (JSON lines or parquet dump of the
    collisions feed).  Every data field is read as string -- "SODA
    uses JSON but doesn't use typing" (main.py:856); the system
    columns :created_at/:updated_at arrive as ``created_at``/
    ``updated_at`` timestamps ($select=':*,*', main.py:834-835).

    A date-window filter applied by the caller prunes at the scan
    (the $where pushdown analog)."""
    if path.endswith(".parquet"):
        return spark.read.parquet(path)
    return spark.read.schema(SODA_FEED_SCHEMA).json(path)


def read_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S5: header CSV scan (fixtallies/1-diffs.py:23-32)."""
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """S4: MySQL/JDBC scan (walkmapper/mysql2carto.py:63,114-137).

    Partitioned reads parallelize the extract (the reference reads
    the whole table through one cursor).  The LIVE path is proven
    end-to-end against embedded Apache Derby (the JDBC engine whose
    driver ships inside Spark's own jars):
    ``tests/test_connectors.py::test_read_jdbc_live_embedded_derby``
    exercises the plain scan, the partitioned parallel extract, the
    derived-subquery pushdown, and Catalyst's PushedFilters; the
    option wiring is additionally pinned against a recording fake.

    Integration recipe (live MySQL, matching the reference's
    ``walkmapper`` source):

    1. Put the driver jar on both driver and executors:
       ``spark-submit --packages com.mysql:mysql-connector-j:8.4.0``
       (or ``--jars /path/mysql-connector-j.jar``).
    2. ``read_jdbc(spark, "jdbc:mysql://host:3306/walkmapper",
       "obstructionDetails", partition_column="id",
       lower_bound=0, upper_bound=<max id>, num_partitions=16,
       user=..., password=..., driver="com.mysql.cj.jdbc.Driver",
       fetchsize="10000")`` -- ``partition_column`` bounds come from a
       cheap ``SELECT min(id), max(id)`` (run it through
       ``table="(select min(id) lo, max(id) hi from t) q"``).
    3. Pushdown: wrap arbitrary SQL as ``table="(select ... where
       updatedDate > '...') src"`` so the predicate runs on MySQL --
       the same ``:updated_at`` windowing the nightly uses
       (mysql2carto.py:114-137) without shipping the full table.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound if lower_bound is not None else 0))
            .option("upperBound", str(upper_bound if upper_bound is not None else 1_000_000))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_soda_snapshot_audited(
    spark: SparkSession, path: str, corrupt_col: str = "_corrupt_record"
) -> DataFrame:
    """S1 with MALFORMED-LINE auditing: the reference trusts the feed
    blindly (a bad row 500s the whole nightly, main.py:1198-1200
    merely emails about it); at pipeline scale a poisoned line must
    neither kill the job nor vanish silently.  PERMISSIVE JSON parse
    with an explicit corrupt-record column: parseable lines arrive
    typed, unparseable ones land raw in ``corrupt_col`` (NULL
    everywhere else), so the caller splits the scan into the clean
    feed (``corrupt_col IS NULL``) and a quarantine audit the same
    way the unmapped-vehicle-type audit (J4) quarantines bad
    dimension values.  Spark restriction worth knowing: a query may
    not reference ONLY the corrupt column (column pruning can reduce
    a filtered count to exactly that) -- ``cache()`` the frame or
    select a data column alongside it."""
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        list(SODA_FEED_SCHEMA.fields) + [StructField(corrupt_col, StringType())]
    )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
