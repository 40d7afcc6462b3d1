"""CDC fingerprint classification (reference §2.9 C1).

walkmapper/mysql2carto.py:203-248 classifies every source row against
the target by (id present?, fingerprint equal?, isDelete flag):
insert / update / skip / delete -- then applies them one HTTP call per
row.  Here: one full-outer join on the key + fingerprint compare
producing a ``cdc_class`` column, and a functional ``apply_cdc`` that
materializes the post-sync target in a single pass.

Scale: full-outer join shuffles both sides by key once; AQE handles
skew.  Applying changes is the same single shuffle -- no per-row
round-trips (the reference pays 1+8 HTTP calls per insert;
walkmapper/mysql2carto.py:304-379).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.functions.fingerprint import row_fingerprint

INSERT, UPDATE, SKIP, DELETE = "insert", "update", "skip", "delete"


def classify(
    source: DataFrame,
    target: DataFrame,
    key: str,
    compare_cols: list[str],
    is_delete: Column | None = None,
) -> DataFrame:
    """Full-outer join source vs target and tag each key with its CDC
    class.  Returns key + ``cdc_class`` + both fingerprints.

    ``is_delete``: optional boolean Column on the source marking
    source-side tombstones (walkmapper ``isDelete``,
    mysql2carto.py:221-241).  Keys present only in target are also
    deletes (hard-delete detection, mysql2carto.py:351-358).
    """
    src = source.select(
        F.col(key).alias("src_key"),
        row_fingerprint(*[F.col(c) for c in compare_cols]).alias("src_fp"),
        (is_delete if is_delete is not None else F.lit(False)).alias("src_delete"),
    )
    tgt = target.select(
        F.col(key).alias("tgt_key"),
        row_fingerprint(*[F.col(c) for c in compare_cols]).alias("tgt_fp"),
    )
    j = src.join(tgt, src["src_key"] == tgt["tgt_key"], "full_outer")
    cls = (
        F.when(F.col("src_key").isNull(), F.lit(DELETE))
        .when(F.col("src_delete") & F.col("tgt_key").isNotNull(), F.lit(DELETE))
        .when(F.col("src_delete"), F.lit(SKIP))  # deleted & never synced
        .when(F.col("tgt_key").isNull(), F.lit(INSERT))
        .when(F.col("src_fp") != F.col("tgt_fp"), F.lit(UPDATE))
        .otherwise(F.lit(SKIP))
    )
    return j.select(
        F.coalesce(F.col("src_key"), F.col("tgt_key")).alias(key),
        cls.alias("cdc_class"),
        F.col("src_fp"),
        F.col("tgt_fp"),
    )


def apply_cdc(
    source: DataFrame,
    target: DataFrame,
    key: str,
    compare_cols: list[str],
    is_delete: Column | None = None,
) -> DataFrame:
    """Materialize the post-sync target: inserts + updates take the
    source row, skips keep the target row, deletes drop out."""
    cls = classify(source, target, key, compare_cols, is_delete).select(key, "cdc_class")
    take_source = cls.where(F.col("cdc_class").isin(INSERT, UPDATE)).select(key)
    keep_target = cls.where(F.col("cdc_class") == SKIP).select(key)
    cols = [c for c in target.columns]
    return (
        source.join(take_source, key, "left_semi").select(*cols)
        .unionByName(target.join(keep_target, key, "left_semi").select(*cols))
    )
