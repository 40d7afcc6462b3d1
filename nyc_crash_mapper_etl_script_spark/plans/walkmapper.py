"""Walkmapper CDC sync (reference walkmapper/mysql2carto.py,
ObstructionMyqlToCartoLoader.run() at :69-79) as one composed plan.

Reference flow, per record over HTTP (1+8 calls per insert):
  MySQL join-scan + coercions (:114-161) -> per-row top-5 image
  subqueries (:164-201, looped "because MySQL 5 doesn't support CTEs
  nor window functions") -> summary fingerprint (:21-35, 103-110) ->
  insert/update/skip classify (:203-248) -> row-by-row INSERT/UPDATE/
  DELETE (:262-358) -> 8 boundary-intersection UPDATEs per insert
  (:361-379, BOUNDARY_INTERSECTIONS at :38-47).

Here: category self-join + window pivot + fingerprint classify +
set-based apply + one grid pip join -- five operators, two shuffles
(images pivot, CDC full-outer), zero per-row work.

Known reference bug NOT reproduced: mysql2carto.py:216 assigns the
5th image to ``row['image6']``, so the reference's image5 is always
NULL; we populate image5 as evidently intended.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.operators.cdc import apply_cdc, classify
from nyc_crash_mapper_etl_script_spark.operators.enrichment import link_districts
from nyc_crash_mapper_etl_script_spark.operators.topk import per_group_top_n_pivot

#: change-detection fingerprint fields (SUMMARY_FIELDS_CARTO/_MYSQL,
#: walkmapper/mysql2carto.py:21-35: the 4 status flags + their dates,
#: then image1..image5 appended at :218-222)
SUMMARY_COLS = [
    "isfirsttime",
    "createdat",
    "issecondtime",
    "secondtimesenddate",
    "isthirdtime",
    "thirdtimesenddate",
    "iscompleted",
    "completeddate",
    "image1",
    "image2",
    "image3",
    "image4",
    "image5",
]

#: full target column set (INSERT list at mysql2carto.py:308-325,
#: minus the_geom which we derive from lat/lng on demand)
TARGET_COLS = [
    "id",
    "obstructionlat",
    "obstructionlong",
    "address",
    "locationdetail",
    "topcategory",
    "subcategory",
    "createdat",
    "secondtimesenddate",
    "thirdtimesenddate",
    "completeddate",
    "isfirsttime",
    "issecondtime",
    "isthirdtime",
    "iscompleted",
    "image1",
    "image2",
    "image3",
    "image4",
    "image5",
]


def _bool_tf(c: Column) -> Column:
    """int 0/1 -> 't'/'f' text flag (SUMMARY_FIELDS_MYSQL CASE WHEN,
    mysql2carto.py:29-34)."""
    return F.when(c > 0, F.lit("t")).otherwise(F.lit("f"))


def _day(c: Column) -> Column:
    """datetime -> ISO date string, NULL preserved (the reference's
    ``row['createdAt'].date().isoformat() if ... else None`` at
    :145-148; the fingerprint coalesces NULL to '0000-00-00')."""
    return F.date_format(c, "yyyy-MM-dd")


def prepare_source(
    obstructions: DataFrame, categories: DataFrame, images: DataFrame
) -> DataFrame:
    """MySQL-side shaping (mysql2carto.py:114-201): category
    parent self-join (J10, the implicit ``o.categoryId = c1.id AND
    c1.parentId = c2.id`` at :126-130 -- INNER, so uncategorized rows
    drop, as in the reference), type coercions (:139-158), and the
    per-obstruction first-5-images pivot (W1, :164-201).

    Emits the CARTO-shaped TARGET_COLS plus ``is_delete`` (tombstone
    flag; the reference excludes these from the main scan at :131 and
    fetches them separately at :221-241 -- one scan here).
    """
    c1, c2 = categories.alias("c1"), categories.alias("c2")
    cats = c1.join(c2, F.col("c1.parentId") == F.col("c2.id"), "inner").select(
        F.col("c1.id").alias("categoryId"),
        F.col("c2.name").alias("topcategory"),
        F.col("c1.name").alias("subcategory"),
    )
    img5 = per_group_top_n_pivot(
        images, "obstructionId", "id", "image", n=5, out_prefix="image"
    )
    src = (
        obstructions.join(F.broadcast(cats), "categoryId", "inner")
        .join(img5, obstructions["id"] == img5["obstructionId"], "left")
        .drop("obstructionId")
    )
    return src.select(
        "id",
        F.col("obstructionLat").cast("double").alias("obstructionlat"),
        F.col("obstructionLong").cast("double").alias("obstructionlong"),
        # CONCAT(buildingNumber, ' ', streetName) at :119
        F.concat_ws(" ", F.col("buildingNumber"), F.col("streetName")).alias("address"),
        F.col("obstructionAddressLine").alias("locationdetail"),
        "topcategory",
        "subcategory",
        _day(F.col("createdAt")).alias("createdat"),
        _day(F.col("secondTimeSendDate")).alias("secondtimesenddate"),
        _day(F.col("thirdTimeSendDate")).alias("thirdtimesenddate"),
        _day(F.col("completedDate")).alias("completeddate"),
        _bool_tf(F.col("isFirstTime")).alias("isfirsttime"),
        _bool_tf(F.col("isSecondTime")).alias("issecondtime"),
        _bool_tf(F.col("isThirdTime")).alias("isthirdtime"),
        _bool_tf(F.col("isCompleted")).alias("iscompleted"),
        *[f"image{i}" for i in range(1, 6)],
        (F.col("isDelete") > 0).alias("is_delete"),
    )


def sync(
    obstructions: DataFrame,
    categories: DataFrame,
    images: DataFrame,
    target: DataFrame,
    districts: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Full CDC sync.  Returns ``classes`` (per-id cdc_class, matching
    the reference's logged insert/update/skip/delete counts at
    :245-248) and ``target`` -- the post-sync table, district-enriched
    when polygon dims are given (the per-insert boundary UPDATE loop
    at :361-379 becomes one grid pip join over the whole table;
    recompute-all is idempotent and covers moved points too).
    """
    src = prepare_source(obstructions, categories, images)
    base = target.select(*[c for c in TARGET_COLS if c in target.columns])
    is_del = F.col("is_delete")
    cls = classify(src, base, "id", SUMMARY_COLS, is_delete=is_del)
    new_target = apply_cdc(src, base, "id", SUMMARY_COLS, is_delete=is_del)

    if districts is not None:
        pts = new_target.withColumn(
            "the_geom",
            F.when(
                F.col("obstructionlat").isNotNull()
                & F.col("obstructionlong").isNotNull(),
                F.struct(
                    F.col("obstructionlong").alias("lng"),
                    F.col("obstructionlat").alias("lat"),
                ),
            ),
        )
        new_target = link_districts(
            pts, districts, key="id", only_null=False
        ).drop("the_geom")
    return {"classes": cls, "target": new_target}
