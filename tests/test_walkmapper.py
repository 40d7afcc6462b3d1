"""Walkmapper CDC sync plan (plans/walkmapper.py vs reference
walkmapper/mysql2carto.py): source shaping, classification counts,
post-sync target, district enrichment."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.plans.walkmapper import (
    TARGET_COLS,
    prepare_source,
    sync,
)

D = dt.datetime(2024, 3, 1, 12, 30)


def _obstructions(spark):
    cols = (
        "id long, categoryId long, obstructionLat double, obstructionLong double, "
        "buildingNumber string, streetName string, obstructionAddressLine string, "
        "createdAt timestamp, secondTimeSendDate timestamp, thirdTimeSendDate timestamp, "
        "completedDate timestamp, isFirstTime int, isSecondTime int, isThirdTime int, "
        "isCompleted int, isDelete int"
    )
    rows = [
        # unchanged vs target -> skip
        (1, 10, 40.70, -74.00, "12", "Main St", "near corner",
         D, None, None, None, 1, 0, 0, 0, 0),
        # completedDate newly set -> update
        (2, 11, 40.80, -73.95, "99", "Broad Ave", None,
         D, None, None, D, 1, 0, 0, 1, 0),
        # not in target -> insert
        (3, 10, 40.60, -74.05, "5", "New Pl", None,
         D, None, None, None, 1, 0, 0, 0, 0),
        # tombstone, present in target -> delete
        (4, 10, 40.75, -73.99, "1", "Gone St", None,
         D, None, None, None, 1, 0, 0, 0, 1),
        # tombstone, never synced -> skip
        (5, 10, 40.75, -73.99, "2", "Never St", None,
         D, None, None, None, 1, 0, 0, 0, 1),
        # category without parent -> dropped by the inner join
        (6, 12, 40.75, -73.99, "3", "Orphan St", None,
         D, None, None, None, 1, 0, 0, 0, 0),
    ]
    return spark.createDataFrame(rows, cols)


def _categories(spark):
    # 1,2 are parents; 10,11 children; 12 parentless (NULL parent)
    rows = [
        (1, "Sidewalk", None),
        (2, "Signage", None),
        (10, "Broken pavement", 1),
        (11, "Missing sign", 2),
        (12, "Orphan", None),
    ]
    return spark.createDataFrame(rows, "id long, name string, parentId long")


def _images(spark):
    rows = [(100 + i, 1, f"img-1-{i}.jpg") for i in range(7)] + [
        (200, 2, "img-2-0.jpg"),
        (300, 3, "img-3-0.jpg"),
    ]
    return spark.createDataFrame(rows, "id long, obstructionId long, image string")


def _target(spark, src):
    """Target = yesterday's sync of ids 1,2,4: id 2 WITHOUT its
    completedDate (so today it classifies as update)."""
    t = src.where(F.col("id").isin(1, 2, 4)).drop("is_delete")
    return t.withColumn(
        "completeddate",
        F.when(F.col("id") == 2, F.lit(None).cast("string")).otherwise(
            F.col("completeddate")
        ),
    ).withColumn(
        "iscompleted",
        F.when(F.col("id") == 2, F.lit("f")).otherwise(F.col("iscompleted")),
    )


def test_prepare_source_shape(spark):
    src = prepare_source(_obstructions(spark), _categories(spark), _images(spark))
    assert src.columns == TARGET_COLS + ["is_delete"]
    rows = {r["id"]: r for r in src.collect()}
    assert 6 not in rows  # orphan category dropped (inner join)
    r1 = rows[1]
    assert r1["topcategory"] == "Sidewalk" and r1["subcategory"] == "Broken pavement"
    assert r1["address"] == "12 Main St"
    assert r1["createdat"] == "2024-03-01"
    assert r1["isfirsttime"] == "t" and r1["iscompleted"] == "f"
    # first 5 of 7 images by id, in order; image5 populated (reference
    # image6 bug not reproduced)
    assert [r1[f"image{i}"] for i in range(1, 6)] == [
        f"img-1-{i}.jpg" for i in range(5)
    ]
    r3 = rows[3]
    assert r3["image1"] == "img-3-0.jpg" and r3["image2"] is None


def test_sync_classification_and_target(spark):
    obs, cats, imgs = _obstructions(spark), _categories(spark), _images(spark)
    src = prepare_source(obs, cats, imgs)
    out = sync(obs, cats, imgs, _target(spark, src))
    classes = {r["id"]: r["cdc_class"] for r in out["classes"].collect()}
    assert classes == {1: "skip", 2: "update", 3: "insert", 4: "delete", 5: "skip"}
    final = {r["id"]: r for r in out["target"].collect()}
    assert set(final) == {1, 2, 3}
    assert final[2]["completeddate"] == "2024-03-01"  # update applied
    assert final[2]["iscompleted"] == "t"
    assert final[3]["topcategory"] == "Sidewalk"  # insert arrived


def test_sync_district_enrichment(spark):
    obs, cats, imgs = _obstructions(spark), _categories(spark), _images(spark)
    src = prepare_source(obs, cats, imgs)
    # one borough polygon covering lat 40.65..40.85 (ids 1, 2; not 3)
    districts = spark.createDataFrame(
        [
            Row(
                kind="borough",
                identifier="Manhattan",
                the_geom=[
                    Row(x=-74.2, y=40.65),
                    Row(x=-73.9, y=40.65),
                    Row(x=-73.9, y=40.85),
                    Row(x=-74.2, y=40.85),
                ],
            )
        ]
    )
    out = sync(obs, cats, imgs, _target(spark, src), districts=districts)
    rows = {r["id"]: r for r in out["target"].collect()}
    assert rows[1]["borough"] == "Manhattan"
    assert rows[2]["borough"] == "Manhattan"
    assert rows[3]["borough"] is None  # lat 40.60 below polygon
    assert "the_geom" not in out["target"].columns


def test_sync_idempotent(spark):
    """Re-running sync over an already-synced target: everything
    skips, target unchanged (reference convergence-by-rerun)."""
    obs, cats, imgs = _obstructions(spark), _categories(spark), _images(spark)
    src = prepare_source(obs, cats, imgs)
    first = sync(obs, cats, imgs, _target(spark, src))["target"]
    second = sync(obs, cats, imgs, first)
    classes = {r["cdc_class"] for r in second["classes"].collect()}
    assert classes <= {"skip"}
    assert second["target"].exceptAll(first).count() == 0
    assert first.exceptAll(second["target"]).count() == 0
