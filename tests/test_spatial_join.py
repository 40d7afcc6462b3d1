"""Grid-bucketed spatial join: correctness vs the naive predicate
join, and plan-shape guarantees (hash join, not nested-loop)."""

from __future__ import annotations

import random

from pyspark.sql import Row
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.functions.geo import (
    haversine_m_exact,
    point_in_polygon,
)
from nyc_crash_mapper_etl_script_spark.operators.spatial_join import (
    points_in_circles,
    points_in_polygons,
)


def _random_points(spark, n=300, seed=7):
    rng = random.Random(seed)
    rows = [
        (i, Row(lng=rng.uniform(-74.3, -73.6), lat=rng.uniform(40.4, 41.0)))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "pid long, the_geom struct<lng:double,lat:double>"
    )


def test_points_in_polygons_matches_naive(spark):
    pts = _random_points(spark)
    polys = spark.createDataFrame(
        [
            Row(gid=1, poly=[Row(x=-74.2, y=40.5), Row(x=-74.0, y=40.5),
                             Row(x=-74.0, y=40.7), Row(x=-74.2, y=40.7)]),
            Row(gid=2, poly=[Row(x=-74.0, y=40.6), Row(x=-73.7, y=40.65),
                             Row(x=-73.8, y=40.95)]),  # triangle
        ]
    )
    grid = points_in_polygons(pts, polys, polygon_col="poly").select(
        F.col("p.pid").alias("pid"), F.col("g.gid").alias("gid")
    )
    naive = pts.alias("p").join(
        polys.alias("g"),
        point_in_polygon(F.col("p.the_geom"), F.col("g.poly")),
    ).select(F.col("p.pid").alias("pid"), F.col("g.gid").alias("gid"))
    assert {tuple(r) for r in grid.collect()} == {tuple(r) for r in naive.collect()}
    assert grid.count() > 0


def test_points_in_circles_matches_naive(spark):
    pts = _random_points(spark)
    circles = spark.createDataFrame(
        [
            (1, Row(lng=-74.0, lat=40.7), 5000.0),
            (2, Row(lng=-73.8, lat=40.8), 12000.0),
        ],
        "cid long, center struct<lng:double,lat:double>, radius_m double",
    )
    grid = points_in_circles(pts, circles).select(
        F.col("p.pid").alias("pid"), F.col("g.cid").alias("cid")
    )
    naive = pts.alias("p").join(
        circles.alias("g"),
        haversine_m_exact(
            F.col("p.the_geom.lng"), F.col("p.the_geom.lat"),
            F.col("g.center.lng"), F.col("g.center.lat"),
        ) <= F.col("g.radius_m"),
    ).select(F.col("p.pid").alias("pid"), F.col("g.cid").alias("cid"))
    assert {tuple(r) for r in grid.collect()} == {tuple(r) for r in naive.collect()}
    assert grid.count() > 0


def test_grid_join_plan_is_hash_join(spark):
    """The entire point of the grid key: Catalyst plans a (broadcast)
    HASH join on __cell, never a nested-loop over all pairs."""
    pts = _random_points(spark, n=50)
    circles = spark.createDataFrame(
        [(1, Row(lng=-74.0, lat=40.7), 5000.0)],
        "cid long, center struct<lng:double,lat:double>, radius_m double",
    )
    plan = points_in_circles(pts, circles)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashJoin" in plan

    polys = spark.createDataFrame(
        [Row(gid=1, poly=[Row(x=-74.2, y=40.5), Row(x=-74.0, y=40.5),
                          Row(x=-74.0, y=40.7)])]
    )
    plan2 = points_in_polygons(pts, polys, polygon_col="poly")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan2
    assert "HashJoin" in plan2


def _mixed_scale_polys(spark):
    """One borough-scale polygon (~0.6 deg) layered over a grid of
    precinct-scale polygons (~0.03 deg) -- the SURVEY §8 case."""

    def ring(x0, y0, x1, y1):
        return [Row(x=x0, y=y0), Row(x=x1, y=y0), Row(x=x1, y=y1), Row(x=x0, y=y1)]

    rows = [Row(gid=0, kind="borough", poly=ring(-74.25, 40.45, -73.65, 40.95))]
    gid = 1
    for i in range(8):
        for j in range(8):
            x0 = -74.24 + i * 0.07
            y0 = 40.46 + j * 0.055
            rows.append(
                Row(gid=gid, kind="precinct", poly=ring(x0, y0, x0 + 0.03, y0 + 0.03))
            )
            gid += 1
    return spark.createDataFrame(rows)


def test_multilevel_grid_matches_naive_on_mixed_scales(spark):
    """>=16x scale mix triggers the level ladder; pairs identical to
    the naive predicate join."""
    pts = _random_points(spark, n=400, seed=23)
    polys = _mixed_scale_polys(spark)
    grid = points_in_polygons(pts, polys, polygon_col="poly").select(
        F.col("p.pid").alias("pid"), F.col("g.gid").alias("gid")
    )
    naive = pts.alias("p").join(
        polys.alias("g"),
        point_in_polygon(F.col("p.the_geom"), F.col("g.poly")),
    ).select(F.col("p.pid").alias("pid"), F.col("g.gid").alias("gid"))
    assert {tuple(r) for r in grid.collect()} == {tuple(r) for r in naive.collect()}
    assert grid.count() > 300  # borough matches most points


def test_multilevel_candidate_fanout_stays_near_layers(spark):
    """The scale argument: with the ladder, a point's candidate set is
    ~one geometry per layer (borough level: 1 candidate; precinct
    level: ~1 covering + boundary slack), nowhere near the 65-geometry
    dimension.  Measured by stripping the exact predicate and counting
    cell-key collisions per point."""
    from nyc_crash_mapper_etl_script_spark.functions.geo import polygon_bbox
    from nyc_crash_mapper_etl_script_spark.operators.spatial_join import _gridded

    pts = _random_points(spark, n=400, seed=29)
    polys = _mixed_scale_polys(spark)
    boxed = polys.withColumn("__bbox", polygon_bbox(F.col("poly")))
    p, g, key_cond = _gridded(pts, boxed, "the_geom", 0.05, None, "inner")
    cand = (
        p.alias("p")
        .join(F.broadcast(g.alias("g")), key_cond)
        .groupBy("p.pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.avg("n").alias("avg"), F.max("n").alias("mx"))
        .first()
    )
    # 65 geometries, 2 layers: candidates must track layers, not geoms
    assert cand["avg"] <= 8.0
    assert cand["mx"] <= 16


def test_left_join_keeps_unmatched(spark):
    pts = spark.createDataFrame(
        [(1, Row(lng=-74.1, lat=40.6)), (2, Row(lng=0.0, lat=0.0))],
        "pid long, the_geom struct<lng:double,lat:double>",
    )
    circles = spark.createDataFrame(
        [(1, Row(lng=-74.1, lat=40.6), 1000.0)],
        "cid long, center struct<lng:double,lat:double>, radius_m double",
    )
    out = points_in_circles(pts, circles, how="left").select(
        F.col("p.pid").alias("pid"), F.col("g.cid").alias("cid")
    )
    got = {r["pid"]: r["cid"] for r in out.collect()}
    assert got == {1: 1, 2: None}


def test_nlj_strategy_matches_grid(spark):
    """Both physical strategies produce identical pairs; only the
    plan differs (grid = hash join, nlj = broadcast nested-loop with
    bbox short-circuit for tiny dimensions)."""
    pts = _random_points(spark, n=200, seed=11)
    circles = spark.createDataFrame(
        [
            (1, Row(lng=-74.0, lat=40.7), 5000.0),
            (2, Row(lng=-73.8, lat=40.8), 12000.0),
        ],
        "cid long, center struct<lng:double,lat:double>, radius_m double",
    )
    sel = lambda df: {  # noqa: E731
        (r.pid, r.cid)
        for r in df.select(
            F.col("p.pid").alias("pid"), F.col("g.cid").alias("cid")
        ).collect()
    }
    assert sel(points_in_circles(pts, circles)) == sel(
        points_in_circles(pts, circles, strategy="nlj")
    )

    polys = spark.createDataFrame(
        [
            Row(gid=1, poly=[Row(x=-74.2, y=40.5), Row(x=-74.0, y=40.5),
                             Row(x=-74.0, y=40.7), Row(x=-74.2, y=40.7)]),
        ]
    )
    selp = lambda df: {  # noqa: E731
        (r.pid, r.gid)
        for r in df.select(
            F.col("p.pid").alias("pid"), F.col("g.gid").alias("gid")
        ).collect()
    }
    assert selp(points_in_polygons(pts, polys, polygon_col="poly")) == selp(
        points_in_polygons(pts, polys, polygon_col="poly", strategy="nlj")
    )
