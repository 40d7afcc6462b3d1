"""Grid-bucketed spatial joins.

A non-equi spatial predicate (point-in-polygon, point-in-circle)
forces Spark into BroadcastNestedLoopJoin: every point evaluated
against every geometry.  Fine for 4 test circles; catastrophic at
1.5M crashes x 40k intersections (60G predicate evaluations), and
unusable at 100 TB.

The fix is an equi-join key both sides can compute: a lat/lng grid.
Geometries register under every cell their bbox overlaps (a handful
for district polygons, usually 1-4 for 30 m circles); points register
under exactly one cell.  The join becomes

    points ⋈[cell]  geometries   (hash join, shuffle- or broadcast-)
            THEN exact predicate on the survivors

which Catalyst executes as a plain (broadcast) hash join; the exact
pip/haversine test runs only on same-cell pairs.  Cell size trades
bucket fan-out against candidate precision; 0.05 deg (~5 km) suits
district polygons, 0.01 deg (~1 km) suits intersection circles.

This is the same blocking idea the reference leans on PostGIS GiST
indexes for (main.py:408-533 district UPDATEs; main.py:618-647
intersection counts) -- re-expressed as a relational join Catalyst
can plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.functions.geo import (
    bbox_contains,
    point_in_circle_m,
    point_in_polygon,
    polygon_bbox,
)

#: grid-id packing: ix * 2^21 + iy (world at 0.001 deg -> ix < 360k < 2^19)
_GRID_SHIFT = 21


def _cell_lit(cell_deg) -> Column:
    return cell_deg if isinstance(cell_deg, Column) else F.lit(float(cell_deg))


def point_cell(lng: Column, lat: Column, cell_deg) -> Column:
    """Single grid-cell id for a point (cell size literal or Column)."""
    c = _cell_lit(cell_deg)
    ix = F.floor((lng + 180.0) / c).cast("long")
    iy = F.floor((lat + 90.0) / c).cast("long")
    return F.shiftleft(ix, _GRID_SHIFT) + iy


def bbox_cells(box: Column, cell_deg) -> Column:
    """All grid-cell ids a bbox struct overlaps (array<long>)."""
    c = _cell_lit(cell_deg)
    x0 = F.floor((box["xmin"] + 180.0) / c).cast("long")
    x1 = F.floor((box["xmax"] + 180.0) / c).cast("long")
    y0 = F.floor((box["ymin"] + 90.0) / c).cast("long")
    y1 = F.floor((box["ymax"] + 90.0) / c).cast("long")
    return F.flatten(
        F.transform(
            F.sequence(x0, x1),
            lambda ix: F.transform(
                F.sequence(y0, y1), lambda iy: F.shiftleft(ix, _GRID_SHIFT) + iy
            ),
        )
    )


#: target total dimension-side (geometry, cell) rows for the
#: budget-sized grid -- small enough to broadcast, large enough that
#: cells stay fine-grained for mixed-scale dimension layers
_CELL_BUDGET = 65536


#: cell-size ratio between adjacent grid levels
_LEVEL_BASE = 4.0
#: edge spread (in levels) beyond which the multi-level ladder beats a
#: single compromise cell: >= 2 levels means a >= 16x scale mix
_LEVEL_SPAN_MIN = 2


def _geom_level(edge: Column, floor_deg: float) -> Column:
    """Ladder level for a geometry: the smallest level whose cell
    (floor * BASE^level) is >= the bbox edge, so every geometry
    overlaps <= 4 cells AT ITS OWN LEVEL regardless of scale.
    Correctness never depends on the level chosen -- points probe all
    present levels -- so float jitter in the log only shifts fan-out
    by one rung."""
    import math

    return (
        F.when(edge <= floor_deg, F.lit(0))
        .otherwise(
            F.ceil(F.log(edge / F.lit(floor_deg)) / math.log(_LEVEL_BASE) - 1e-9)
        )
        .cast("int")
    )


def _grid_plan(boxed: DataFrame, floor_deg: float):
    """One dimension-side driver action deciding the grid shape:
    ``("multi", levels)`` when the dimension mixes geometry scales by
    >= 16x (borough polygons layered with precinct polygons -- SURVEY
    §8's case), else ``("single", cell_deg)`` via the budget rule."""
    from nyc_crash_mapper_etl_script_spark.plancache import memo

    dx = F.col("__bbox")["xmax"] - F.col("__bbox")["xmin"]
    dy = F.col("__bbox")["ymax"] - F.col("__bbox")["ymin"]
    # dimension-side stat probe memoized on the geometry plan: one
    # driver job per distinct dimension, not per DAG declaration
    row = memo(
        boxed,
        "grid_plan",
        (floor_deg,),
        lambda: boxed.agg(
            F.collect_set(_geom_level(F.greatest(dx, dy), floor_deg)).alias("lvls"),
            F.sum(dx * dy).alias("a"),
            F.sum(dx + dy).alias("b"),
            F.count(F.lit(1)).alias("n"),
            F.max(dx).alias("dx"),
            F.max(dy).alias("dy"),
        ).first(),
    )
    levels = sorted(row["lvls"] or [0])
    if len(levels) > 1 and levels[-1] - levels[0] >= _LEVEL_SPAN_MIN:
        return "multi", levels
    return "single", _adaptive_cell_from_stats(row, floor_deg)


def _adaptive_cell_from_stats(row, floor_deg: float) -> float:
    """Budget-sized single cell: the SMALLEST cell whose total
    (geometry x overlapped-cells) fan-out stays within
    ``_CELL_BUDGET`` rows.  Expected fan-out for cell c:
    sum_i (dx_i/c + 1)(dy_i/c + 1) = A/c^2 + B/c + n with
    A = sum dx*dy, B = sum (dx+dy); solve the quadratic for the
    budget.  Degenerate stats (point-like geoms, or more geoms than
    budget) fall back to the coarse largest-edge rule (<= 4 cells
    each)."""
    a, b, n = row["a"] or 0.0, row["b"] or 0.0, row["n"] or 0
    slack = _CELL_BUDGET - n
    if slack <= 0 or (a <= 0.0 and b <= 0.0):
        biggest = max(row["dx"] or 0.0, row["dy"] or 0.0)
        return max(floor_deg, biggest * 1.001)
    if a > 0.0:
        inv_c = (-b + (b * b + 4.0 * a * slack) ** 0.5) / (2.0 * a)
    else:
        inv_c = slack / b
    return max(floor_deg, 1.0 / inv_c if inv_c > 0 else floor_deg)


def _gridded(
    points: DataFrame,
    boxed: DataFrame,
    point_col: str,
    floor_deg: float,
    cell_deg: float | None,
    how: str,
):
    """Attach grid keys to both sides; returns (pts, geoms, key_cond).

    Single-level: points carry ONE cell id, geometries explode to
    their overlapped cells; join key is the cell.  Multi-level
    (mixed-scale dimensions): each geometry registers at its OWN
    level's resolution (<= 4 cells), and points explode to one row
    per level PRESENT in the dimension (2-4 rows, a driver-known
    literal list) with that level's cell id; join key is
    (level, cell).  Candidate fan-out per point stays ~#layers
    instead of every-coarse-geometry-in-a-fine-cell.

    Multi-level requires ``how="inner"``: an outer join over the
    exploded point side would keep one unmatched NULL row PER LEVEL.
    Non-inner joins use the single budget-sized cell instead (every
    engine call site is inner; outer spatial joins are an API
    convenience for small dims)."""
    lng = F.col(point_col)["lng"]
    lat = F.col(point_col)["lat"]
    if cell_deg is None and how == "inner":
        shape, arg = _grid_plan(boxed, floor_deg)
    elif cell_deg is None:
        from nyc_crash_mapper_etl_script_spark.plancache import memo

        dx = F.col("__bbox")["xmax"] - F.col("__bbox")["xmin"]
        dy = F.col("__bbox")["ymax"] - F.col("__bbox")["ymin"]
        row = memo(
            boxed,
            "grid_stats",
            (floor_deg,),
            lambda: boxed.agg(
                F.sum(dx * dy).alias("a"),
                F.sum(dx + dy).alias("b"),
                F.count(F.lit(1)).alias("n"),
                F.max(dx).alias("dx"),
                F.max(dy).alias("dy"),
            ).first(),
        )
        shape, arg = "single", _adaptive_cell_from_stats(row, floor_deg)
    else:
        shape, arg = "single", cell_deg
    if shape == "single":
        geoms = boxed.withColumn("__cell", F.explode(bbox_cells(F.col("__bbox"), arg)))
        pts = points.withColumn("__cell", point_cell(lng, lat, arg))
        return pts, geoms, (F.col("p.__cell") == F.col("g.__cell"))
    levels: list[int] = arg
    dx = F.col("__bbox")["xmax"] - F.col("__bbox")["xmin"]
    dy = F.col("__bbox")["ymax"] - F.col("__bbox")["ymin"]
    lvl = _geom_level(F.greatest(dx, dy), floor_deg)
    gsize = F.lit(float(floor_deg)) * F.pow(F.lit(_LEVEL_BASE), lvl.cast("double"))
    geoms = boxed.withColumn("__lvl", lvl).withColumn(
        "__cell", F.explode(bbox_cells(F.col("__bbox"), gsize))
    )
    psize = F.lit(float(floor_deg)) * F.pow(
        F.lit(_LEVEL_BASE), F.col("__lvl").cast("double")
    )
    pts = points.withColumn(
        "__lvl", F.explode(F.array(*[F.lit(l).cast("int") for l in levels]))
    ).withColumn("__cell", point_cell(lng, lat, psize))
    return (
        pts,
        geoms,
        (F.col("p.__lvl") == F.col("g.__lvl"))
        & (F.col("p.__cell") == F.col("g.__cell")),
    )


def points_in_polygons(
    points: DataFrame,
    polygons: DataFrame,
    point_col: str = "the_geom",
    polygon_col: str = "the_geom",
    cell_deg: float | None = None,
    broadcast_geoms: bool = True,
    how: str = "inner",
    strategy: str = "grid",
) -> DataFrame:
    """Equi-join points to containing polygons.

    Returns points' columns + polygons' columns under aliases ``p``
    and ``g``.  ``how='left'`` keeps uncontained points with NULL
    polygon columns.  ``cell_deg=None`` sizes the grid to the largest
    polygon (<=4 cells per polygon).

    ``strategy``: ``"grid"`` (default) hash-joins on the grid cell —
    the only plan that survives a big dimension (40k intersections,
    100 TB facts).  ``"nlj"`` skips the grid: a broadcast nested-loop
    with the cheap bbox conjunct first, which beats the grid's
    explode+probe overhead when the caller statically knows the
    dimension is a handful of geometries.

    The exact ray-cast stays a Column predicate inside the join: an
    Arrow post-join filter was measured 2x SLOWER end-to-end (every
    candidate row pays polygon-array serialization into Python,
    dwarfing the interpreted-HOF cost it saves) — see
    tests/test_spatial_join.py for the parity suite.
    """
    from nyc_crash_mapper_etl_script_spark.functions.scratch import reserve

    reserve(polygons, "__bbox", "__cell", "__lvl")
    reserve(points, "__cell", "__lvl")
    pt = F.col(f"p.{point_col}")
    boxed = polygons.withColumn("__bbox", polygon_bbox(F.col(polygon_col)))
    if strategy == "nlj":
        right = F.broadcast(boxed.alias("g")) if broadcast_geoms else boxed.alias("g")
        cond = bbox_contains(F.col("g.__bbox"), pt) & point_in_polygon(
            pt, F.col(f"g.{polygon_col}")
        )
        return points.alias("p").join(right, cond, how).drop("__bbox")
    pts, geoms, key_cond = _gridded(points, boxed, point_col, 0.05, cell_deg, how)
    right = F.broadcast(geoms.alias("g")) if broadcast_geoms else geoms.alias("g")
    cond = (
        key_cond
        & bbox_contains(F.col("g.__bbox"), pt)
        & point_in_polygon(pt, F.col(f"g.{polygon_col}"))
    )
    out = pts.alias("p").join(right, cond, how)
    return out.drop("__cell", "__bbox", "__lvl")


def points_in_circles(
    points: DataFrame,
    circles: DataFrame,
    point_col: str = "the_geom",
    center_col: str = "center",
    radius_col: str = "radius_m",
    cell_deg: float | None = None,
    broadcast_geoms: bool = True,
    how: str = "inner",
    strategy: str = "grid",
) -> DataFrame:
    """Equi-join points to containing circles (haversine <= radius).

    Circle bbox: radius in degrees, latitude-aware longitude bound.
    ``cell_deg=None`` sizes the grid to the largest circle.
    ``strategy`` as in :func:`points_in_polygons`.
    """
    deg_lat = F.col(radius_col) / F.lit(111194.9)
    # conservative lng expansion at |lat| (cos shrink), capped at x4
    coslat = F.greatest(F.cos(F.radians(F.col(center_col)["lat"])), F.lit(0.25))
    deg_lng = deg_lat / coslat
    box = F.struct(
        (F.col(center_col)["lng"] - deg_lng).alias("xmin"),
        (F.col(center_col)["lng"] + deg_lng).alias("xmax"),
        (F.col(center_col)["lat"] - deg_lat).alias("ymin"),
        (F.col(center_col)["lat"] + deg_lat).alias("ymax"),
    )
    from nyc_crash_mapper_etl_script_spark.functions.scratch import reserve

    reserve(circles, "__bbox", "__cell", "__lvl")
    reserve(points, "__cell", "__lvl")
    boxed = circles.withColumn("__bbox", box)
    if strategy == "nlj":
        pt = F.col(f"p.{point_col}")
        right = F.broadcast(boxed.alias("g")) if broadcast_geoms else boxed.alias("g")
        cond = bbox_contains(F.col("g.__bbox"), pt) & point_in_circle_m(
            pt, F.col(f"g.{center_col}"), F.col(f"g.{radius_col}")
        )
        return points.alias("p").join(right, cond, how).drop("__bbox")
    pts, geoms, key_cond = _gridded(points, boxed, point_col, 0.01, cell_deg, how)
    right = F.broadcast(geoms.alias("g")) if broadcast_geoms else geoms.alias("g")
    pt = F.col(f"p.{point_col}")
    cond = (
        key_cond
        & bbox_contains(F.col("g.__bbox"), pt)
        & point_in_circle_m(pt, F.col(f"g.{center_col}"), F.col(f"g.{radius_col}"))
    )
    out = pts.alias("p").join(right, cond, how)
    return out.drop("__cell", "__bbox", "__lvl")
