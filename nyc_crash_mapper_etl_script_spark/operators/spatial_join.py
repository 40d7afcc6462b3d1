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


def point_cell(lng: Column, lat: Column, cell_deg: float) -> Column:
    """Single grid-cell id for a point."""
    ix = F.floor((lng + 180.0) / cell_deg).cast("long")
    iy = F.floor((lat + 90.0) / cell_deg).cast("long")
    return F.shiftleft(ix, _GRID_SHIFT) + iy


def bbox_cells(box: Column, cell_deg: float) -> Column:
    """All grid-cell ids a bbox struct overlaps (array<long>)."""
    x0 = F.floor((box["xmin"] + 180.0) / cell_deg).cast("long")
    x1 = F.floor((box["xmax"] + 180.0) / cell_deg).cast("long")
    y0 = F.floor((box["ymin"] + 90.0) / cell_deg).cast("long")
    y1 = F.floor((box["ymax"] + 90.0) / cell_deg).cast("long")
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


def _adaptive_cell(geoms: DataFrame, floor_deg: float) -> float:
    """Pick the cell size from the dimension's bbox statistics: the
    SMALLEST cell whose total (geometry x overlapped-cells) fan-out
    stays within ``_CELL_BUDGET`` rows.

    Sizing to the largest geometry edge (the obvious rule) collapses
    for layered dimensions of mixed scale -- one borough-sized polygon
    forces borough-sized cells, so every cell holds a geometry from
    EVERY layer and each fact row pays an exact pip test per layer.
    Small cells keep ~one candidate per layer; correctness never
    depends on the size because bbox_cells enumerates every overlapped
    cell.  Expected fan-out for cell c: sum_i (dx_i/c + 1)(dy_i/c + 1)
    = A/c^2 + B/c + n with A = sum dx*dy, B = sum (dx+dy); solve the
    quadratic for the budget.  One tiny driver action on the DIMENSION
    side only (never the fact table)."""
    row = geoms.agg(
        F.sum(
            (F.col("__bbox")["xmax"] - F.col("__bbox")["xmin"])
            * (F.col("__bbox")["ymax"] - F.col("__bbox")["ymin"])
        ).alias("a"),
        F.sum(
            (F.col("__bbox")["xmax"] - F.col("__bbox")["xmin"])
            + (F.col("__bbox")["ymax"] - F.col("__bbox")["ymin"])
        ).alias("b"),
        F.count(F.lit(1)).alias("n"),
        F.max(F.col("__bbox")["xmax"] - F.col("__bbox")["xmin"]).alias("dx"),
        F.max(F.col("__bbox")["ymax"] - F.col("__bbox")["ymin"]).alias("dy"),
    ).first()
    a, b, n = row["a"] or 0.0, row["b"] or 0.0, row["n"] or 0
    slack = _CELL_BUDGET - n
    if slack <= 0 or (a <= 0.0 and b <= 0.0):
        # degenerate: point-like geoms, or more geoms than budget ->
        # fall back to the coarse largest-edge rule (<=4 cells each)
        biggest = max(row["dx"] or 0.0, row["dy"] or 0.0)
        return max(floor_deg, biggest * 1.001)
    if a > 0.0:
        inv_c = (-b + (b * b + 4.0 * a * slack) ** 0.5) / (2.0 * a)
    else:
        inv_c = slack / b
    return max(floor_deg, 1.0 / inv_c if inv_c > 0 else floor_deg)


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
    pt = F.col(f"p.{point_col}")
    boxed = polygons.withColumn("__bbox", polygon_bbox(F.col(polygon_col)))
    if strategy == "nlj":
        right = F.broadcast(boxed.alias("g")) if broadcast_geoms else boxed.alias("g")
        cond = bbox_contains(F.col("g.__bbox"), pt) & point_in_polygon(
            pt, F.col(f"g.{polygon_col}")
        )
        return points.alias("p").join(right, cond, how).drop("__bbox")
    if cell_deg is None:
        cell_deg = _adaptive_cell(boxed, 0.05)
    geoms = boxed.withColumn("__cell", F.explode(bbox_cells(F.col("__bbox"), cell_deg)))
    pts = points.withColumn("__cell", point_cell(
        F.col(point_col)["lng"], F.col(point_col)["lat"], cell_deg
    ))
    right = F.broadcast(geoms.alias("g")) if broadcast_geoms else geoms.alias("g")
    cond = (
        (F.col("p.__cell") == F.col("g.__cell"))
        & bbox_contains(F.col("g.__bbox"), pt)
        & point_in_polygon(pt, F.col(f"g.{polygon_col}"))
    )
    out = pts.alias("p").join(right, cond, how)
    return out.drop("__cell", "__bbox")


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
    boxed = circles.withColumn("__bbox", box)
    if strategy == "nlj":
        pt = F.col(f"p.{point_col}")
        right = F.broadcast(boxed.alias("g")) if broadcast_geoms else boxed.alias("g")
        cond = bbox_contains(F.col("g.__bbox"), pt) & point_in_circle_m(
            pt, F.col(f"g.{center_col}"), F.col(f"g.{radius_col}")
        )
        return points.alias("p").join(right, cond, how).drop("__bbox")
    if cell_deg is None:
        cell_deg = _adaptive_cell(boxed, 0.01)
    geoms = boxed.withColumn("__cell", F.explode(bbox_cells(F.col("__bbox"), cell_deg)))
    pts = points.withColumn("__cell", point_cell(
        F.col(point_col)["lng"], F.col(point_col)["lat"], cell_deg
    ))
    right = F.broadcast(geoms.alias("g")) if broadcast_geoms else geoms.alias("g")
    pt = F.col(f"p.{point_col}")
    cond = (
        (F.col("p.__cell") == F.col("g.__cell"))
        & bbox_contains(F.col("g.__bbox"), pt)
        & point_in_circle_m(pt, F.col(f"g.{center_col}"), F.col(f"g.{radius_col}"))
    )
    out = pts.alias("p").join(right, cond, how)
    return out.drop("__cell", "__bbox")
