"""Geospatial Column expressions (no PostGIS, no UDFs).

The reference delegates all geometry to PostGIS (``ST_Within``
main.py:418, ``ST_Contains`` main.py:632, ``ST_Intersects``
main.py:398 / initialpolygonlinkage/linkthem.py:71, haversine in
Python at main.py:1117-1129).  Here:

 - points are ``struct<lng double, lat double>`` (schemas.POINT_SCHEMA)
 - polygons are vertex arrays ``array<struct<x double, y double>>``
 - every predicate is a pure Column expression -> Catalyst sees it,
   whole-stage codegen runs it, and a cheap bbox conjunct prunes
   before the exact test (critical at 100 TB: the bbox predicate is
   a range condition Catalyst can use to avoid O(n*m) exact tests).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Earth radius used by the reference's haversine (main.py:1120) --
#: NOT the usual 6371000; fidelity matters for the >15 m threshold.
EARTH_RADIUS_M = 6372800.0


def point(lng: Column, lat: Column) -> Column:
    """``ST_GeomFromText('Point(lng lat)', 4326)`` analog
    (main.py:219-224): NULL when either coordinate is NULL."""
    p = F.struct(lng.cast("double").alias("lng"), lat.cast("double").alias("lat"))
    return F.when(lng.isNotNull() & lat.isNotNull(), p)


def haversine_m_exact(lng1: Column, lat1: Column, lng2: Column, lat2: Column) -> Column:
    """Great-circle distance in meters, double precision."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1)
    dlng = F.radians(lng2 - lng1)
    a = (
        F.pow(F.sin(dlat / F.lit(2.0)), F.lit(2.0))
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin(dlng / F.lit(2.0)), F.lit(2.0))
    )
    return F.lit(2.0 * EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def haversine_m(lng1: Column, lat1: Column, lng2: Column, lat2: Column) -> Column:
    """Reference-faithful haversine: integer meters, R=6372800,
    ``int(round(...))`` (main.py:1117-1129).  Column-only (the
    reference's Python helper would be a per-row UDF; this stays in
    codegen)."""
    return F.round(haversine_m_exact(lng1, lat1, lng2, lat2)).cast("long")


def point_in_circle_m(pt: Column, center: Column, radius_m: Column) -> Column:
    """``ST_Contains(circle, point)`` for circle buffers
    (main.py:632): containment == haversine(center, pt) <= radius."""
    return (
        haversine_m_exact(pt["lng"], pt["lat"], center["lng"], center["lat"]) <= radius_m
    )


def polygon_bbox(poly: Column) -> Column:
    """min/max bounding box of a vertex array -- the ``ST_Extent``
    analog (main.py:389), usable as a pre-computed dimension column so
    the join predicate starts with cheap range checks."""
    xs = F.transform(poly, lambda v: v["x"])
    ys = F.transform(poly, lambda v: v["y"])
    return F.struct(
        F.array_min(xs).alias("xmin"),
        F.array_max(xs).alias("xmax"),
        F.array_min(ys).alias("ymin"),
        F.array_max(ys).alias("ymax"),
    )


def bbox_contains(box: Column, pt: Column) -> Column:
    """Range predicate: point within bbox struct (xmin..ymax)."""
    return (
        (pt["lng"] >= box["xmin"])
        & (pt["lng"] <= box["xmax"])
        & (pt["lat"] >= box["ymin"])
        & (pt["lat"] <= box["ymax"])
    )


def point_in_polygon(pt: Column, poly: Column) -> Column:
    """Ray-casting point-in-polygon as a pure Column expression
    (``ST_Within`` analog, main.py:418).

    Even-odd rule via ``F.aggregate`` over the vertex array zipped
    with its rotation (edge list).  Entirely JVM-side: the lambda
    compiles to Catalyst ``HigherOrderFunction`` expressions, so a
    broadcast-join with this predicate never leaves codegen.

    Always conjoin :func:`bbox_contains` first in join conditions so
    the exact test only runs on bbox survivors.
    """
    n = F.size(poly)
    # edges: (vertex[i], vertex[(i+1) % n])
    idx = F.sequence(F.lit(0), n - F.lit(1))
    crossings = F.aggregate(
        idx,
        F.lit(0),
        lambda acc, i: acc
        + _crosses(
            pt,
            F.element_at(poly, i + F.lit(1)),
            F.element_at(poly, (i + F.lit(1)) % n + F.lit(1)),
        ),
    )
    return (crossings % F.lit(2)) == F.lit(1)


def _crosses(pt: Column, a: Column, b: Column) -> Column:
    """1 when the horizontal ray from pt crosses edge a->b, else 0."""
    px, py = pt["lng"], pt["lat"]
    cond_y = (a["y"] > py) != (b["y"] > py)
    # x coordinate where the edge crosses the ray's latitude
    x_at = a["x"] + (py - a["y"]) / (b["y"] - a["y"]) * (b["x"] - a["x"])
    return F.when(cond_y & (px < x_at), F.lit(1)).otherwise(F.lit(0))


def extent_agg(df, lng_col: str, lat_col: str):
    """``ST_SetSRID(ST_Extent(geom),4326)`` analog (main.py:389):
    min/max aggregate -> one-row bbox DataFrame."""
    return df.agg(
        F.min(lng_col).alias("xmin"),
        F.max(lng_col).alias("xmax"),
        F.min(lat_col).alias("ymin"),
        F.max(lat_col).alias("ymax"),
    )
