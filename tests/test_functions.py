"""Unit tests for the pure Column helpers (crash-domain quirks from
SURVEY.md §7.4)."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.functions.arrays import (
    collapse_numbered_columns,
    split_strip_quotes,
)
from nyc_crash_mapper_etl_script_spark.functions.datetime_fns import (
    combine_date_time,
    derive_year_month,
    updated_after_created,
)
from nyc_crash_mapper_etl_script_spark.functions.fingerprint import row_fingerprint
from nyc_crash_mapper_etl_script_spark.functions.geo import (
    EARTH_RADIUS_M,
    bbox_contains,
    haversine_m,
    point,
    point_in_circle_m,
    point_in_polygon,
    polygon_bbox,
)
from nyc_crash_mapper_etl_script_spark.functions.text import (
    doc_fingerprint,
    language_id,
    quality_score,
    shingles,
    whitespace_token_count,
)
from nyc_crash_mapper_etl_script_spark.functions.vectors import cosine


def _one(df):
    return df.collect()[0][0]


def test_haversine_reference_faithful(spark):
    """Reproduce the reference's Python haversine (main.py:1117-1129)
    exactly: R=6372800, int(round(...))."""

    def ref_haversine(lon1, lat1, lon2, lat2):
        rlon1, rlat1, rlon2, rlat2 = map(math.radians, [lon1, lat1, lon2, lat2])
        dlon = rlon2 - rlon1
        dlat = rlat2 - rlat1
        a = (
            math.sin(dlat / 2) ** 2
            + math.cos(rlat1) * math.cos(rlat2) * math.sin(dlon / 2) ** 2
        )
        return int(round(2 * EARTH_RADIUS_M * math.asin(math.sqrt(a))))

    cases = [
        (-73.99, 40.75, -73.98, 40.76),
        (-74.2, 40.5, -73.7, 40.9),
        (-73.95, 40.7, -73.95, 40.7),
        (-73.9500001, 40.7000001, -73.95, 40.7),
    ]
    df = spark.createDataFrame(cases, "lng1 double, lat1 double, lng2 double, lat2 double")
    got = df.select(
        haversine_m(F.col("lng1"), F.col("lat1"), F.col("lng2"), F.col("lat2")).alias("d")
    ).collect()
    for row, (lon1, lat1, lon2, lat2) in zip(got, cases):
        assert row["d"] == ref_haversine(lon1, lat1, lon2, lat2)


def test_point_null_when_coord_missing(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (None, 2.0), (1.0, None)], "lng double, lat double"
    )
    out = df.select(point(F.col("lng"), F.col("lat")).alias("p")).collect()
    assert out[0]["p"] == Row(lng=1.0, lat=2.0)
    assert out[1]["p"] is None
    assert out[2]["p"] is None


def test_point_in_polygon_square_and_concave(spark):
    square = [(0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0)]
    # concave "L" polygon
    ell = [(0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0), (2.0, 4.0), (0.0, 4.0)]
    cases = [
        (1.0, 1.0, True, True),
        (3.0, 3.0, False, False),  # outside L notch, inside square
        (3.0, 1.0, True, True),
        (1.0, 3.0, True, True),
        (5.0, 5.0, False, False),
        (-1.0, 2.0, False, False),
    ]
    rows = [
        Row(
            pt=Row(lng=x, lat=y),
            square=[Row(x=a, y=b) for a, b in square],
            ell=[Row(x=a, y=b) for a, b in ell],
            in_ell=e_in,
            in_sq=s_in,
        )
        for x, y, e_in, s_in in [(x, y, e, (0 < x < 4 and 0 < y < 4)) for x, y, e, _ in cases]
    ]
    df = spark.createDataFrame(rows)
    got = df.select(
        point_in_polygon(F.col("pt"), F.col("square")).alias("sq"),
        point_in_polygon(F.col("pt"), F.col("ell")).alias("el"),
        F.col("in_sq"),
        F.col("in_ell"),
    ).collect()
    for r in got:
        assert r["sq"] == r["in_sq"]
        assert r["el"] == r["in_ell"]


def test_polygon_bbox_and_contains(spark):
    poly = [Row(x=1.0, y=2.0), Row(x=3.0, y=0.5), Row(x=2.0, y=4.0)]
    df = spark.createDataFrame([Row(poly=poly, pt=Row(lng=2.0, lat=2.0))])
    out = df.select(
        polygon_bbox(F.col("poly")).alias("box"),
        bbox_contains(polygon_bbox(F.col("poly")), F.col("pt")).alias("c"),
    ).collect()[0]
    assert out["box"] == Row(xmin=1.0, xmax=3.0, ymin=0.5, ymax=4.0)
    assert out["c"] is True


def test_point_in_circle(spark):
    # ~1113 m between 0.01 deg lat at equator
    df = spark.createDataFrame(
        [Row(pt=Row(lng=0.0, lat=0.01), c=Row(lng=0.0, lat=0.0))]
    )
    assert _one(df.select(point_in_circle_m(F.col("pt"), F.col("c"), F.lit(1200.0))))
    assert not _one(df.select(point_in_circle_m(F.col("pt"), F.col("c"), F.lit(1000.0))))


def test_split_strip_quotes_reference_semantics(spark):
    """main.py:158-161: strip single quotes, split on \\s*,\\s*, trim."""
    df = spark.createDataFrame([("  Driver Inattention , 'Unsafe Speed' ,,Other  ",)], "v string")
    out = _one(df.select(split_strip_quotes(F.col("v"))))
    assert out == ["Driver Inattention", "Unsafe Speed", "Other"]


def test_collapse_numbered_columns(spark):
    df = spark.createDataFrame(
        [("Sedan", None, "SUV, Truck", "", "'Bike'")],
        "c1 string, c2 string, c3 string, c4 string, c5 string",
    )
    out = _one(
        df.select(
            collapse_numbered_columns(*[F.col(f"c{i}") for i in range(1, 6)])
        )
    )
    assert out == ["Sedan", "SUV", "Truck", "Bike"]


def test_combine_date_time(spark):
    """main.py:205-206: date part of ISO string + 'T' + H:MM."""
    df = spark.createDataFrame(
        [("2024-07-04T00:00:00.000", "9:35"), ("2024-07-04", "23:05")],
        "d string, t string",
    )
    out = df.select(combine_date_time(F.col("d"), F.col("t")).alias("ts")).collect()
    assert str(out[0]["ts"]) == "2024-07-04 09:35:00"
    assert str(out[1]["ts"]) == "2024-07-04 23:05:00"


def test_year_month_strings(spark):
    df = spark.createDataFrame([("2024-07-04 09:35:00",)], "s string").select(
        F.col("s").cast("timestamp").alias("ts")
    )
    y, m = derive_year_month(F.col("ts"))
    row = df.select(y.alias("y"), m.alias("m")).collect()[0]
    assert (row["y"], row["m"]) == ("2024", "07")


def test_updated_after_created_date_prefix(spark):
    df = spark.createDataFrame(
        [
            ("2024-07-04 23:59:00", "2024-07-05 00:01:00", True),
            ("2024-07-04 01:00:00", "2024-07-04 23:59:59", False),
            ("2024-07-04 01:00:00", "2024-09-01 00:00:00", True),
        ],
        "created string, updated string, expect boolean",
    )
    got = df.select(
        updated_after_created(
            F.col("updated").cast("timestamp"), F.col("created").cast("timestamp")
        ).alias("u"),
        "expect",
    ).collect()
    for r in got:
        assert r["u"] == r["expect"]


def test_row_fingerprint_null_sensitivity(spark):
    df = spark.createDataFrame(
        [("a", None), ("a", ""), ("a", "x")], "c1 string, c2 string"
    )
    fps = [r[0] for r in df.select(row_fingerprint(F.col("c1"), F.col("c2"))).collect()]
    assert len(set(fps)) == 3  # NULL, '' and 'x' all distinct


def test_text_helpers(spark):
    df = spark.createDataFrame(
        [
            ("the quick brown fox and the lazy dog is here", "en"),
            ("der hund ist nicht und der", "de"),
            ("", "und"),
            ("zzz qqq", "und"),
        ],
        "text string, expect string",
    )
    got = df.select(
        language_id(F.col("text")).alias("lang"),
        whitespace_token_count(F.col("text")).alias("n"),
        quality_score(F.col("text")).alias("q"),
        "expect",
        "text",
    ).collect()
    for r in got:
        assert r["lang"] == r["expect"]
        assert r["n"] == (0 if r["text"] == "" else len(r["text"].split()))
        assert 0.0 <= r["q"] <= 1.0


def test_doc_fingerprint_whitespace_invariant(spark):
    df = spark.createDataFrame(
        [("Hello   World",), ("hello world",), ("  HELLO\tWORLD  ",), ("other",)],
        "t string",
    )
    fps = [r[0] for r in df.select(doc_fingerprint(F.col("t"))).collect()]
    assert fps[0] == fps[1] == fps[2]
    assert fps[3] != fps[0]


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d e f",), ("a b",), ("",)], "t string")
    out = [r[0] for r in df.select(shingles(F.col("t"), k=5)).collect()]
    assert out[0] == ["a b c d e", "b c d e f"]
    assert out[1] == ["a b"]
    assert out[2] == []


def test_cosine(spark):
    df = spark.createDataFrame(
        [Row(a=[1.0, 0.0], b=[1.0, 0.0]), Row(a=[1.0, 0.0], b=[0.0, 1.0])]
    )
    got = [r[0] for r in df.select(cosine(F.col("a"), F.col("b"))).collect()]
    assert abs(got[0] - 1.0) < 1e-12
    assert abs(got[1]) < 1e-12
