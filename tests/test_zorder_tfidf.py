"""Z-order clustering layout and TF-IDF semantics.

The z-order test is the point of the operator: after cluster_write,
per-FILE bounding boxes in (x, y) must be far tighter than a layout
clustered on one column only -- tight boxes are what parquet footer
pruning skips on.  TF-IDF: hand-checked scores on a tiny corpus and
rarity ordering (a corpus-wide token never outranks a rare one with
equal tf)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.operators.vocab import tf_idf, top_terms_per_doc
from nyc_crash_mapper_etl_script_spark.operators.zorder import (
    cluster_write,
    interleave_bits,
    zorder_value,
)


def test_interleave_bits_known_values(spark):
    df = spark.createDataFrame([(3, 0), (0, 3), (2, 1), (255, 255)], "x long, y long")
    got = [
        r["z"]
        for r in df.select(
            interleave_bits(F.col("x"), F.col("y"), 8).alias("z")
        ).collect()
    ]
    # x bits go to odd positions, y bits to even
    assert got == [0b1010, 0b0101, 0b1001, 0xFFFF]


def test_zorder_value_corners_and_nulls(spark):
    rows = [(1, 0.0, 0.0), (2, 1.0, 1.0), (3, None, 0.5), (4, 0.5, None)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    z = {r["id"]: r["zv"] for r in zorder_value(df, "x", "y", bits=4).collect()}
    assert z[1] == 0                       # min corner
    assert z[2] == (1 << 8) - 1            # max corner: all 8 bits set
    assert z[3] == -1 and z[4] == -1       # NULLs cluster at the front


def _file_boxes(spark, path, x, y):
    return (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min(x).alias("x0"), F.max(x).alias("x1"),
            F.min(y).alias("y0"), F.max(y).alias("y1"),
        )
        .collect()
    )


def _files_touched(boxes, lo, hi, axis):
    a, b = ("x0", "x1") if axis == "x" else ("y0", "y1")
    return sum(1 for r in boxes if r[b] >= lo and r[a] <= hi)


def test_cluster_write_prunes_on_both_dimensions(spark, tmp_path_factory):
    """The point of z-order: a range sort on x alone gives every file
    the FULL y span (a y predicate prunes nothing); Morton clustering
    bounds every file in both dimensions, so footer min/max prune on
    either axis."""
    root = tmp_path_factory.mktemp("zorder")
    from nyc_crash_mapper_etl_script_spark.schemas import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", F.col("value").alias("x"),
        F.col("user_id").cast("double").alias("y"),
    )
    n_files = 16
    zp, rp = str(root / "z"), str(root / "r")
    # baseline: clustered on x ONLY (range sort) -- y is unclustered
    ev.repartitionByRange(n_files, "x").sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(rp)
    cluster_write(ev, zp, "x", "y", n_files=n_files, bits=16)
    assert spark.read.parquet(zp).count() == ev.count()  # same data

    zb = _file_boxes(spark, zp, "x", "y")
    rb = _file_boxes(spark, rp, "x", "y")
    (y0, y1), = ev.agg(F.min("y"), F.max("y")).collect()
    # a 10%-of-range y band: the x-sorted layout cannot prune at all;
    # the z-ordered layout must skip a substantial share of files
    lo = y0 + 0.45 * (y1 - y0)
    hi = y0 + 0.55 * (y1 - y0)
    r_touched = _files_touched(rb, lo, hi, "y")
    z_touched = _files_touched(zb, lo, hi, "y")
    assert r_touched == len(rb)  # every file intersects the band
    assert z_touched <= 0.6 * r_touched, (z_touched, r_touched)
    # and x predicates still prune: no file spans the full x range
    (x0, x1), = ev.agg(F.min("x"), F.max("x")).collect()
    assert all(r["x1"] - r["x0"] < 0.8 * (x1 - x0) for r in zb)


def test_tfidf_hand_checked(spark):
    df = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "banana")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["token"]): (r["tf"], r["score"])
        for r in tf_idf(df).collect()
    }
    idf = lambda df_: math.log((3 + 1.0) / (df_ + 1.0)) + 1.0
    assert got[(1, "apple")] == (2, round(2 * idf(1), 6))
    assert got[(1, "banana")] == (1, round(1 * idf(3), 6))
    assert got[(2, "cherry")] == (1, round(1 * idf(1), 6))
    # rare token outscores the ubiquitous one at equal tf
    assert got[(2, "cherry")][1] > got[(2, "banana")][1]
    top = [
        (r["doc_id"], r["rank"], r["token"])
        for r in top_terms_per_doc(df, n=1).collect()
    ]
    assert (1, 1, "apple") in top and (2, 1, "cherry") in top
