"""Operator tests over crash-shaped fixtures (FIXTURES.md), porting
the reference's operational invariants (SURVEY.md §5): dedup-insert
idempotence, enrichment determinism, blame sum conservation, CDC
classification."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.operators.blame import allocate_blame
from nyc_crash_mapper_etl_script_spark.operators.cdc import apply_cdc, classify
from nyc_crash_mapper_etl_script_spark.operators.dedup_merge import dedup_merge, new_rows
from nyc_crash_mapper_etl_script_spark.operators.enrichment import (
    filter_to_extent,
    intersection_crash_counts,
    link_districts,
    unmapped_vehicle_types,
    update_intersection_counts,
    vehicle_flags,
)
from nyc_crash_mapper_etl_script_spark.operators.reconcile import (
    apply_tally_updates,
    moved_geoms,
    tally_mismatches,
)
from nyc_crash_mapper_etl_script_spark.operators.topk import per_group_top_n_pivot, top_k


# ---------------------------------------------------------------------------
# dedup merge (J1/J3/S8)
# ---------------------------------------------------------------------------


def test_dedup_merge_idempotent(spark):
    existing = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "legacy")], "socrata_id long, payload string"
    )
    staged = spark.createDataFrame(
        [(2, "b2"), (3, "c")], "socrata_id long, payload string"
    )
    out = dedup_merge(staged, existing, "socrata_id")
    assert out.count() == 4  # 3 existing + only id=3 added
    again = dedup_merge(staged, out, "socrata_id")
    assert again.count() == 4  # idempotent
    assert new_rows(staged, out, "socrata_id").count() == 0


def test_dedup_merge_drops_null_keyed_staged(spark):
    """NULL-keyed staged rows never insert (reference NOT IN
    semantics: NULL NOT IN (non-empty set) is never TRUE)."""
    existing = spark.createDataFrame([(1, "a")], "socrata_id long, payload string")
    staged = spark.createDataFrame(
        [(None, "dirty"), (2, "b")], "socrata_id long, payload string"
    )
    got = new_rows(staged, existing, "socrata_id").collect()
    assert [(r["socrata_id"], r["payload"]) for r in got] == [(2, "b")]


# ---------------------------------------------------------------------------
# CDC (C1)
# ---------------------------------------------------------------------------


def _cdc_frames(spark):
    src = spark.createDataFrame(
        [
            (1, "same", 0),
            (2, "changed-src", 0),
            (4, "new", 0),
            (5, "tombstoned", 1),
            (6, "deleted-never-synced", 1),
        ],
        "id long, payload string, isDelete int",
    )
    tgt = spark.createDataFrame(
        [(1, "same"), (2, "changed-tgt"), (3, "hard-deleted"), (5, "tombstoned")],
        "id long, payload string",
    )
    return src, tgt


def test_cdc_classify_all_classes(spark):
    src, tgt = _cdc_frames(spark)
    got = {
        r["id"]: r["cdc_class"]
        for r in classify(
            src, tgt, "id", ["payload"], is_delete=F.col("isDelete") == 1
        ).collect()
    }
    assert got == {
        1: "skip",
        2: "update",
        3: "delete",
        4: "insert",
        5: "delete",
        6: "skip",
    }


def test_cdc_apply(spark):
    src, tgt = _cdc_frames(spark)
    out = apply_cdc(src, tgt, "id", ["payload"], is_delete=F.col("isDelete") == 1)
    rows = {r["id"]: r["payload"] for r in out.collect()}
    # 3 hard-deleted (absent from src), 5 tombstoned, 6 never synced;
    # 4 inserted, 2 updated from src, 1 kept from target
    assert rows == {1: "same", 2: "changed-src", 4: "new"}


# ---------------------------------------------------------------------------
# reconciliation (C2/C3)
# ---------------------------------------------------------------------------


def test_tally_reconcile_roundtrip(spark):
    cols = "k long, t1 int, t2 int"
    snapshot = spark.createDataFrame([(1, 1, 1), (2, 2, 2), (3, 3, 3)], cols)
    source = spark.createDataFrame([(1, 1, 1), (2, 9, 2), (3, 3, 9)], cols)
    mm = tally_mismatches(source, snapshot, "k", ["t1", "t2"])
    assert {r["k"] for r in mm.collect()} == {2, 3}
    fixed = apply_tally_updates(snapshot, mm, "k", ["t1", "t2"])
    assert tally_mismatches(source, fixed, "k", ["t1", "t2"]).count() == 0


def test_moved_geoms_threshold(spark):
    cols = "k long, longitude double, latitude double"
    # ~0.0002 deg lat ~ 22 m; 0.0001 ~ 11 m
    snapshot = spark.createDataFrame(
        [(1, -73.99, 40.75), (2, -73.99, 40.75), (3, None, None), (4, -73.0, 40.0)],
        cols,
    )
    source = spark.createDataFrame(
        [
            (1, -73.99, 40.7502),  # moved ~22m -> update
            (2, -73.99, 40.7501),  # moved ~11m -> skip
            (3, -73.98, 40.74),  # new geom -> update
            (4, -73.0, 40.0),  # unchanged
        ],
        cols,
    )
    got = {r["k"] for r in moved_geoms(source, snapshot, "k").collect()}
    assert got == {1, 3}


# ---------------------------------------------------------------------------
# top-k / per-group pivot (O3/W1)
# ---------------------------------------------------------------------------


def test_top_k_deterministic(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 20)], "id int, score int"
    )
    got = [r["id"] for r in top_k(df, "score", 2, "id").collect()]
    assert got == [2, 3]


def test_per_group_top_n_pivot(spark):
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "d"), (1, 5, "e"), (1, 6, "f"),
        (2, 7, "x"),
    ]
    df = spark.createDataFrame(rows, "grp int, ord int, val string")
    out = {r["grp"]: r for r in
           per_group_top_n_pivot(df, "grp", "ord", "val", n=5).collect()}
    assert [out[1][f"item{i}"] for i in range(1, 6)] == ["a", "b", "c", "d", "e"]
    assert out[2]["item1"] == "x" and out[2]["item5"] is None


# ---------------------------------------------------------------------------
# vehicle flags + crosswalk audit (J4/J9)
# ---------------------------------------------------------------------------


def _crosswalk(spark):
    return spark.createDataFrame(
        [
            ("sedan", "CAR"),
            ("station wagon/sport utility vehicle", "SUV"),
            ("bike", "BICYCLE"),
            ("moped", "MOTORCYCLE-MOPED"),
            ("e-scooter", "E-BIKE-SCOOT"),
            ("bus", "BUS-VAN"),
            ("pick-up truck", "TRUCK"),
            ("garbage or refuse", "OTHER"),
        ],
        "nyc_vehicletype string, crashmapper_vehicletype string",
    )


def test_vehicle_flags(spark):
    crashes = spark.createDataFrame(
        [
            (1, ["sedan", "bike"]),
            (2, ["unknown thing"]),
            (3, []),
            (4, None),
        ],
        "cartodb_id long, vehicle_type array<string>",
    )
    out = {r["cartodb_id"]: r for r in
           vehicle_flags(crashes, _crosswalk(spark)).collect()}
    assert out[1]["hasvehicle_car"] is True
    assert out[1]["hasvehicle_bicycle"] is True
    assert out[1]["hasvehicle_suv"] is False
    assert out[2]["hasvehicle_car"] is False
    assert out[3]["hasvehicle_truck"] is False
    assert out[4]["hasvehicle_truck"] is False


def test_unmapped_vehicle_types(spark):
    crashes = spark.createDataFrame(
        [(1, ["sedan", "weird type"]), (2, ["bike", "morotcycel"])],
        "cartodb_id long, vehicle_type array<string>",
    )
    got = {r["nyc_vehicletype"] for r in
           unmapped_vehicle_types(crashes, _crosswalk(spark)).collect()}
    assert got == {"weird type", "morotcycel"}


# ---------------------------------------------------------------------------
# blame allocation (main.py:650-790)
# ---------------------------------------------------------------------------


def _blame_input(spark, flags, tallies=(1, 0, 2, 0, 3, 0)):
    """flags: dict of hasvehicle_* booleans."""
    base = {f"hasvehicle_{k}": flags.get(k, False) for k in
            ["bicycle", "motorcycle", "scooter", "busvan", "car", "suv", "truck", "other"]}
    ci, ck, mi, mk, pi, pk = tallies
    base.update(
        number_of_cyclist_injured=ci, number_of_cyclist_killed=ck,
        number_of_motorist_injured=mi, number_of_motorist_killed=mk,
        number_of_pedestrian_injured=pi, number_of_pedestrian_killed=pk,
    )
    return spark.createDataFrame([Row(**base)])


def test_blame_car_only(spark):
    out = allocate_blame(_blame_input(spark, {"car": True})).collect()[0]
    assert out["bike_blame"] is False
    assert out["blame_factor"] == 1.0
    assert out["hasvehicle_other_unspecified"] is False
    assert out["cyclist_injured_bycar"] == 1.0
    assert out["persons_injured_bycar"] == 6.0  # 1+2+3
    assert out["cyclist_injured_bybike"] == 0.0


def test_blame_bike_only(spark):
    out = allocate_blame(_blame_input(spark, {"bicycle": True})).collect()[0]
    assert out["bike_blame"] is True
    assert out["blame_factor"] == 1.0
    assert out["cyclist_injured_bybike"] == 1.0
    assert out["cyclist_injured_bycar"] == 0.0


def test_blame_bike_and_car_blames_car(spark):
    out = allocate_blame(
        _blame_input(spark, {"bicycle": True, "car": True})
    ).collect()[0]
    assert out["bike_blame"] is False
    assert out["blame_factor"] == 1.0  # one motor vehicle
    assert out["cyclist_injured_bybike"] == 0.0
    assert out["cyclist_injured_bycar"] == 1.0


def test_blame_no_vehicle_goes_to_other(spark):
    out = allocate_blame(_blame_input(spark, {})).collect()[0]
    assert out["hasvehicle_other_unspecified"] is True
    assert out["blame_factor"] == 1.0  # the +1 other_unspecified denominator
    assert out["cyclist_injured_byother"] == 1.0
    assert out["persons_injured_byother"] == 6.0


def test_blame_split_two_motors(spark):
    out = allocate_blame(
        _blame_input(spark, {"car": True, "truck": True})
    ).collect()[0]
    assert out["blame_factor"] == 0.5
    assert out["cyclist_injured_bycar"] == 0.5
    assert out["cyclist_injured_bytruck"] == 0.5
    # sum conservation: by-vehicle spread sums to the allocated total
    total = sum(out[f"cyclist_injured_by{v}"] for v in
                ["bike", "scooter", "motorcycle", "busvan", "car", "suv", "truck", "other"])
    assert total == out["cyclist_injured_allocated"] * 2  # two gates hit


def test_blame_only_null_guard(spark):
    df = _blame_input(spark, {"car": True})
    first = allocate_blame(df)
    # re-running on an already-blamed frame changes nothing
    again = allocate_blame(first)
    assert first.collect() == again.collect()


# ---------------------------------------------------------------------------
# district linkage (J6) + intersections (J7) + extent filter (J2)
# ---------------------------------------------------------------------------


def _districts(spark):
    def ring(x0, y0, x1, y1):
        return [Row(x=x0, y=y0), Row(x=x1, y=y0), Row(x=x1, y=y1), Row(x=x0, y=y1)]

    rows = [
        Row(kind="borough", identifier="Brooklyn", the_geom=ring(0.0, 0.0, 2.0, 2.0)),
        Row(kind="borough", identifier="Queens", the_geom=ring(2.0, 0.0, 4.0, 2.0)),
        Row(kind="nypd_precinct", identifier="71", the_geom=ring(0.0, 0.0, 1.0, 1.0)),
        Row(kind="city_council", identifier="33", the_geom=ring(0.0, 0.0, 4.0, 4.0)),
    ]
    return spark.createDataFrame(rows)


def test_link_districts(spark):
    schema = ("cartodb_id long, the_geom struct<lng:double,lat:double>, "
              "borough string, nypd_precinct int, city_council int")
    crashes = spark.createDataFrame(
        [
            (1, (0.5, 0.5), None, None, None),
            (2, (3.0, 1.0), None, None, None),
            (3, (9.0, 9.0), None, None, None),
            (4, None, None, None, None),
            (5, (0.5, 0.5), "Manhattan", None, None),
        ],
        schema,
    )
    out = {r["cartodb_id"]: r for r in
           link_districts(crashes, _districts(spark)).collect()}
    assert out[1]["borough"] == "Brooklyn"
    assert out[1]["nypd_precinct"] == 71  # int cast (main.py:528)
    assert out[1]["city_council"] == 33
    assert out[2]["borough"] == "Queens"
    assert out[2]["nypd_precinct"] is None
    assert out[3]["borough"] is None
    assert out[4]["borough"] is None
    # only_null guard: existing value preserved (main.py:419)
    assert out[5]["borough"] == "Manhattan"


def test_link_districts_recompute_overwrites(spark):
    crashes = spark.createDataFrame(
        [(1, (0.5, 0.5), "Wrong", None, None)],
        ("cartodb_id long, the_geom struct<lng:double,lat:double>, "
         "borough string, nypd_precinct int, city_council int"),
    )
    out = link_districts(crashes, _districts(spark), only_null=False).collect()[0]
    assert out["borough"] == "Brooklyn"


def test_intersection_counts_and_update(spark):
    import datetime

    ts = datetime.datetime(2024, 6, 1)
    crashes = spark.createDataFrame(
        [
            Row(cartodb_id=1, the_geom=Row(lng=-73.99, lat=40.75),
                number_of_persons_injured=1, number_of_persons_killed=0, date_val=ts),
            Row(cartodb_id=2, the_geom=Row(lng=-73.9901, lat=40.7501),
                number_of_persons_injured=0, number_of_persons_killed=1, date_val=ts),
            Row(cartodb_id=3, the_geom=Row(lng=-73.99, lat=40.75),
                number_of_persons_injured=0, number_of_persons_killed=0, date_val=ts),
            Row(cartodb_id=4, the_geom=Row(lng=-70.0, lat=40.0),
                number_of_persons_injured=5, number_of_persons_killed=0, date_val=ts),
            Row(cartodb_id=5, the_geom=None,
                number_of_persons_injured=5, number_of_persons_killed=0, date_val=ts),
        ]
    )
    inters = spark.createDataFrame(
        [
            Row(cartodb_id=10, name="x", borough="b",
                the_geom=Row(center=Row(lng=-73.99, lat=40.75), radius_m=30.0),
                crashcount=None),
            Row(cartodb_id=11, name="y", borough="b",
                the_geom=Row(center=Row(lng=-73.5, lat=40.5), radius_m=30.0),
                crashcount=7),
        ]
    )
    counts = intersection_crash_counts(
        crashes, inters, months_window=24, reference_date="2024-07-01"
    )
    got = {r["cartodb_id"]: r["howmany"] for r in counts.collect()}
    assert got == {10: 2}  # crash 3 filtered (no injuries), 4 far away, 5 null geom
    updated = {r["cartodb_id"]: r["crashcount"] for r in
               update_intersection_counts(inters, counts).collect()}
    # 11 cleared to NULL and never re-matched: the reference leaves
    # no-crash intersections NULL (main.py:613-615), not 0
    assert updated == {10: 2, 11: None}


def test_filter_to_extent(spark):
    crashes = spark.createDataFrame(
        [
            Row(cartodb_id=1, the_geom=Row(lng=1.0, lat=1.0), longitude=1.0, latitude=1.0),
            Row(cartodb_id=2, the_geom=Row(lng=99.0, lat=1.0), longitude=99.0, latitude=1.0),
            Row(cartodb_id=3, the_geom=None, longitude=None, latitude=None),
        ]
    )
    out = {r["cartodb_id"]: r for r in
           filter_to_extent(crashes, _districts(spark)).collect()}
    assert out[1]["the_geom"] is not None
    # only the_geom nulled; raw lng/lat survive for geom repair
    # (reference main.py:378-405 NULLs the_geom alone)
    assert out[2]["the_geom"] is None and out[2]["longitude"] == 99.0
    assert out[3]["the_geom"] is None


def test_salted_join_matches_plain(spark):
    from nyc_crash_mapper_etl_script_spark.operators.skew import salted_join

    # 90% of fact rows share one hot key
    fact = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("rowid"),
    )
    dim = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    plain = {(r["rowid"], r["name"]) for r in fact.join(dim, "k").collect()}
    salted = {(r["rowid"], r["name"])
              for r in salted_join(fact, dim, "k", n_salts=8).collect()}
    assert salted == plain
    # the join key really is (k, salt): both sides carry the salt
    plan = salted_join(fact, dim, "k", n_salts=8)._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan
    # left join keeps unmatched skewed rows exactly once
    dim_missing_hot = dim.where(F.col("k") != 7)
    left_plain = fact.join(dim_missing_hot, "k", "left").count()
    left_salted = salted_join(fact, dim_missing_hot, "k", n_salts=8, how="left").count()
    assert left_salted == left_plain == fact.count()


def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    """A-ES: same call reproduces the same sample; zero/negative
    weights are excluded; across salts, a 100x-weight row appears far
    more often than a 1x row (weight proportionality, coarse)."""
    from pyspark.sql import functions as F

    from nyc_crash_mapper_etl_script_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, 100.0 if i == 0 else 1.0) for i in range(50)] + [(99, 0.0)]
    df = spark.createDataFrame(rows, "k long, w double")
    s1 = sorted(r["k"] for r in weighted_sample(df, F.col("k"), F.col("w"), 10).collect())
    s2 = sorted(r["k"] for r in weighted_sample(df, F.col("k"), F.col("w"), 10).collect())
    assert s1 == s2 and len(s1) == 10
    assert 99 not in s1  # zero weight excluded
    hits = sum(
        0 in {r["k"] for r in weighted_sample(df, F.col("k"), F.col("w"), 10, salt=str(t)).collect()}
        for t in range(12)
    )
    assert hits >= 10  # the 100x row is nearly always drawn


def test_pagerank_hand_built_star_graph(spark):
    """A star (hub with 4 spokes, symmetric edges): the hub's rank
    strictly dominates the spokes, spokes are identical, an isolated
    node holds the base rank, and total mass is conserved up to the
    isolated/dangling leak."""
    from pyspark.sql import functions as F

    from nyc_crash_mapper_etl_script_spark.operators.graph import pagerank

    nodes = spark.createDataFrame([(i,) for i in range(6)], "id long")
    spokes = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
    edges = spark.createDataFrame(spokes, "src long, dst long")
    pr = {r["id"]: r["pagerank"] for r in pagerank(nodes, edges).collect()}
    assert pr[0] > pr[1] > pr[5]  # hub > spoke > isolated
    assert len({pr[i] for i in range(1, 5)}) == 1  # spokes identical
    assert abs(pr[5] - round((1 - 0.85) / 6, 6)) < 1e-9  # base rank


def test_pagerank_converged_stops_early_and_matches_fixed(spark):
    """Auto-termination: a small graph converges well before the
    iteration cap, and the converged ranks agree with a long
    fixed-iteration run at the rounding grid."""
    from nyc_crash_mapper_etl_script_spark.operators.graph import (
        pagerank,
        pagerank_converged,
    )

    nodes = spark.createDataFrame([(i,) for i in range(6)], "id long")
    spokes = [(0, i) for i in range(1, 5)] + [(i, 0) for i in range(1, 5)]
    edges = spark.createDataFrame(spokes, "src long, dst long")
    # convergence rate is ~damping^k, so a low damping converges in
    # a handful of iterations -- the stopping rule is what's under test
    got, iters = pagerank_converged(
        nodes, edges, tol=1e-7, max_iterations=40, damping=0.5
    )
    assert 3 <= iters < 40  # stopped by tolerance, not the cap
    fixed = {
        r["id"]: r["pagerank"]
        for r in pagerank(nodes, edges, iterations=25, damping=0.5).collect()
    }
    conv = {r["id"]: r["pagerank"] for r in got.collect()}
    assert all(abs(conv[i] - fixed[i]) <= 2e-6 for i in range(6))
