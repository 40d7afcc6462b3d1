"""plans/continuous.py: the reference nightly as a continuous
incremental pipeline -- ingest->dedup->enrich->blame->reconcile->
incremental rollup per micro-batch, against TxTable state."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")


def _row(cid, lat=None, lng=None, ped_inj="1", date="2024-06-01", veh="Sedan"):
    return {
        "collision_id": str(cid),
        "crash_date": f"{date}T00:00:00.000",
        "crash_time": "9:35",
        "latitude": lat,
        "longitude": lng,
        "on_street_name": "MAIN ST",
        "vehicle_type_code1": veh,
        "number_of_motorist_injured": "0",
        "number_of_motorist_killed": "0",
        "number_of_cyclist_injured": "0",
        "number_of_cyclist_killed": "0",
        "number_of_pedestrians_injured": ped_inj,
        "number_of_pedestrians_killed": "0",
        "number_of_persons_injured": ped_inj,
        "number_of_persons_killed": "0",
    }


def _dims(spark):
    def ring(x0, y0, x1, y1):
        return [Row(x=x0, y=y0), Row(x=x1, y=y0), Row(x=x1, y=y1), Row(x=x0, y=y1)]

    districts = spark.createDataFrame(
        [Row(kind="borough", identifier="Brooklyn", the_geom=ring(0.0, 0.0, 2.0, 2.0))]
    )
    intersections = spark.createDataFrame(
        [(1, "A", "syn", ((0.5, 0.5), 8000.0), None),
         (2, "B", "syn", ((1.5, 1.5), 8000.0), None)],
        ("cartodb_id long, name string, borough string, "
         "the_geom struct<center:struct<lng:double,lat:double>,radius_m:double>, "
         "crashcount int"),
    )
    crosswalk = spark.createDataFrame(
        [("Sedan", "CAR"), ("Bike", "BICYCLE")],
        "nyc_vehicletype string, crashmapper_vehicletype string",
    )
    return districts, intersections, crosswalk


def _feed(feed_dir, name, rows):
    with open(feed_dir / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_continuous_nightly_two_batches(spark, tmp_path_factory):
    from nyc_crash_mapper_etl_script_spark.operators.enrichment import (
        intersection_crash_counts,
    )
    from nyc_crash_mapper_etl_script_spark.plans.continuous import (
        continuous_nightly,
        rebuild_rollup,
    )
    from nyc_crash_mapper_etl_script_spark.sources.txtable import TxTable

    root = tmp_path_factory.mktemp("continuous")
    feed = root / "feed"
    feed.mkdir()
    districts, intersections, crosswalk = _dims(spark)
    table, rollup, ckpt = str(root / "fact"), str(root / "mv"), str(root / "ckpt")

    def run():
        q = continuous_nightly(
            spark, str(feed), table, rollup, ckpt,
            districts, intersections, crosswalk,
        )
        q.awaitTermination(300)

    # batch 1: in-circle-A injury crash, geomless crash, out-of-extent
    # crash, and an in-batch duplicate of 101
    _feed(feed, "b1.jsonl", [
        _row(101, lat="0.5", lng="0.5"),
        _row(102),                             # no coords
        _row(103, lat="55.0", lng="99.0"),     # outside borough extent
        _row(101, lat="0.5", lng="0.5"),       # duplicate
    ])
    run()

    tx = TxTable(table, partition_by=["__ym"])
    got = {r["socrata_id"]: r for r in tx.read(spark).collect()}
    assert set(got) == {101, 102, 103}
    # enrichment happened in-stream: district link, flags, blame
    assert got[101]["borough"] == "Brooklyn"
    assert got[101]["hasvehicle_car"] is True
    assert got[101]["blame_factor"] == 1.0
    assert got[101]["pedestrian_injured_bycar"] == 1.0
    assert got[103]["the_geom"] is None       # extent-nulled
    # serial ids assigned, dense, ordered by socrata_id
    assert [got[k]["cartodb_id"] for k in sorted(got)] == [1, 2, 3]

    mv = TxTable(rollup)
    counts = {r["cartodb_id"]: r["howmany"] for r in mv.read(spark).collect()}
    assert counts == {1: 1}                   # only 101 is in circle A

    # batch 2: new in-circle crash + a tally UPDATE to 101 (5 injured)
    _feed(feed, "b2.jsonl", [
        _row(105, lat="0.51", lng="0.5"),
        _row(101, lat="0.5", lng="0.5", ped_inj="5"),
    ])
    run()

    got2 = {r["socrata_id"]: r for r in tx.read(spark).collect()}
    assert set(got2) == {101, 102, 103, 105}
    assert got2[101]["number_of_pedestrian_injured"] == 5   # C2 merge
    assert got2[105]["cartodb_id"] == 4                      # ids continue

    counts2 = {r["cartodb_id"]: r["howmany"] for r in mv.read(spark).collect()}
    assert counts2 == {1: 2}                   # incremental +1 for 105

    # incremental rollup == full recompute (insert-only workload)
    full = {
        r["cartodb_id"]: r["howmany"]
        for r in intersection_crash_counts(
            tx.read(spark), intersections, months_window=None
        ).collect()
    }
    assert counts2 == full

    # membership-changing update: flip 101 to zero injuries via the
    # update path -- the SIGNED rollup repair keeps the view exact
    # incrementally, no rebuild needed
    _feed(feed, "b3.jsonl", [_row(101, lat="0.5", lng="0.5", ped_inj="0")])
    run()
    counts3 = {r["cartodb_id"]: r["howmany"] for r in mv.read(spark).collect()}
    assert counts3 == {1: 1}                   # only 105 qualifies now
    full3 = {
        r["cartodb_id"]: r["howmany"]
        for r in intersection_crash_counts(
            tx.read(spark), intersections, months_window=None
        ).collect()
    }
    assert counts3 == full3
    # the periodic rebuild is now belt-and-braces: idempotent here
    rebuild_rollup(spark, table, rollup, intersections)
    assert {
        r["cartodb_id"]: r["howmany"] for r in mv.read(spark).collect()
    } == counts3


def test_continuous_nightly_chained_two_streams(spark, tmp_path_factory):
    """The DECOUPLED nightly: ingest stream writes only the fact
    TxTable; a second stream chained off its commit log maintains the
    rollup.  Inserts, a tally update, and a membership-changing
    update all keep rollup == full recompute -- the coupled form's
    exactness contract across the commit-log boundary."""
    from nyc_crash_mapper_etl_script_spark.operators.enrichment import (
        intersection_crash_counts,
    )
    from nyc_crash_mapper_etl_script_spark.plans.continuous import (
        continuous_nightly_chained,
    )
    from nyc_crash_mapper_etl_script_spark.sources.txtable import TxTable

    root = tmp_path_factory.mktemp("chained")
    feed = root / "feed"
    feed.mkdir()
    districts, intersections, crosswalk = _dims(spark)
    table, rollup, ckpt = str(root / "fact"), str(root / "mv"), str(root / "ck")

    def run():
        q, start_rollup = continuous_nightly_chained(
            spark, str(feed), table, rollup, ckpt,
            districts, intersections, crosswalk,
        )
        q.awaitTermination(300)
        r = start_rollup()
        r.awaitTermination(300)

    _feed(feed, "b1.jsonl", [
        _row(101, lat="0.5", lng="0.5"),
        _row(102),
        _row(104, lat="1.5", lng="1.5"),
    ])
    run()
    tx = TxTable(table, partition_by=["__ym"], retain_history=True)
    mv = TxTable(rollup)

    def counts():
        return {r["cartodb_id"]: r["howmany"] for r in mv.read(spark).collect()}

    def full():
        return {
            r["cartodb_id"]: r["howmany"]
            for r in intersection_crash_counts(
                tx.read(spark), intersections, months_window=None
            ).collect()
        }

    assert counts() == {1: 1, 2: 1} == full()

    # batch 2: insert in circle A + tally update (non-membership)
    _feed(feed, "b2.jsonl", [
        _row(105, lat="0.51", lng="0.5"),
        _row(101, lat="0.5", lng="0.5", ped_inj="5"),
    ])
    run()
    assert counts() == {1: 2, 2: 1} == full()

    # batch 3: membership-changing update -- 104 drops to 0 injuries;
    # the merge's file-level retraction decrements circle B to zero
    # and the group vanishes from the rollup
    _feed(feed, "b3.jsonl", [_row(104, lat="1.5", lng="1.5", ped_inj="0")])
    run()
    assert counts() == {1: 2} == full()


def test_constraints_gate_the_continuous_pipeline(spark, tmp_path_factory):
    """CHECK constraints compose with the streaming pipeline with
    ZERO pipeline changes: the fact table is created with a
    constraint, the pipeline's fresh handles inherit it from the
    commit log, and a poisoned batch fails the stream while the
    table keeps only valid rows."""
    from pyspark.sql.streaming import StreamingQueryException

    from nyc_crash_mapper_etl_script_spark.plans.continuous import (
        continuous_nightly,
    )
    from nyc_crash_mapper_etl_script_spark.sources.txtable import TxTable

    root = tmp_path_factory.mktemp("cons")
    feed = root / "feed"
    feed.mkdir()
    districts, intersections, crosswalk = _dims(spark)
    table, rollup, ckpt = str(root / "fact"), str(root / "mv"), str(root / "ck")

    def run():
        q = continuous_nightly(
            spark, str(feed), table, rollup, ckpt,
            districts, intersections, crosswalk,
        )
        q.awaitTermination(300)

    # good batch 1 establishes the table -- but FIRST, pin the
    # constraint into the log by pre-creating the table empty-ish:
    # run batch 1 normally, then record the constraint via a handle
    _feed(feed, "b1.jsonl", [_row(101, lat="0.5", lng="0.5")])
    run()
    # attach the constraint going forward (spec rides the next commit)
    guard = TxTable(
        table,
        partition_by=["__ym"],
        constraints={"nonneg_injured": "number_of_persons_injured >= 0"},
    )
    guard.append(guard.read(spark).where("1=0"))  # no-op data, logs the spec
    assert TxTable(table, partition_by=["__ym"]).constraint_spec() is not None

    # batch 2 carries a poisoned row: the sink's append must abort
    _feed(feed, "b2.jsonl", [_row(102, lat="0.5", lng="0.5", ped_inj="-5")])
    with pytest.raises(StreamingQueryException, match="nonneg_injured"):
        run()
    # the table still holds only the valid row
    got = {r["socrata_id"] for r in TxTable(table, partition_by=["__ym"]).read(spark).collect()}
    assert got == {101}
