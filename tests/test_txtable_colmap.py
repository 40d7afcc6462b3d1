"""Column mapping (Delta name mode): RENAME and DROP COLUMN as pure
metadata commits -- zero data files touched -- with stable PHYSICAL
names underneath.  Reads alias physical->logical, writes project
logical->physical, time travel and CDC stay exact across the rename
boundary, and a re-added column name binds a FRESH physical name so
dropped bytes can never resurrect.  On a 100 TB corpus this is the
difference between an O(1) log write and an O(table) rewrite."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.sources.txtable import (
    MetadataChangedError,
    TxTable,
)


def _df(spark, rows, schema="k long, v string"):
    return spark.createDataFrame(rows, schema)


def _footer_cols(table):
    import pyarrow.parquet as pq

    cols = set()
    for rel in table._live_files():
        cols.update(pq.ParquetFile(os.path.join(table.root, rel)).schema_arrow.names)
    return cols


def test_rename_is_metadata_only_and_reads_alias(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.init(_df(spark, [(1, "a"), (2, "b")]))
    files_before = sorted(t._live_files())
    v = t.rename_column("v", "label")
    assert sorted(t._live_files()) == files_before  # zero churn
    h = t.history()[0]
    assert h["op"] == "rename_column"
    assert h["files_added"] == 0 and h["files_removed"] == 0
    got = t.read(spark)
    assert got.columns == ["k", "label"]
    assert sorted((r["k"], r["label"]) for r in got.collect()) == [
        (1, "a"),
        (2, "b"),
    ]
    # feature stamp: a build without the aliasing must refuse
    assert "column-mapping" in t._entries()[-1]["requires"]
    assert v == 2


def test_writes_after_rename_use_stable_physical_names(spark, tmp_path):
    """New files keep writing the OLD physical name, so one
    table-wide map covers every file era."""
    t = TxTable(str(tmp_path / "t"))
    t.init(_df(spark, [(1, "a")]))
    t.rename_column("v", "label")
    t.append(_df(spark, [(2, "b")], "k long, label string"))
    t.merge(_df(spark, [(1, "A")], "k long, label string"), "k")
    assert _footer_cols(t) == {"k", "v"}  # physical name unchanged
    got = sorted((r["k"], r["label"]) for r in t.read(spark).collect())
    assert got == [(1, "A"), (2, "b")]
    # predicate ops bind the logical name transparently
    t.delete_where(spark, F.col("label") == "b")
    assert sorted(r["k"] for r in t.read(spark).collect()) == [1]
    t.compact(spark, n_files=1)
    assert sorted(
        (r["k"], r["label"]) for r in t.read(spark).collect()
    ) == [(1, "A")]


def test_time_travel_and_cdc_across_rename(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"), retain_history=True)
    t.init(_df(spark, [(1, "a")]))  # v1
    t.rename_column("v", "label")  # v2
    t.append(_df(spark, [(2, "b")], "k long, label string"))  # v3
    # as-of v1: the OLD logical name
    assert t.read(spark, version=1).columns == ["k", "v"]
    assert [r["v"] for r in t.read(spark, version=1).collect()] == ["a"]
    # as-of v2+: the new one
    assert t.read(spark, version=2).columns == ["k", "label"]
    # CDC across the rename: the rename itself emits NOTHING (no row
    # changed); the append emits under v_to's logical names
    diff = t.changes(spark, 1).collect()
    assert [(r["k"], r["label"], r["_change_type"]) for r in diff] == [
        (2, "b", "insert")
    ]


def test_drop_column_and_no_resurrection_on_readd(spark, tmp_path):
    """The headline hazard: drop a column, later evolve a NEW column
    with the same name -- the old bytes must NOT come back."""
    t = TxTable(str(tmp_path / "t"))
    t.init(_df(spark, [(1, "secret"), (2, "classified")]))
    files_before = sorted(t._live_files())
    t.drop_column("v")
    assert sorted(t._live_files()) == files_before  # zero churn
    assert t.read(spark).columns == ["k"]
    # re-add a column named v via evolution
    t.append(
        _df(spark, [(3, "fresh")], "k long, v string"), evolve_schema=True
    )
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    # old rows read NULL -- "secret"/"classified" stay buried
    assert got == {1: None, 2: None, 3: "fresh"}
    # the new column lives under a FRESH physical name
    phys = t._column_map()["v"]
    assert phys != "v" and phys.startswith("v__")


def test_rename_back_to_physical_name_empties_map(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.init(_df(spark, [(1, "a")]))
    t.rename_column("v", "w")
    assert t._column_map() == {"w": "v"}
    t.rename_column("w", "v")
    assert t._column_map() == {}
    # unmapped again: plain parquet read of a quiescent table works
    t.compact(spark, n_files=1)
    assert {r["v"] for r in spark.read.parquet(t.root).collect()} == {"a"}
    # and new commits stop stamping the feature
    assert "requires" not in t._entries()[-1]


def test_overwrite_reconciles_map_with_replacing_schema(spark, tmp_path):
    """A whole-set replace may change schema in any direction
    (schema_enforce test); entries of the live column map whose
    logical name the replacing schema drops must be pruned with it.
    The hypothesis model test found the stale-entry state: after
    rename v->w, overwrite(v) left {w: v} live while the schema said
    v, so a later rename_column("v", ...) would bind v's physical
    name to a SECOND logical column."""
    t = TxTable(str(tmp_path / "t"))
    t.init(_df(spark, [(1, "a")]))
    t.rename_column("v", "w")
    assert t._column_map() == {"w": "v"}
    # replace with the ORIGINAL name: schema becomes (k, v), and the
    # stale w->v entry must go with it (explicit empty map logged)
    t.overwrite(_df(spark, [(2, "b")]))
    assert t.read(spark).columns == ["k", "v"]
    assert t._column_map() == {}
    assert t._entries()[-1]["column_map"] == {}
    # the once-poisoned sequence: a fresh rename of the reused name
    # maps cleanly and a fresh-handle read binds it
    t.rename_column("v", "w2")
    assert t._column_map() == {"w2": "v"}
    got = TxTable(t.root).read(spark)
    assert got.columns == ["k", "w2"]
    assert [(r["k"], r["w2"]) for r in got.collect()] == [(2, "b")]
    # and appends under the reconciled map keep the stable physical
    t.append(_df(spark, [(3, "c")], "k long, w2 string"))
    assert _footer_cols(t) == {"k", "v"}


def test_overwrite_with_renamed_schema_keeps_map(spark, tmp_path):
    """The complementary case: overwriting WITH the current logical
    name keeps the map entry, and the staged files keep writing the
    stable physical name."""
    t = TxTable(str(tmp_path / "t"))
    t.init(_df(spark, [(1, "a")]))
    t.rename_column("v", "w")
    t.overwrite(_df(spark, [(2, "b")], "k long, w string"))
    assert t._column_map() == {"w": "v"}
    assert _footer_cols(t) == {"k", "v"}  # physical name stable
    got = sorted((r["k"], r["w"]) for r in TxTable(t.root).read(spark).collect())
    assert got == [(2, "b")]


def test_rename_refusals(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"), partition_by=["ym"])
    t.init(_df(spark, [(1, "a", "2024-01")], "k long, v string, ym string"))
    with pytest.raises(ValueError, match="partition column"):
        t.rename_column("ym", "month")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("v", "k")
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="reserved"):
        t.rename_column("v", "_txdv_file")

    tc = TxTable(str(tmp_path / "c"), constraints={"vlen": "length(v) > 0"})
    tc.init(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="constraint"):
        tc.rename_column("v", "w")
    with pytest.raises(ValueError, match="constraint"):
        tc.drop_column("v")

    tk = TxTable(str(tmp_path / "k"), cluster_by=(["k"], ["k"], 2))
    tk.init(_df(spark, [(1, "a")]).drop("v").withColumn("x", F.lit(1)))
    with pytest.raises(ValueError, match="cluster_by"):
        tk.rename_column("x", "y")


def test_stats_pruning_follows_the_rename(spark, tmp_path):
    """Data skipping keys footer stats by PHYSICAL name; pruning on
    the renamed logical column still skips files."""
    t = TxTable(str(tmp_path / "t"))
    t.init(
        spark.createDataFrame(
            [(i, float(i)) for i in range(100)], "k long, x double"
        ).coalesce(1)
    )
    t.append(
        spark.createDataFrame(
            [(i, float(i)) for i in range(1000, 1100)], "k long, x double"
        ).coalesce(1)
    )
    t.rename_column("x", "score")
    assert len(t.pruned_files("score", 1000.0, 1050.0)) == 1  # strict subset
    got = sorted(
        r["k"] for r in t.read_pruned(spark, "score", 1000.0, 1050.0).collect()
    )
    assert got == list(range(1000, 1051))


def test_partitioned_table_rename_nonpartition_column(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"), partition_by=["ym"])
    t.init(_df(spark, [(1, "a", "2024-01"), (2, "b", "2024-02")],
               "k long, v string, ym string"))
    t.rename_column("v", "label")
    got = t.read_partitions(spark, "ym", ["2024-01"])
    assert [(r["k"], r["label"]) for r in got.collect()] == [(1, "a")]
    t.merge(_df(spark, [(1, "A", "2024-01")], "k long, label string, ym string"), "k")
    assert {r["label"] for r in t.read(spark).collect()} == {"A", "b"}


def test_dv_delete_composes_with_rename(spark, tmp_path):
    t = TxTable(str(tmp_path / "t"))
    t.init(_df(spark, [(1, "dead"), (2, "keep")]))
    t.rename_column("v", "status")
    t.delete_where(spark, F.col("status") == "dead", dv=True)
    got = [(r["k"], r["status"]) for r in t.read(spark).collect()]
    assert got == [(2, "keep")]


def test_stale_append_races_rename_and_aborts(spark, tmp_path):
    """A blind append staged under the pre-rename schema must abort
    when the rename lands first -- publishing would regress the
    logical schema (same guard as the evolution race)."""
    root = str(tmp_path / "t")
    t = TxTable(root)
    t.init(_df(spark, [(1, "a")]))
    stale = TxTable(root)

    orig = TxTable._commit

    def racing(self, mapping, removes, op, base_version=None, **kw):
        if op == "append" and self is stale and not getattr(
            self, "_fired", False
        ):
            self._fired = True
            TxTable(root).rename_column("v", "label")
        return orig(self, mapping, removes, op, base_version, **kw)

    TxTable._commit = racing
    try:
        with pytest.raises(MetadataChangedError):
            stale.append(_df(spark, [(2, "b")]))
    finally:
        TxTable._commit = orig
    assert TxTable(root).read(spark).columns == ["k", "label"]


def test_rename_rebases_past_blind_append(spark, tmp_path):
    """The reverse race: the rename loses the CAS to a blind append
    it has already seen the schema of -- it rebases (the append's
    metadata matches the snapshot) and both commits land."""
    root = str(tmp_path / "t")
    t = TxTable(root)
    t.init(_df(spark, [(1, "a")]))

    orig = TxTable._commit

    def racing(self, mapping, removes, op, base_version=None, **kw):
        if op == "rename_column" and not getattr(self, "_fired", False):
            self._fired = True
            TxTable(root).append(_df(spark, [(2, "b")]))
        return orig(self, mapping, removes, op, base_version, **kw)

    TxTable._commit = racing
    try:
        t.rename_column("v", "label")
    finally:
        TxTable._commit = orig
    got = sorted((r["k"], r["label"]) for r in TxTable(root).read(spark).collect())
    assert got == [(1, "a"), (2, "b")]


def test_stream_refuses_mapped_table(spark, tmp_path):
    from nyc_crash_mapper_etl_script_spark.sources.txstream import (
        stream_schema,
    )

    t = TxTable(str(tmp_path / "t"))
    t.init(_df(spark, [(1, "a")]))
    t.rename_column("v", "label")
    with pytest.raises(ValueError, match="column-mapped"):
        stream_schema(t)


def test_restore_rolls_back_the_column_map(spark, tmp_path):
    """Restoring below a rename/drop rolls the MAP back with the
    schema.  Without that, a later evolve-add of the renamed name
    would consult the stale entry and write into a physical name
    another column still owns -- silent cross-column corruption."""
    t = TxTable(str(tmp_path / "t"), retain_history=True)
    t.init(_df(spark, [(1, "a")]))  # v1
    t.rename_column("v", "label")  # v2
    t.restore(1)  # v3: schema AND map as of v1
    assert t._column_map() == {}
    assert t.read(spark).columns == ["k", "v"]
    # evolve-add "label" now: a FRESH column, not v's bytes
    t.append(
        _df(spark, [(2, "b", "tag")], "k long, v string, label string"),
        evolve_schema=True,
    )
    got = {r["k"]: (r["v"], r["label"]) for r in t.read(spark).collect()}
    assert got == {1: ("a", None), 2: ("b", "tag")}
    # and the physical namespaces stayed distinct: v's data intact
    t.rename_column("label", "tag_col")
    got = {r["k"]: (r["v"], r["tag_col"]) for r in t.read(spark).collect()}
    assert got == {1: ("a", None), 2: ("b", "tag")}


def test_restore_rolls_back_drop_tombstones(spark, tmp_path):
    """Restore below a drop resurrects the column AND its tombstone
    state: the as-of schema has the field again, so later evolution
    behaves exactly as if the drop never happened."""
    t = TxTable(str(tmp_path / "t"), retain_history=True)
    t.init(_df(spark, [(1, "a")]))  # v1
    t.drop_column("v")  # v2: tombstones physical 'v'
    t.restore(1)  # v3
    assert t.read(spark).columns == ["k", "v"]
    assert [r["v"] for r in t.read(spark).collect()] == ["a"]
    assert not t._state().get("dropped_physical")
    # plain append binds v by identity again -- no spurious remap
    t.append(_df(spark, [(2, "b")]))
    assert {r["v"] for r in t.read(spark).collect()} == {"a", "b"}
    assert t._column_map() == {}


def test_column_map_survives_checkpoint_resume_and_cleanup(spark, tmp_path):
    """The map rides the checkpointed state: a fresh handle resuming
    from a checkpoint -- including after cleanup_log deleted the
    rename's own entry -- still aliases correctly."""
    t = TxTable(str(tmp_path / "t"), checkpoint_every=2)
    t.init(_df(spark, [(1, "a")]))  # v1
    t.rename_column("v", "label")  # v2 (checkpointed)
    for i in range(2, 6):
        t.append(_df(spark, [(i, f"r{i}")], "k long, label string"))  # v3..v6
    t.cleanup_log(keep_versions=1)  # the rename entry itself is gone
    fresh = TxTable(t.root, checkpoint_every=2)
    got = fresh.read(spark)
    assert got.columns == ["k", "label"]
    assert {r["k"]: r["label"] for r in got.collect()} == {
        1: "a", 2: "r2", 3: "r3", 4: "r4", 5: "r5",
    }
    assert fresh._column_map() == {"label": "v"}
    # and writes through the resumed handle keep the physical name
    fresh.append(_df(spark, [(9, "z")], "k long, label string"))
    assert _footer_cols(fresh) == {"k", "v"}


def test_archived_files_read_through_the_map(spark, tmp_path):
    """Time travel over files that moved to _archive after the
    rename: the archived bytes carry physical names too."""
    t = TxTable(str(tmp_path / "t"), retain_history=True)
    t.init(_df(spark, [(1, "a"), (2, "b")]))  # v1
    t.rename_column("v", "label")  # v2
    t.merge(_df(spark, [(1, "A")], "k long, label string"), "k")  # v3 archives v1 files
    assert {r["label"] for r in t.read(spark, version=2).collect()} == {"a", "b"}
    assert t.read(spark, version=1).columns == ["k", "v"]
    assert {r["label"] for r in t.read(spark).collect()} == {"A", "b"}


def test_dv_then_drop_column_keeps_subtracting(spark, tmp_path):
    """Deletion vectors are position-keyed, not column-keyed: rows
    dv-deleted BEFORE a drop stay deleted after it, and a rewrite
    materializes both the dv subtraction and the narrowed schema."""
    t = TxTable(str(tmp_path / "t"))
    t.init(_df(spark, [(1, "dead"), (2, "keep"), (3, "also")]))
    t.delete_where(spark, F.col("v") == "dead", dv=True)
    t.drop_column("v")
    assert sorted(r["k"] for r in t.read(spark).collect()) == [2, 3]
    t.compact(spark, n_files=1)  # materialize: dv retired, column gone
    assert not t._live_dvs()
    assert _footer_cols(t) == {"k"}
    assert sorted(r["k"] for r in t.read(spark).collect()) == [2, 3]
