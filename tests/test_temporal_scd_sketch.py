"""Semantic tests for the round-2 additions: temporal joins (as-of,
interval), SCD2 history, KMV sketch, contamination, repetition
profile, PII scrub, and greedy sequence packing.  These pin the
operator CONTRACTS on hand-built fixtures; engine-vs-oracle parity is
covered by the registry twins."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

TS = dt.datetime


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


# -- as-of join -----------------------------------------------------------


@pytest.fixture(scope="module")
def asof_frames(spark):
    ref = spark.createDataFrame(
        [
            (1, _ts(0), 101, 10.0),
            (1, _ts(10), 102, 20.0),
            (1, _ts(10), 103, 30.0),  # tie on ts: larger id must win
            (2, _ts(5), 104, None),   # NULL value must NOT tear the row
        ],
        "k long, ts timestamp, rid long, val double",
    )
    probe = spark.createDataFrame(
        [
            (1, _ts(10), 201),  # equal ts -> inclusive matches id 103
            (1, _ts(11), 202),
            (1, _ts(0), 203),   # equal to first ref row
            (2, _ts(6), 204),   # matches the NULL-valued ref row
            (3, _ts(1), 205),   # keyless -> no match
        ],
        "k long, ts timestamp, pid long",
    )
    return ref, probe


def test_asof_inclusive_matches_and_ties(spark, asof_frames):
    from nyc_crash_mapper_etl_script_spark.operators.temporal_join import asof_join

    ref, probe = asof_frames
    out = {
        r["pid"]: (r["asof_ts"], r["asof_val"])
        for r in asof_join(
            probe, ref, "k", "ts", "ts", ["val"],
            probe_cols=["pid"], inclusive=True, ref_tiebreak="rid",
        ).collect()
    }
    assert out[201] == (_ts(10), 30.0)  # tie: rid 103 (30.0) wins
    assert out[202] == (_ts(10), 30.0)
    assert out[203] == (_ts(0), 10.0)
    # ref row with NULL val still matches as a ROW: ts filled, val None
    assert out[204] == (_ts(5), None)
    assert out[205] == (None, None)


def test_asof_strict_excludes_equal_ts(spark, asof_frames):
    from nyc_crash_mapper_etl_script_spark.operators.temporal_join import asof_join

    ref, probe = asof_frames
    out = {
        r["pid"]: r["asof_ts"]
        for r in asof_join(
            probe, ref, "k", "ts", "ts", ["val"],
            probe_cols=["pid"], inclusive=False, ref_tiebreak="rid",
        ).collect()
    }
    assert out[201] == _ts(0)   # equal-ts refs invisible in strict mode
    assert out[202] == _ts(10)
    assert out[203] is None


# -- interval join --------------------------------------------------------


def test_interval_join_boundaries_and_multicell(spark):
    from nyc_crash_mapper_etl_script_spark.operators.temporal_join import (
        interval_join,
    )

    intervals = spark.createDataFrame(
        [(1, _ts(0), _ts(25))],  # spans 3 cells at 600 s
        "iv long, lo timestamp, hi timestamp",
    )
    points = spark.createDataFrame(
        [
            (10, _ts(0)),        # == lo -> included
            (11, _ts(24, 59)),   # just inside
            (12, _ts(25)),       # == hi -> EXCLUDED
            (13, _ts(30)),       # outside
        ],
        "pt long, ts timestamp",
    )
    got = sorted(
        r["pt"]
        for r in interval_join(points, intervals, "ts", "lo", "hi", 600).collect()
    )
    assert got == [10, 11]  # each qualifying pair exactly once (no dedup)


# -- SCD2 -----------------------------------------------------------------


def test_scd2_collapse_and_versions(spark):
    from nyc_crash_mapper_etl_script_spark.operators.scd import scd2_history

    log = spark.createDataFrame(
        [
            (1, _ts(0), "a", 1),
            (1, _ts(1), "a", 2),   # duplicate run -> collapsed
            (1, _ts(2), "b", 3),
            (1, _ts(3), "a", 4),   # back to 'a': NEW version, not merged
            (2, _ts(0), "x", 5),
        ],
        "k long, ts timestamp, state string, seq long",
    )
    rows = {
        (r["k"], r["version_seq"]): r
        for r in scd2_history(
            log, "k", "ts", ["state"], tiebreak_col="seq"
        ).collect()
    }
    assert len(rows) == 4
    assert rows[(1, 1)]["state"] == "a" and rows[(1, 1)]["valid_to"] == _ts(2)
    assert rows[(1, 2)]["state"] == "b" and rows[(1, 2)]["valid_to"] == _ts(3)
    assert rows[(1, 3)]["state"] == "a" and rows[(1, 3)]["is_current"]
    assert rows[(2, 1)]["is_current"] and rows[(2, 1)]["valid_to"] is None


# -- KMV sketch -----------------------------------------------------------


def test_kmv_exact_below_k_and_estimate_above(spark):
    from nyc_crash_mapper_etl_script_spark.operators.sketches import kmv_distinct

    small = spark.range(0, 40).select((F.col("id") % 7).alias("v"))
    row = kmv_distinct(small, "v", k=256).collect()[0]
    assert row["n_hashes"] == 7 and row["est_distinct"] == 7.0

    big = spark.range(0, 20000).select(F.col("id").alias("v"))
    est = kmv_distinct(big, "v", k=512).collect()[0]["est_distinct"]
    assert abs(est - 20000) / 20000 < 0.15  # k=512 -> ~4.4% rel stddev


# -- contamination --------------------------------------------------------


def test_contamination_flags_copied_doc(spark):
    from nyc_crash_mapper_etl_script_spark.operators.contamination import (
        contamination_check,
    )

    bench_text = "the quick brown fox jumps over the lazy dog today"
    corpus = spark.createDataFrame(
        [
            (1, bench_text),                                # verbatim copy
            (2, "completely different words about spark"),  # disjoint
        ],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame([(9, bench_text)], "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in contamination_check(
            corpus, benchmark, "doc_id", "text", k=5
        ).collect()
    }
    assert out[1]["contamination"] == 1.0 and out[1]["flagged"]
    assert out[2]["contamination"] == 0.0 and not out[2]["flagged"]


# -- repetition profile ---------------------------------------------------


def test_repetition_profile_hand_computed(spark):
    from nyc_crash_mapper_etl_script_spark.operators.repetition import (
        repetition_profile,
    )

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "solo")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_profile(df, "doc_id", "text").collect()}
    r1 = out[1]
    assert r1["n_words"] == 4 and r1["n_types"] == 2
    assert r1["type_token_ratio"] == 0.5
    assert r1["top_unigram_frac"] == 0.75
    assert r1["top_bigram_frac"] == pytest.approx(2 / 3, abs=1e-3)  # "a a" x2 of 3
    r2 = out[2]
    assert r2["n_words"] == 1 and r2["top_bigram_frac"] == 0.0


# -- PII scrub ------------------------------------------------------------


def test_pii_scrub_cascade(spark):
    from nyc_crash_mapper_etl_script_spark.functions.text import (
        pii_counts,
        pii_scrub,
    )

    df = spark.createDataFrame(
        [(1, "mail a@b.com ssn 123-45-6789 phone 212-555-1234 and 212.555.9999")],
        "i long, text string",
    )
    n_e, n_s, n_p = pii_counts(F.col("text"))
    row = df.select(
        pii_scrub(F.col("text")).alias("s"),
        n_e.alias("e"), n_s.alias("n"), n_p.alias("p"),
    ).collect()[0]
    assert row["s"] == "mail <EMAIL> ssn <SSN> phone <PHONE> and <PHONE>"
    assert (row["e"], row["n"], row["p"]) == (1, 1, 2)
    # an SSN is NOT double-counted as a phone (cascade order)
    assert "<PHONE>" not in row["s"].replace("<PHONE>", "", 2)


# -- greedy packing -------------------------------------------------------


def test_pack_greedy_boundaries_and_oversize(spark):
    from nyc_crash_mapper_etl_script_spark.operators.packing import pack_greedy

    df = spark.createDataFrame(
        [
            ("s", 1, 400), ("s", 2, 500),  # pack 1 (fill 900)
            ("s", 3, 200),                 # overflow -> pack 2
            ("s", 4, 1500),                # oversize -> its own pack 3
            ("s", 5, 100),                 # pack 4 (1500 already > budget)
            ("t", 6, 10),                  # other group restarts at pack 1
        ],
        "g string, i long, sz long",
    )
    out = {
        r["i"]: (r["pack_id"], r["pack_fill"])
        for r in pack_greedy(df, "g", "i", "sz", budget=1000).collect()
    }
    assert out[1] == (1, 400) and out[2] == (1, 900)
    assert out[3] == (2, 200)
    assert out[4] == (3, 1500)
    assert out[5] == (4, 100)
    assert out[6] == (1, 10)


def test_pack_greedy_sharded_is_deterministic_and_bounded(spark):
    from nyc_crash_mapper_etl_script_spark.operators.packing import pack_greedy

    df = spark.createDataFrame(
        [("s", i, 100) for i in range(40)], "g string, i long, sz long"
    )
    a = pack_greedy(df, "g", "i", "sz", budget=250, shards=4).collect()
    b = pack_greedy(df, "g", "i", "sz", budget=250, shards=4).collect()
    key = lambda r: (r["g"], r["shard"], r["i"])
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert {r["shard"] for r in a} == {0, 1, 2, 3}
    # every shard packs independently: fills never exceed the budget
    # except for oversize singletons (none here)
    assert all(r["pack_fill"] <= 250 for r in a)


# -- rolling time window --------------------------------------------------


def test_rolling_time_agg_trailing_window(spark):
    from nyc_crash_mapper_etl_script_spark.operators.rolling import (
        rolling_time_agg,
    )

    df = spark.createDataFrame(
        [
            (1, _ts(0), 1.0),
            (1, _ts(30), 2.0),
            (1, _ts(59), 4.0),   # within 1 h of minute 0
            (2, _ts(0), 8.0),
        ],
        "k long, ts timestamp, v double",
    )
    out = {
        (r["k"], r["ts"]): (r["n"], r["s"])
        for r in rolling_time_agg(
            df, "k", "ts", 3600, {"n": F.count(F.lit(1)), "s": F.sum("v")}
        ).collect()
    }
    assert out[(1, _ts(0))] == (1, 1.0)
    assert out[(1, _ts(30))] == (2, 3.0)
    assert out[(1, _ts(59))] == (3, 7.0)
    assert out[(2, _ts(0))] == (1, 8.0)


def test_rolling_window_is_inclusive_both_ends(spark):
    from nyc_crash_mapper_etl_script_spark.operators.rolling import (
        rolling_time_agg,
    )

    df = spark.createDataFrame(
        [(1, _ts(0), 1.0), (1, dt.datetime(2024, 1, 1, 1, 0), 2.0)],
        "k long, ts timestamp, v double",
    )
    out = {
        r["ts"]: r["n"]
        for r in rolling_time_agg(
            df, "k", "ts", 3600, {"n": F.count(F.lit(1))}
        ).collect()
    }
    # row exactly window_seconds earlier is still in the frame
    assert out[dt.datetime(2024, 1, 1, 1, 0)] == 2


# -- pack concat ----------------------------------------------------------


def test_pack_concat_orders_within_pack(spark):
    from nyc_crash_mapper_etl_script_spark.operators.packing import pack_concat

    packed = spark.createDataFrame(
        [("s", 2, 1), ("s", 1, 1), ("s", 3, 2)],
        "g string, i long, pack_id long",
    )
    docs = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "i long, text string"
    )
    out = {
        (r["g"], r["pack_id"]): (r["n_docs"], r["packed_text"])
        for r in pack_concat(
            packed, docs, ["g", "pack_id"], "i", "text", sep="|"
        ).collect()
    }
    assert out[("s", 1)] == (2, "one|two")  # ordered by i, not input order
    assert out[("s", 2)] == (1, "three")


# -- incremental MV -------------------------------------------------------


def test_refresh_additive_mv_matches_full_rebuild(spark):
    from nyc_crash_mapper_etl_script_spark.operators.mv import (
        refresh_additive_mv,
    )

    full = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("b", 3, 30), ("c", 4, 40)],
        "g string, i long, x long",
    )
    base = full.where(F.col("i") <= 2).groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx")
    )
    delta = full.where(F.col("i") > 2)  # includes brand-new group 'c'
    got = sorted(
        (r["g"], r["n"], r["sx"])
        for r in refresh_additive_mv(
            base, delta, ["g"], count_col="n", sum_cols={"sx": "x"}
        ).collect()
    )
    want = sorted(
        (r["g"], r["n"], r["sx"])
        for r in full.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"))
        .collect()
    )
    assert got == want


# -- temperature sampling -------------------------------------------------


def test_temperature_sample_upweights_rare_sources(spark):
    from nyc_crash_mapper_etl_script_spark.operators.sampling import (
        temperature_sample,
    )

    rows = [("big", i) for i in range(900)] + [("small", 1000 + i) for i in range(100)]
    df = spark.createDataFrame(rows, "src string, k long")
    out = temperature_sample(df, "src", "k", target_total=300).collect()
    by_src = {}
    for r in out:
        by_src[r["src"]] = by_src.get(r["src"], 0) + 1
    # alpha=0.5 keep-rates: sqrt(900)=30, sqrt(100)=10, ss=40 ->
    # p_big = 300/(30*40) = .25, p_small = 300/(10*40) = .75
    assert 0.18 < by_src["big"] / 900 < 0.32
    assert 0.6 < by_src["small"] / 100 < 0.9
    # deterministic: second run identical
    again = temperature_sample(df, "src", "k", target_total=300).collect()
    assert sorted((r["src"], r["k"]) for r in out) == sorted(
        (r["src"], r["k"]) for r in again
    )


# -- salted as-of ---------------------------------------------------------


def test_asof_salted_equals_plain_on_random_hotkey_data(spark):
    import random

    from nyc_crash_mapper_etl_script_spark.operators.temporal_join import (
        asof_join,
        asof_join_salted,
    )

    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    # hot key 1 holds half of all rows; chunks of 1 h.  Refs stop at
    # hour 6 while probes span 24 h, so many probe chunks contain NO
    # reference at all and must inherit across empty chunks.
    def rows(n, id0, span_hours):
        out = []
        for i in range(n):
            k = 1 if rng.random() < 0.5 else rng.randint(2, 5)
            ts = base + dt.timedelta(seconds=rng.randint(0, span_hours * 3600))
            out.append((k, ts, id0 + i, float(rng.randint(0, 100))))
        return out

    ref = spark.createDataFrame(
        rows(150, 1000, 6), "k long, ts timestamp, rid long, val double"
    )
    probe = spark.createDataFrame(
        [(k, ts, rid) for k, ts, rid, _ in rows(300, 5000, 24)],
        "k long, ts timestamp, pid long",
    )
    plain = asof_join(
        probe, ref, "k", "ts", "ts", ["val"],
        probe_cols=["pid"], inclusive=True, ref_tiebreak="rid",
    )
    salted = asof_join_salted(
        probe, ref, "k", "ts", "ts", ["val"],
        probe_cols=["pid"], ref_tiebreak="rid", chunk_seconds=3600,
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b
    # and with a chunk larger than the whole span (degenerates to plain)
    salted_one = asof_join_salted(
        probe, ref, "k", "ts", "ts", ["val"],
        probe_cols=["pid"], ref_tiebreak="rid", chunk_seconds=10**6,
    )
    assert sorted(map(tuple, salted_one.collect())) == a


def test_scd2_tracks_changes_to_and_from_null_state(spark):
    from nyc_crash_mapper_etl_script_spark.operators.scd import scd2_history

    log = spark.createDataFrame(
        [
            (1, _ts(0), "a", 1),
            (1, _ts(1), None, 2),  # change TO NULL is a new version
            (1, _ts(2), None, 3),  # NULL run collapses
            (1, _ts(3), "a", 4),   # change FROM NULL is a new version
            (2, _ts(0), None, 5),  # all-NULL first state is version 1
        ],
        "k long, ts timestamp, state string, seq long",
    )
    rows = {
        (r["k"], r["version_seq"]): r
        for r in scd2_history(
            log, "k", "ts", ["state"], tiebreak_col="seq"
        ).collect()
    }
    assert len(rows) == 4
    assert rows[(1, 1)]["state"] == "a"
    assert rows[(1, 2)]["state"] is None and rows[(1, 2)]["valid_from"] == _ts(1)
    assert rows[(1, 3)]["state"] == "a" and rows[(1, 3)]["is_current"]
    assert rows[(2, 1)]["state"] is None and rows[(2, 1)]["is_current"]


def test_refresh_additive_mv_null_group_merges_not_duplicates(spark):
    from nyc_crash_mapper_etl_script_spark.operators.mv import (
        refresh_additive_mv,
    )

    full = spark.createDataFrame(
        [(None, 1, 10), (None, 2, 20), ("a", 3, 30)],
        "g string, i long, x long",
    )
    base = full.where(F.col("i") <= 1).groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx")
    )
    delta = full.where(F.col("i") > 1)
    key = lambda t: (t[0] is None, t)
    got = sorted(
        ((r["g"] or "", r["n"], r["sx"])
         for r in refresh_additive_mv(
             base, delta, ["g"], count_col="n", sum_cols={"sx": "x"}
         ).collect()),
    )
    want = sorted(
        ((r["g"] or "", r["n"], r["sx"])
         for r in full.groupBy("g")
         .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"))
         .collect()),
    )
    assert got == want  # NULL group merges into ONE row, same as rebuild


def test_interval_join_left_intervals_keeps_unmatched(spark):
    from nyc_crash_mapper_etl_script_spark.operators.temporal_join import (
        interval_join,
    )

    intervals = spark.createDataFrame(
        [(1, _ts(0), _ts(10)), (2, _ts(40), _ts(50)), (3, None, _ts(5), )],
        "iv long, lo timestamp, hi timestamp",
    )
    points = spark.createDataFrame(
        [(10, _ts(1))], "pt long, ts timestamp"
    )
    out = interval_join(
        points, intervals, "ts", "lo", "hi", 600, how="left_intervals"
    ).collect()
    by_iv = {}
    for r in out:
        by_iv.setdefault(r["iv"], []).append(r)
    assert [r["pt"] for r in by_iv[1]] == [10]          # matched
    assert [r["pt"] for r in by_iv[2]] == [None]        # no point in range
    # NULL lo: explode(sequence(NULL,..)) yields no cells -> never
    # matched; the null-safe anti keeps it as an unmatched interval
    assert [r["pt"] for r in by_iv[3]] == [None]


def test_contamination_preserves_zero_shingle_docs(spark):
    from nyc_crash_mapper_etl_script_spark.operators.contamination import (
        contamination_check,
    )

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps high"), (2, ""), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        [(9, "the quick brown fox jumps high")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in contamination_check(
            corpus, benchmark, "doc_id", "text", k=5
        ).collect()
    }
    assert set(out) == {1, 2, 3, 4}  # empty-text docs surface, not vanish
    for d in (2, 3, 4):
        assert out[d]["n_shingles"] == 0
        assert out[d]["n_matched"] == 0
        assert out[d]["contamination"] is None
        assert out[d]["flagged"] is False
    assert out[1]["flagged"] is True


def test_refresh_additive_mv_keeps_all_null_sum_null(spark):
    from nyc_crash_mapper_etl_script_spark.operators.mv import (
        refresh_additive_mv,
    )

    full = spark.createDataFrame(
        [("a", 1, None), ("a", 2, None), ("b", 1, None), ("b", 2, 5)],
        "g string, i long, x long",
    )
    base = full.where(F.col("i") == 1).groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx")
    )
    delta = full.where(F.col("i") == 2)
    got = sorted(
        (r["g"], r["n"], r["sx"])
        for r in refresh_additive_mv(
            base, delta, ["g"], count_col="n", sum_cols={"sx": "x"}
        ).collect()
    )
    want = sorted(
        (r["g"], r["n"], r["sx"])
        for r in full.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"))
        .collect()
    )
    assert got == want  # ('a', 2, None) stays NULL, not 0


def test_scratch_collision_guard_raises(spark):
    import pytest

    from nyc_crash_mapper_etl_script_spark.operators.rolling import (
        rolling_time_agg,
    )

    df = spark.createDataFrame(
        [("k", _ts(0), 1)], "k string, ts timestamp, __us long"
    )
    with pytest.raises(ValueError, match="__us"):
        rolling_time_agg(df, "k", "ts", 3600, {"n": F.count(F.lit(1))})


def test_refresh_signed_mv_matches_rebuild_with_retractions(spark):
    from nyc_crash_mapper_etl_script_spark.operators.mv import (
        refresh_signed_mv,
        signed_mv_init,
        signed_mv_view,
    )

    full = spark.createDataFrame(
        [
            ("a", 1, 10), ("a", 2, None), ("b", 3, 30), ("b", 4, 40),
            ("c", 5, None), ("d", 6, 60),
        ],
        "g string, i long, x long",
    )
    base = full.where(F.col("i") <= 4)
    mv = signed_mv_init(base, ["g"], sum_cols={"sx": "x"})

    # batch: delete b's rows entirely (group vanishes), delete a's
    # non-NULL row (sum falls back to NULL -- only the NULL row
    # remains), insert c (all-NULL sum) and d
    deletes = full.where(F.col("i").isin(1, 3, 4))
    inserts = full.where(F.col("i") >= 5)
    refreshed = refresh_signed_mv(
        mv, inserts, deletes, ["g"], sum_cols={"sx": "x"}
    )
    got = sorted(
        (r["g"], r["n"], r["sx"])
        for r in signed_mv_view(refreshed, ["g"], sum_cols={"sx": "x"}).collect()
    )
    want_state = base.exceptAll(deletes).unionByName(inserts)
    want = sorted(
        (r["g"], r["n"], r["sx"])
        for r in want_state.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("sx"))
        .collect()
    )
    assert got == want
    gd = dict((g, (n, s)) for g, n, s in got)
    assert "b" not in gd            # vanished group dropped
    assert gd["a"] == (1, None)     # retraction exposes the NULL sum
    assert gd["c"] == (1, None)     # all-NULL insert stays NULL
    assert gd["d"] == (1, 60)
