"""The bench adjudicator's four-test cascade (tools/adjudicate_bench)
on synthetic distributions: a committed mechanism needs its own
pin so a refactor can't silently reorder or weaken the tests."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "adjudicate_bench", os.path.join(REPO, "tools", "adjudicate_bench.py")
)
_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(_mod)
adjudicate = _mod.adjudicate


def _env(**qs):
    """envelope with 2 runs; qs maps name -> (run1, run2)."""
    return {
        "runs": 2,
        "totals": [sum(v[0] for v in qs.values()), sum(v[1] for v in qs.values())],
        "queries": {
            q: {
                "min": min(v),
                "med": sum(v) / 2,
                "max": max(v),
                "samples": list(v),
            }
            for q, v in qs.items()
        },
    }


BASE = _env(a=(1.0, 1.2), b=(0.30, 0.36), c=(2.0, 2.2))


def _verdicts(bench_queries, loaded=None, micro=None, tol=0.0):
    bench = {"value": sum(bench_queries.values()), "queries": bench_queries}
    return {
        r["query"]: r["verdict"]
        for r in adjudicate(bench, BASE, loaded, tol, micro)
    }


def test_inside_envelope_is_ok():
    v = _verdicts({"a": 1.1, "b": 0.33, "c": 2.1})
    assert v == {"a": "ok", "b": "ok", "c": "ok"}


def test_uniform_hot_run_passes_by_share():
    # every row +30%: absolute fails, shares are unchanged (tiny tol
    # absorbs the last-ulp float noise of mathematically-equal shares)
    v = _verdicts({"a": 1.56, "b": 0.468, "c": 2.86}, tol=0.001)
    assert set(v.values()) == {"hot-host (ratio inside)"}


def test_single_row_regression_flags():
    # only b regresses 3x: share moves out, no loaded/micro to absorb
    v = _verdicts({"a": 1.1, "b": 1.0, "c": 2.1})
    assert v["a"] == "ok" and v["c"] == "ok"
    assert v["b"] == "FLAG"


def test_loaded_envelope_absorbs_reproduced_exceedance():
    loaded = _env(a=(1.0, 1.3), b=(0.30, 1.1), c=(2.0, 2.4))
    v = _verdicts({"a": 1.1, "b": 1.0, "c": 2.1}, loaded=loaded)
    assert v["b"] == "hot-host (loaded range)"


def test_micro_variance_is_the_last_resort():
    micro = {"queries": {"b": {"min": 0.3, "med": 0.5, "max": 1.05}}}
    v = _verdicts({"a": 1.1, "b": 1.0, "c": 2.1}, micro=micro)
    assert v["b"] == "scheduler-tail"
    # and beyond even the single-run max it still flags
    v = _verdicts({"a": 1.1, "b": 1.2, "c": 2.1}, micro=micro)
    assert v["b"] == "FLAG"


def test_new_row_is_reported_not_judged():
    v = _verdicts({"a": 1.1, "b": 0.33, "c": 2.1, "d": 9.9})
    assert v["d"] == "new"


def test_sub_min_row_is_improved_not_hot_host():
    # a row genuinely FASTER than the envelope min is an improvement:
    # only the upper bound indicates regression, so it must adjudicate
    # 'improved' directly, never enter the hot-host cascade
    v = _verdicts({"a": 0.5, "b": 0.33, "c": 2.1})
    assert v == {"a": "improved", "b": "ok", "c": "ok"}


def test_improved_rows_excluded_from_share_denominator():
    # 'a' improves 10x while b and c run uniformly +50% hot.  If the
    # improved row stayed in the bench total it would shrink the
    # denominator and push b/c's shares past their ratio bounds
    # (spurious FLAG); excluded on BOTH sides, the uniform-hot rows
    # still adjudicate hot-host.
    v = _verdicts({"a": 0.1, "b": 0.45, "c": 3.0}, tol=0.001)
    assert v["a"] == "improved"
    assert v["b"] == "hot-host (ratio inside)"
    assert v["c"] == "hot-host (ratio inside)"


def test_share_uses_common_subset_totals():
    # bench carries a huge new row; shares must ignore it, so a
    # uniformly hot run still adjudicates hot-host, not FLAG
    v = _verdicts({"a": 1.56, "b": 0.468, "c": 2.86, "d": 50.0}, tol=0.001)
    assert v["a"] == "hot-host (ratio inside)"
    assert v["d"] == "new"


# -- interleaved-sentinel ratios (r10 VERDICT item 3) ----------------


def _senv(sentinel="s", **qs):
    """envelope whose rows also carry sratio distributions; qs maps
    name -> ((run1, run2), (sr1, sr2))."""
    e = _env(**{q: v[0] for q, v in qs.items()})
    e["sentinel"] = sentinel
    for q, (_, sr) in qs.items():
        e["queries"][q]["sratio"] = {
            "min": min(sr),
            "med": sum(sr) / 2,
            "max": max(sr),
            "samples": list(sr),
        }
    return e


SBASE = _senv(
    a=((1.0, 1.2), (3.2, 3.6)),
    b=((0.30, 0.36), (1.0, 1.15)),
    c=((2.0, 2.2), (6.5, 7.0)),
)


def _sverdicts(bench_queries, ratios, sentinel="s", env=None, tol=0.0):
    bench = {
        "value": sum(bench_queries.values()),
        "queries": bench_queries,
        "sentinel": {"name": sentinel, "ratios": ratios},
    }
    return {
        r["query"]: r["verdict"]
        for r in adjudicate(bench, env or SBASE, None, tol)
    }


def test_sentinel_ratio_absorbs_per_rep_hot_row():
    # b exceeds the absolute max AND its total-share bound (the run is
    # NON-uniformly hot: only b's reps hit host noise), but its
    # sentinel ratio stayed inside -- the adjacent sentinel was
    # equally slow in those reps.  The sentinel test must catch this
    # BEFORE the share test FLAGs it.  Run total 3.75 stays inside
    # the envelope totals [3.3, 3.76], so the exoneration is FULL
    # (the co-move guard below only arms on an out-of-envelope total).
    v = _sverdicts(
        {"a": 1.0, "b": 0.70, "c": 2.05},
        {"a": 3.4, "b": 1.1, "c": 6.7},
    )
    assert v["b"] == "hot-host (sentinel ratio inside)"
    assert v["a"] == "ok" and v["c"] == "ok"


def test_sentinel_comove_guard_is_provisional_when_globally_hot():
    # ADVICE r11 (adjudicate_bench.py:131): a regression in code
    # SHARED with the sentinel scales every row and the sentinel
    # together -- all ratios stay inside while the run total leaves
    # the envelope.  Same shape as a globally hot host, and the tool
    # cannot distinguish them, so sentinel exoneration must become
    # the PROVISIONAL 'hot-host? (sentinel co-moved)' (feeding the
    # probe_rows quiet-box watch), never the full verdict.
    v = _sverdicts(
        {"a": 1.5, "b": 0.45, "c": 3.0},  # uniform +50%: total 4.95
        {"a": 3.4, "b": 1.1, "c": 6.7},  # every ratio inside
        tol=0.001,
    )
    assert v == {
        "a": "hot-host? (sentinel co-moved)",
        "b": "hot-host? (sentinel co-moved)",
        "c": "hot-host? (sentinel co-moved)",
    }


def test_comoved_rows_do_not_flag_or_exit_nonzero():
    # provisional is a watch instruction, not a regression verdict:
    # no FLAG may fire for co-moved rows (exit-code gate unchanged)
    bench = {
        "value": 4.95,
        "queries": {"a": 1.5, "b": 0.45, "c": 3.0},
        "sentinel": {
            "name": "s",
            "ratios": {"a": 3.4, "b": 1.1, "c": 6.7},
        },
    }
    rows = adjudicate(bench, SBASE, None, 0.001)
    assert all(r["verdict"] != "FLAG" for r in rows)


def test_sentinel_ratio_outside_falls_through():
    # b regresses for real: raw time AND sentinel ratio out -> the
    # cascade falls through (no loaded/micro here) to FLAG
    v = _sverdicts(
        {"a": 1.1, "b": 1.0, "c": 2.1},
        {"a": 3.4, "b": 3.1, "c": 6.7},
    )
    assert v["b"] == "FLAG"


def test_sentinel_own_row_never_self_exonerates():
    # the sentinel's own row always has self-ratio ~1; a genuine
    # sentinel regression must not pass the sentinel test
    env = _senv(
        sentinel="a",
        a=((1.0, 1.2), (1.0, 1.0)),
        b=((0.30, 0.36), (0.3, 0.33)),
        c=((2.0, 2.2), (1.9, 2.0)),
    )
    v = _sverdicts(
        {"a": 3.0, "b": 0.33, "c": 2.1},
        {"a": 1.0, "b": 0.32, "c": 1.95},
        sentinel="a",
        env=env,
    )
    assert v["a"] == "FLAG"


def test_sentinel_mismatch_disables_the_test():
    # envelope measured sentinel 's', bench used 'z': ratios are not
    # comparable -- must fall through to the share test (here: FLAG)
    v = _sverdicts(
        {"a": 1.1, "b": 0.70, "c": 2.1},
        {"a": 3.4, "b": 1.1, "c": 6.7},
        sentinel="z",
    )
    assert v["b"] == "FLAG"


def test_benches_without_sentinel_still_adjudicate():
    # a pre-r11 bench (no sentinel key) against a sentinel-carrying
    # envelope: the old cascade applies unchanged
    bench = {"value": 4.86, "queries": {"a": 1.56, "b": 0.468, "c": 2.86}}
    v = {r["query"]: r["verdict"] for r in adjudicate(bench, SBASE, None, 0.001)}
    assert set(v.values()) == {"hot-host (ratio inside)"}


# -- r12 split-record loading (driver contract fix) ------------------


load_bench_record = _mod.load_bench_record


def _write(tmp_path, name, obj):
    import json

    p = tmp_path / name
    p.write_text(json.dumps(obj))
    return str(p)


def test_load_merges_fingerprint_matched_sentinel(tmp_path):
    b = _write(
        tmp_path,
        "BENCH_r12.json",
        {"parsed": {"value": 4.2, "queries": {"a": 4.2}, "sf": 0.1}},
    )
    s = _write(
        tmp_path,
        "sentinel.json",
        {"sentinel": {"name": "s", "ratios": {"a": 1.5}}, "value": 4.2},
    )
    rec = load_bench_record(b, sentinel_path=s)
    assert rec["sentinel"]["ratios"] == {"a": 1.5}


def test_load_ignores_stale_sentinel_side_file(tmp_path):
    # the side file is overwritten by every bench run (envelope
    # refreshes included): a fingerprint mismatch means it belongs to
    # a DIFFERENT run and merging would adjudicate one run's times
    # against another's ratios
    b = _write(
        tmp_path,
        "BENCH_r12.json",
        {"parsed": {"value": 4.2, "queries": {"a": 4.2}, "sf": 0.1}},
    )
    s = _write(
        tmp_path,
        "sentinel.json",
        {"sentinel": {"name": "s", "ratios": {"a": 9.9}}, "value": 7.7},
    )
    rec = load_bench_record(b, sentinel_path=s)
    assert "sentinel" not in rec


def test_load_resolves_queries_file_pointer(tmp_path):
    full = {"a": 1.0, "b": 2.0, "c": 3.0}
    qp = _write(tmp_path, "BENCH_QUERIES.json", full)
    b = _write(
        tmp_path,
        "BENCH_r12.json",
        {
            "value": 6.0,
            "queries": {"c": 3.0},
            "queries_file": qp,  # absolute: no repo-root dependency
            "queries_elided": 2,
            "sf": 0.1,
        },
    )
    rec = load_bench_record(b, sentinel_path=str(tmp_path / "none"))
    assert rec["queries"] == full
    assert "queries_file" not in rec and "queries_elided" not in rec


def test_load_exits_on_parsed_null(tmp_path):
    # the r11 failure shape itself: surface it, don't crash opaquely
    import pytest

    b = _write(tmp_path, "BENCH_r11.json", {"parsed": None, "n": 11})
    with pytest.raises(SystemExit):
        load_bench_record(b, sentinel_path=str(tmp_path / "none"))
