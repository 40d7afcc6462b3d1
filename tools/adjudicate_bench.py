"""Adjudicate a driver bench sample against the committed
distributions (r6 VERDICT item 3, made mechanical): for each row of a
``BENCH_r{N}.json``, decide hot-host vs genuine regression by three
tests in order --

1. ABSOLUTE: inside [min, max] of BENCH_ENVELOPE.json (10 unloaded
   driver-exact runs)?  -> ``ok``.
1b. SENTINEL RATIO (r10 VERDICT item 3, PREFERRED when present):
   bench.py interleaves every timed rep with a fixed sentinel query
   and records min-over-reps ``row_time / adjacent_sentinel_time``.
   Host load within a rep scales both together, so this ratio is
   load-invariant PER-REP -- stronger than the per-run total-share
   test below, which a non-uniformly hot host can defeat.  If both
   the bench sample and the envelope carry sentinel ratios for the
   row (and the row is not the sentinel itself, whose self-ratio is
   ~1 by construction), inside the sratio envelope ->
   ``hot-host (sentinel ratio inside)``.
   CO-MOVE GUARD (ADVICE r11): the ratio is load-invariant but also
   blind to a regression in code SHARED with the sentinel (scan +
   shuffle machinery) -- uniform scaling moves row and sentinel
   together and every ratio stays inside.  When the RUN TOTAL is
   also outside the unloaded envelope's totals (the signature both a
   hot host and a shared-path regression produce), the verdict is
   the PROVISIONAL ``hot-host? (sentinel co-moved)`` instead of full
   exoneration: not a FLAG (exit code unchanged), but an instruction
   to run the existing tools/probe_rows.py quiet-box watch protocol
   once before trusting the round.  A quiet-box probe separates the
   two: host heat vanishes, a shared-path regression does not.
2. RATIO: the row's share of the run total inside the ratio envelope?
   A uniformly hot host scales every row and the total together, so
   shares are load-invariant; a genuine single-row regression moves
   its share out.  Shares are computed over the COMMON row subset on
   both sides (per envelope run, from its committed samples), so a
   bench and an envelope with different row sets -- e.g. a new bench
   row landed since the refresh -- still compare apples to apples.
   -> ``hot-host (ratio inside)``.
3. LOADED: inside [min, max] of BENCH_ENVELOPE_LOADED.json (the same
   bench under synthetic cache-pressure co-load)?  -> ``hot-host
   (loaded range)`` -- the exceedance is reproduced by co-load alone.
4. SCHEDULER TAIL: inside the single-run range of
   BENCH_MICRO_VARIANCE.json?  A min-of-3 under CORRELATED stall
   (hypervisor steal on a shared VM -- not synthesizable by in-VM
   co-load) behaves like a single draw, and a min-of-3 can never
   exceed the single-run max under the same conditions.
   -> ``scheduler-tail``.

Only a row failing ALL FOUR is ``FLAG``ed for investigation.  Rows
absent from the envelope (newer than the refresh) are ``new``.
A FLAG is an instruction to investigate, not a verdict of
regression: r6's c1/c2/c3 driver samples fail all four on a
quiet-box reference (committed investigation: single-run spread
0.28-0.43 across three measurement methods, plans unchanged, code
untouched since r4) -- consistent only with correlated host noise
beyond in-VM reproduction, and worth exactly one look per round.

Usage::

    python tools/adjudicate_bench.py BENCH_r07.json [--tol 0.05]

``--tol`` widens every bound by the given fraction.  The default 5%
is an order-statistics calibration, not a fudge: a fresh sample
exceeds the MAX of a 10-run envelope with probability 1/11 PER ROW,
so a ~50-row bench expects ~4.7 beyond-max events on a perfectly
in-distribution run; the cascade absorbs most.  Measured on a fresh
local run (total 42.38 vs envelope totals [36.4, 42.4] --
in-distribution overall): 9/52 rows land beyond the absolute max,
the cascade resolves 6, and ~3 individually-hot rows still FLAG at
either 2% or 5% -- so treat a small FLAG count as per-row triage
("look once", diff the plan, check the committed variance artifacts),
and treat zero FLAGs, not zero exceedances, as the pass bar.  Exit
code 1 iff any row is FLAGged, so the check can gate CI.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def adjudicate(
    bench: dict,
    env: dict,
    loaded: dict | None,
    tol: float,
    micro: dict | None = None,
) -> list[dict]:
    common = sorted(set(bench["queries"]) & set(env["queries"]))
    # rows faster than the envelope min are IMPROVEMENTS: only the
    # upper bound indicates regression, so they adjudicate 'improved'
    # directly (never the hot-host cascade) and are EXCLUDED from the
    # share denominators on both sides -- a genuinely faster row
    # shrinking the bench total must not inflate every other row's
    # share past its ratio bound.
    improved = {
        q
        for q in common
        if bench["queries"][q] < env["queries"][q]["min"] * (1 - tol)
    }
    denom_rows = [q for q in common if q not in improved]
    bench_common_total = sum(bench["queries"][q] for q in denom_rows)
    # per-run common-subset totals from the envelope's raw samples, so
    # the share denominators cover the SAME rows on both sides
    n_runs = env["runs"]
    run_totals = [
        sum(env["queries"][q]["samples"][i] for q in denom_rows)
        for i in range(n_runs)
    ]
    sen = bench.get("sentinel") or {}
    sen_ratios = sen.get("ratios", {})
    sen_name = sen.get("name")
    env_sentinel = env.get("sentinel")
    # co-move guard input: is this run's total itself beyond the
    # unloaded envelope?  (true for both a globally hot host and a
    # shared-path regression -- the sentinel ratio can't tell them
    # apart, so sentinel exonerations become provisional)
    env_totals = env.get("totals") or []
    globally_hot = bool(env_totals) and bench.get(
        "value", 0.0
    ) > max(env_totals) * (1 + tol)
    out = []
    for q, t in sorted(bench["queries"].items()):
        e = env["queries"].get(q)
        if e is None:
            out.append({"query": q, "sec": t, "verdict": "new"})
            continue
        hi = e["max"] * (1 + tol)
        lo = e["min"] * (1 - tol)
        row = {"query": q, "sec": t, "env": [e["min"], e["med"], e["max"]]}
        if t <= hi:
            row["verdict"] = "ok" if t >= lo else "improved"
            out.append(row)
            continue
        # 1b. interleaved-sentinel ratio: per-rep load-invariant,
        # preferred over the per-run share test when both sides carry
        # it and the sentinels match (never for the sentinel's own
        # row -- its self-ratio is ~1 regardless of regression)
        se = e.get("sratio")
        if (
            se is not None
            and q in sen_ratios
            and q != sen_name
            and sen_name == env_sentinel
        ):
            row["sratio"] = sen_ratios[q]
            row["sratio_env"] = [se["min"], se["med"], se["max"]]
            if sen_ratios[q] <= se["max"] * (1 + tol):
                row["verdict"] = (
                    "hot-host? (sentinel co-moved)"
                    if globally_hot
                    else "hot-host (sentinel ratio inside)"
                )
                out.append(row)
                continue
        share = t / bench_common_total
        env_shares = [
            e["samples"][i] / run_totals[i] for i in range(n_runs)
        ]
        row["share"] = round(share, 5)
        row["share_env"] = [
            round(min(env_shares), 5),
            round(max(env_shares), 5),
        ]
        if share <= max(env_shares) * (1 + tol):
            row["verdict"] = "hot-host (ratio inside)"
            out.append(row)
            continue
        le = (loaded or {}).get("queries", {}).get(q)
        if le is not None:
            row["loaded_env"] = [le["min"], le["med"], le["max"]]
            if t <= le["max"] * (1 + tol):
                row["verdict"] = "hot-host (loaded range)"
                out.append(row)
                continue
        me = (micro or {}).get("queries", {}).get(q)
        if me is not None:
            row["single_run_env"] = [me["min"], me["med"], me["max"]]
            if t <= me["max"] * (1 + tol):
                row["verdict"] = "scheduler-tail"
                out.append(row)
                continue
        row["verdict"] = "FLAG"
        out.append(row)
    return out


def load_bench_record(path: str, sentinel_path: str | None = None) -> dict:
    """Load a bench artifact and reassemble the r12 split format.

    The driver wraps bench.py's final stdout line under ``parsed``.
    Since r12 that line carries only the contract fields (the inline
    sentinel block broke the driver's 2000-char tail capture in r11,
    BENCH_r11.json ``parsed: null``); the sentinel ratios live in
    ``BENCH_SENTINEL.json`` next to bench.py, value-fingerprinted to
    the run that wrote it.  Merge it ONLY when the fingerprint
    matches this record's total -- the side file is overwritten by
    every bench run in the repo (envelope refreshes included), so an
    unfingerprinted merge could adjudicate one run's times against
    another run's ratios.  ``--sentinel`` pins an explicit (e.g.
    round-preserved) copy.  A ``queries_file`` pointer (emitted when
    the registry outgrows the line budget) resolves repo-relative.
    """
    with open(path) as f:
        bench = json.load(f)
    if "parsed" in bench and "value" not in bench:
        bench = bench["parsed"]
    if bench is None:
        sys.exit(f"{path}: parsed is null -- no contract line captured")
    if "sentinel" not in bench:
        sp = sentinel_path or os.path.join(REPO, "BENCH_SENTINEL.json")
        if os.path.exists(sp):
            with open(sp) as f:
                side = json.load(f)
            if side.get("value") == bench.get("value"):
                bench["sentinel"] = side["sentinel"]
                bench["_sentinel_source"] = os.path.basename(sp)
            else:
                print(
                    f"note: {os.path.basename(sp)} fingerprint "
                    f"{side.get('value')} != sample total "
                    f"{bench.get('value')} -- stale side file ignored, "
                    "adjudicating without sentinel ratios",
                    file=sys.stderr,
                )
    qf = bench.pop("queries_file", None)
    if qf is not None:
        qp = qf if os.path.isabs(qf) else os.path.join(REPO, qf)
        with open(qp) as f:
            bench["queries"] = json.load(f)
        bench.pop("queries_elided", None)
    return bench


def _take_flag(args: list, name: str):
    """Pop ``name <value>`` from args; usage error if value missing."""
    if name not in args:
        return None
    i = args.index(name)
    if i + 1 >= len(args):
        sys.exit(f"usage: {name} <value>")
    value = args[i + 1]
    del args[i : i + 2]
    return value


def main() -> None:
    args = [a for a in sys.argv[1:]]
    t = _take_flag(args, "--tol")
    tol = float(t) if t is not None else 0.05
    json_out = _take_flag(args, "--json")
    # --env/--loaded/--micro pin ALL the cascade's inputs to specific
    # (e.g. round-preserved) files so a committed adjudication stays
    # reproducible after the repo-current distributions are refreshed
    # for newer code
    env_path = _take_flag(args, "--env") or os.path.join(
        REPO, "BENCH_ENVELOPE.json"
    )
    loaded_path = _take_flag(args, "--loaded") or os.path.join(
        REPO, "BENCH_ENVELOPE_LOADED.json"
    )
    micro_path = _take_flag(args, "--micro") or os.path.join(
        REPO, "BENCH_MICRO_VARIANCE.json"
    )
    sentinel_path = _take_flag(args, "--sentinel")
    bench_path = args[0] if args else os.path.join(REPO, "BENCH_r07.json")
    bench = load_bench_record(bench_path, sentinel_path)
    with open(env_path) as f:
        env = json.load(f)
    loaded = None
    if os.path.exists(loaded_path):
        with open(loaded_path) as f:
            loaded = json.load(f)
    micro = None
    if os.path.exists(micro_path):
        with open(micro_path) as f:
            micro = json.load(f)
    rows = adjudicate(bench, env, loaded, tol, micro)
    n_flag = 0
    for r in rows:
        if r["verdict"] != "ok":
            print(json.dumps(r))
        n_flag += r["verdict"] == "FLAG"
    tot_note = ""
    if env.get("totals"):
        tmax = max(env["totals"]) * (1 + tol)
        if bench["value"] > tmax and loaded and loaded.get("totals"):
            tot_note = (
                " (run total exceeds the unloaded envelope"
                f" {round(max(env['totals']), 3)} -> globally hot;"
                f" loaded totals reach {round(max(loaded['totals']), 3)})"
            )
    n_comoved = sum(
        r["verdict"] == "hot-host? (sentinel co-moved)" for r in rows
    )
    comoved_note = (
        f" [{n_comoved} sentinel co-moved, provisional: run one"
        " quiet-box probe_rows pass]"
        if n_comoved
        else ""
    )
    summary = (
        f"{len(rows)} rows: "
        f"{sum(r['verdict'] == 'ok' for r in rows)} ok, "
        f"{sum(r['verdict'] == 'improved' for r in rows)} improved, "
        f"{sum(r['verdict'].startswith('hot-host') for r in rows)} hot-host"
        f"{comoved_note}, "
        f"{sum(r['verdict'] == 'scheduler-tail' for r in rows)} scheduler-tail, "
        f"{sum(r['verdict'] == 'new' for r in rows)} new, "
        f"{n_flag} FLAG{tot_note}"
    )
    print(summary)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {
                    "bench": os.path.basename(bench_path),
                    "envelope": os.path.basename(env_path),
                    "loaded": os.path.basename(loaded_path)
                    if loaded is not None
                    else None,
                    "micro": os.path.basename(micro_path)
                    if micro is not None
                    else None,
                    "sentinel_source": bench.get("_sentinel_source"),
                    "tol": tol,
                    "summary": summary,
                    "rows": rows,
                },
                f,
                indent=1,
            )
    sys.exit(1 if n_flag else 0)


if __name__ == "__main__":
    main()
