"""Per-query variance envelopes for the bench of record (r4 VERDICT
item 1): run the DRIVER-EXACT bench (``python bench.py``, fresh
process each run, same env) N times and aggregate min/median/max per
query, so a single driver sample can be judged against a committed
distribution instead of a point estimate.

Usage::

    python tools/bench_envelope.py [runs] [out.json] [--loaded N]

Env: ``SPARK_GRAFT_SF_DIR`` / ``SPARK_GRAFT_CPUS`` /
``SPARK_GRAFT_BENCH_REPS`` pass through to bench.py unchanged;
``SPARK_GRAFT_BENCH_ISOLATE=0`` runs the A/B variant (no per-query
cache release -- the r3 behavior) for attributing regressions to
cache pressure vs the isolation change.

Two adjudication mechanisms for hot-host driver samples (r6 VERDICT
item 3 -- the r5/r6 exceedances were uniform shifts on untouched
code, so more unloaded runs was not the lever):

- RATIO envelopes: every query also aggregates its per-run
  ``time / run total`` share.  A uniformly hot host scales every row
  and the total together, so ratios stay inside their envelope; a
  genuine single-row regression moves that row's ratio out.  Judge a
  suspect driver sample by ratio first.
- ``--loaded N``: re-run the whole envelope with N synthetic
  co-load processes (CPU spin over a 64 MiB buffer -- cache pressure,
  not just cycles) pinned for the duration of each bench run, and
  commit it as BENCH_ENVELOPE_LOADED.json.  A driver sample outside
  the unloaded envelope but inside the loaded one is a hot host, not
  a regression.

Output JSON: ``{"runs": N, "isolate": bool, "loaded": N|0, "sf": ..,
"queries": {name: {"min": .., "med": .., "max": .., "samples": [..],
"ratio": {"min": .., "med": .., "max": ..}}}, "totals": [..]}``.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: synthetic co-load worker: spin over a 64 MiB buffer so the loader
#: competes for LLC and memory bandwidth, not just cycles
_SPIN = (
    "import sys;"
    "b = bytearray(64 * 1024 * 1024);"
    "i = 0\n"
    "while True:\n"
    "    b[i % len(b)] = (b[i % len(b)] + 1) & 0xFF\n"
    "    i += 4096\n"
)


def one_run(env: dict, loaded: int) -> dict:
    spinners = [
        subprocess.Popen([sys.executable, "-c", _SPIN])
        for _ in range(loaded)
    ]
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True,
            text=True,
            env=env,
            cwd=REPO,
            timeout=3600,
        )
    finally:
        for p in spinners:
            p.kill()
        for p in spinners:
            p.wait()
    # r12: bench.py emits the sentinel block on its own line before
    # the (budget-capped) contract line -- parse_stdout reassembles
    # the full record so sratio aggregation below keeps working
    sys.path.insert(0, REPO)
    import bench as bench_mod

    return bench_mod.parse_stdout(out.stdout, root=REPO)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    loaded = 0
    if "--loaded" in args:
        i = args.index("--loaded")
        loaded = int(args[i + 1])
        del args[i : i + 2]
    runs = int(args[0]) if len(args) > 0 else 5
    out_path = args[1] if len(args) > 1 else os.path.join(
        REPO,
        "BENCH_ENVELOPE_LOADED.json" if loaded else "BENCH_ENVELOPE.json",
    )
    env = dict(os.environ)
    samples: dict[str, list[float]] = {}
    ratios: dict[str, list[float]] = {}
    sratios: dict[str, list[float]] = {}
    totals: list[float] = []
    sf = None
    sentinel = None
    for i in range(runs):
        r = one_run(env, loaded)
        sf = r.get("sf")
        totals.append(r["value"])
        for q, t in r["queries"].items():
            samples.setdefault(q, []).append(t)
            ratios.setdefault(q, []).append(round(t / r["value"], 5))
        # interleaved-sentinel ratios (r10 VERDICT item 3): per-rep
        # load-invariant, aggregated across runs like the raw times
        sen = r.get("sentinel")
        if sen:
            assert sentinel in (None, sen["name"]), "sentinel changed mid-series"
            sentinel = sen["name"]
            for q, sr in sen["ratios"].items():
                sratios.setdefault(q, []).append(sr)
        print(f"run {i + 1}/{runs}: total={r['value']}s", flush=True)
    agg = {
        q: {
            "min": round(min(v), 3),
            "med": round(statistics.median(v), 3),
            "max": round(max(v), 3),
            "samples": v,
            "ratio": {
                "min": min(ratios[q]),
                "med": round(statistics.median(ratios[q]), 5),
                "max": max(ratios[q]),
            },
            **(
                {
                    "sratio": {
                        "min": min(sratios[q]),
                        "med": round(statistics.median(sratios[q]), 4),
                        "max": max(sratios[q]),
                        "samples": sratios[q],
                    }
                }
                if q in sratios
                else {}
            ),
        }
        for q, v in sorted(samples.items())
    }
    doc = {
        "runs": runs,
        "isolate": env.get("SPARK_GRAFT_BENCH_ISOLATE", "1") != "0",
        "loaded": loaded,
        "sf": sf,
        "sentinel": sentinel,
        "totals": totals,
        "queries": agg,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({q: {k: a[k] for k in ("min", "med", "max")} for q, a in agg.items()}, indent=0))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
