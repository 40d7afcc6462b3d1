"""Per-query variance envelopes for the bench of record (r4 VERDICT
item 1): run the DRIVER-EXACT bench (``python bench.py``, fresh
process each run, same env) N times and aggregate min/median/max per
query, so a single driver sample can be judged against a committed
distribution instead of a point estimate.

Usage::

    python tools/bench_envelope.py [runs] [out.json]

Env: ``SPARK_GRAFT_SF_DIR`` / ``SPARK_GRAFT_CPUS`` /
``SPARK_GRAFT_BENCH_REPS`` pass through to bench.py unchanged;
``SPARK_GRAFT_BENCH_ISOLATE=0`` runs the A/B variant (no per-query
cache release -- the r3 behavior) for attributing regressions to
cache pressure vs the isolation change.

Output JSON: ``{"runs": N, "isolate": bool, "sf": .., "queries":
{name: {"min": .., "med": .., "max": .., "samples": [..]}},
"totals": [..]}``.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def one_run(env: dict) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=3600,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "BENCH_ENVELOPE.json"
    )
    env = dict(os.environ)
    samples: dict[str, list[float]] = {}
    totals: list[float] = []
    sf = None
    for i in range(runs):
        r = one_run(env)
        sf = r.get("sf")
        totals.append(r["value"])
        for q, t in r["queries"].items():
            samples.setdefault(q, []).append(t)
        print(f"run {i + 1}/{runs}: total={r['value']}s", flush=True)
    agg = {
        q: {
            "min": round(min(v), 3),
            "med": round(statistics.median(v), 3),
            "max": round(max(v), 3),
            "samples": v,
        }
        for q, v in sorted(samples.items())
    }
    doc = {
        "runs": runs,
        "isolate": env.get("SPARK_GRAFT_BENCH_ISOLATE", "1") != "0",
        "sf": sf,
        "totals": totals,
        "queries": agg,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({q: {k: a[k] for k in ("min", "med", "max")} for q, a in agg.items()}, indent=0))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
