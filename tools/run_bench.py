"""Run bench.py once and write the REASSEMBLED full record (contract
line + sentinel line + any queries_file pointer merged back into one
JSON object) to a file -- the shape ADJUDICATION/envelope tooling and
the committed ``BENCH_local_r{N}.json`` artifacts expect.

Since r12, bench.py's stdout is two lines (driver-contract budget
fix; see bench.LINE_BUDGET), so a bare ``python bench.py > out.json``
no longer produces a single JSON document.  Use::

    python tools/run_bench.py BENCH_local_r12.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out_path = (
        sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "BENCH_local.json")
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=3600,
    )
    sys.stderr.write(r.stderr)
    if r.returncode != 0:
        sys.exit(r.returncode)
    sys.path.insert(0, REPO)
    import bench

    rec = bench.parse_stdout(r.stdout, root=REPO)
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"{out_path}: total={rec['value']}s, {len(rec['queries'])} rows")


if __name__ == "__main__":
    main()
