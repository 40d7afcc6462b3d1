"""Attribute the r10->r11 ``tx_stream_drain_steady`` envelope drift
(r11 VERDICT item 2: unloaded med 6.191 -> 7.16 s, min 4.679 ->
5.024 across the envelope refreshes).

Two candidate causes, each tested directly:

1. CODE -- r11 touched the TxTable checkpoint write path
   (feature-gate stamping, row-count manifests, parquet parts;
   txtable.py:734-921).  But the bench's storage-tier tables commit
   at most 8 versions against the default ``checkpoint_every=10``,
   so ``_maybe_checkpoint`` early-returns on EVERY commit and none
   of the touched code executes.  This tool PROVES that on each rep
   by asserting zero ``.ckpt_v*`` files exist under either bench
   table's log dir after the ops run -- an empirical, not just
   textual, exclusion.

2. MEASUREMENT PROTOCOL -- r11's other change to this row's
   environment is bench.py's interleaved sentinel (default on): the
   r10 envelope series ran without a sentinel execution adjacent to
   each rep, the r11 series with one.  The sentinel
   (o3_global_topk over events) shares the JVM and may leave
   cache/shuffle pressure the drain then pays.  Tested by ABBA-
   interleaved single-rep ``bench_storage`` passes with
   ``sentinel_fn`` None vs live, same box, same hour.

Usage::

    python tools/ab_drain_steady.py [pairs]   # default 3 -> 6 passes

Writes BENCH_DRAIN_AB.json; fold the verdict into BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from nyc_crash_mapper_etl_script_spark.schemas import load_table
    from nyc_crash_mapper_etl_script_spark.session import get_spark

    spark = get_spark("ab-drain-steady")

    from nyc_crash_mapper_etl_script_spark import harness

    sentinel_q = harness.queries()[bench.SENTINEL]

    def sentinel_live() -> float:
        df = sentinel_q(spark, sf_dir)
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warm both shapes once (JIT, parquet footers) -- untimed
    load_table(spark, sf_dir, "orders").count()
    bench.bench_storage(spark, sf_dir, 1, None)

    # empirical exclusion of the r11-touched write path: spy on
    # _maybe_checkpoint and count invocations that get PAST the
    # checkpoint_every early return (the bench tables commit <=8
    # versions against every=10, so this must stay zero)
    from nyc_crash_mapper_etl_script_spark.sources.txtable import TxTable

    due = {"n": 0}
    orig_ckpt = TxTable._maybe_checkpoint

    def spy(self, version):
        if self.checkpoint_every and version % self.checkpoint_every == 0:
            due["n"] += 1
        return orig_ckpt(self, version)

    TxTable._maybe_checkpoint = spy

    results = {"off": [], "on": []}
    order = []
    for i in range(pairs):
        order += ["off", "on"] if i % 2 == 0 else ["on", "off"]  # ABBA
    for variant in order:
        fn = sentinel_live if variant == "on" else None
        times, _ = bench.bench_storage(spark, sf_dir, 1, fn)
        assert due["n"] == 0, (
            "bench table checkpoint became due -- the code-path "
            "exclusion argument is void, re-attribute"
        )
        results[variant].append(times["tx_stream_drain_steady"])
        print(
            f"sentinel={variant}: drain_steady={times['tx_stream_drain_steady']}"
            f" (drain={times['tx_stream_drain']})",
            flush=True,
        )
    out = {
        "sf_dir": sf_dir,
        "pairs": pairs,
        "order": order,
        "drain_steady": results,
        "min": {k: min(v) for k, v in results.items()},
        "med": {
            k: sorted(v)[len(v) // 2] for k, v in results.items()
        },
        "ckpt_write_path_executed": False,
    }
    with open(os.path.join(REPO, "BENCH_DRAIN_AB.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("min", "med")}))
    spark.stop()


if __name__ == "__main__":
    main()
