"""Plan-quality gate over the whole query registry: every registered
query's physical plan is checked for the operators that would break at
100 TB — accidental nested-loop joins, cartesian products, and
row-at-a-time Python evaluation.  Exceptions are explicit and
documented where they are intentional."""

from __future__ import annotations

import pytest

from nyc_crash_mapper_etl_script_spark import harness

SF_DIR = "/root/testdata/sf0.001"

#: queries where a BroadcastNestedLoopJoin is the *chosen* strategy
#: (tiny literal dimension with a non-equi predicate; see the
#: strategy="nlj" docs in operators/spatial_join.py)
NLJ_OK = {
    "j6_bbox_containment_join",   # 4 literal cells, range containment
    "j7_circle_containment_agg",  # 4 literal circles, strategy="nlj"
    "j2_bbox_sanity_nullout",     # 1-row broadcast extent (scalar box)
    "p3_p4_watermark_window",     # 1-row broadcast max-ts watermark
    "sim_bruteforce_topk",        # broadcast query set x corpus: the
                                  # exact-ANN baseline is a cross join
                                  # by definition (scale path: sim_lsh)
    "sim_lsh_recall",             # recall@k composes the brute-force
                                  # baseline (the exact side of the
                                  # comparison) -> inherits its NLJ
    "sim_ivf_topk",               # centroid assignment is corpus x
                                  # broadcast(n_cells) by definition;
                                  # the probe itself is an equi join
    "sim_quantized_topk",         # candidate stage scores corpus x
                                  # broadcast(query set) on int8
                                  # vectors by design; refine is an
                                  # equi join on the survivors
    "sim_pq_topk",                # candidate stage scores PQ codes x
                                  # broadcast(query LUTs) by design;
                                  # refine is an equi join
    "text_tfidf_topterms",        # 1-row broadcast doc-count N
    "zorder_values",              # 1-row broadcast extent aggregate
    "sample_temperature",         # 1-row broadcast sqrt-sum scalar
    "pipeline_training_mix",      # same 1-row scalar via its sample stage
    "q22_idle_customer_balance",  # 1-row broadcast global-average scalar
                                  # (the uncorrelated subquery of TPC-H
                                  # Q22, applied as a cross join)
    "dedup_lsh_quality",          # three 1-row count scalars cross-joined
                                  # into the precision/recall summary row
    "dedup_semantic_quality",     # same shape: three 1-row count scalars
                                  # cross-joined into the recall row
    "dedup_semantic_stream_divergence",  # same shape: four 1-row count
                                  # scalars cross-joined into the
                                  # divergence row
    "q11_important_stock",        # 1-row broadcast grand-total threshold
                                  # (TPC-H Q11's scalar HAVING subquery)
    "q15_top_supplier",           # 1-row broadcast max-revenue scalar
                                  # (TPC-H Q15's view-max subquery)
    "text_bm25_rank",             # 1-row broadcast N/avgdl corpus stats
    "quality_lm_score",           # 1-row broadcast T/V model totals
    "dedup_tfidf_cosine",         # 1-row broadcast doc-count N (IDF)
    "sample_dsir_select",         # two 1-row broadcast T/V totals
                                  # (target + background LM passes)
}

#: queries that legitimately run vectorized Python (Arrow batches)
ARROW_OK = {
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_ingest_check",
    "dedup_minhash_lsh",  # numpy minhash (HOF Column form measured ~13x slower)
    "dedup_minhash_incremental",  # same numpy signature pass (batch side)
    "dedup_simhash",      # numpy simhash, same rationale
    "sim_ivf_topk",       # numpy matmul centroid argmax (replaces a
                          # full-corpus groupBy-argmax shuffle)
    "quality_model_gate", # the Arrow inference hook IS the point:
                          # caller-supplied scorer over the feature
                          # frame via one mapInPandas stage
    "pack_token_budget",  # the same grouped pack stage over the
                          # stub token-count column
    "pack_sequences",     # greedy packing is sequential within a
                          # group by definition; applyInPandas over
                          # bounded groups is the distributed shape
    "pack_concat_text",   # composes pack_sequences' grouped stage
    "pipeline_training_mix",  # ends in the same grouped pack stage
    "dedup_semantic_clusters",  # numpy matmul centroid assignment
                                # (the same ivf_assign Arrow stage as
                                # sim_ivf_topk); the prune join itself
                                # is an equi join on cell_id
    "dedup_semantic_incremental",  # same Arrow assignment stage over
                                   # the index and the new batch
    "semantic_assignment_drift",   # same Arrow assignment stage; the
                                   # distance agg is pure codegen
    "dedup_semantic_stream_divergence",  # composes three semantic
                                   # passes -> inherits the Arrow stage
    "dedup_semantic_quality",   # composes two semantic_dedup passes
                                # -> inherits the same Arrow stage
}


@pytest.mark.parametrize("name", sorted(harness.queries()))
def test_plan_shape(name, spark):
    df = harness.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if name not in NLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: accidental NLJ"
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    # row-at-a-time Python is never acceptable
    assert "BatchEvalPython" not in plan, f"{name}: row-wise Python UDF"
    if name not in ARROW_OK:
        assert "ArrowEvalPython" not in plan, f"{name}: unexpected Python stage"
        assert "MapInPandas" not in plan, f"{name}: unexpected Python stage"
        assert (
            "FlatMapGroupsInPandas" not in plan
        ), f"{name}: unexpected grouped Python stage"
