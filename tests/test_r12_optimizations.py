"""Pins for the r12 optimization round's operator-internal changes.

Each optimization here changed HOW an operator computes (plan shape),
never WHAT it computes (outputs stay oracle-identical -- the DuckDB
gate re-proves that separately).  These tests pin the plan-shape
contracts so a later refactor can't silently regress them:

 - substring_span_stats' first-occurrence aggregate must stay a
   HashAggregate (the r11 digit-string encoding silently planned as
   SortAggregate + a full per-partition Sort of every exploded
   window row -- min(string) is not a mutable fixed-width aggregation
   buffer; the decimal packing is);
 - contamination_check must be a single corpus pass (explode_outer
   keeps zero-shingle docs without the second scan + id-DISTINCT +
   join-back the r11 shape paid);
 - semantic_dedup must evaluate its Arrow assignment stage once per
   action, not once per prune-join side;
 - the packed decimal must order exactly like the (id, pos) tuple,
   including at the domain edges.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_span_firsts_aggregate_is_hash_not_sort(spark):
    from nyc_crash_mapper_etl_script_spark.operators.dedup_text import (
        substring_span_stats,
    )

    docs = spark.createDataFrame(
        [(1, "abcdefghij" * 30), (2, "abcdefghij" * 30), (3, "unique text here")],
        "doc_id long, text string",
    )
    plan = _plan(substring_span_stats(docs, k=40))
    assert "SortAggregate" not in plan, (
        "first-occurrence min() fell back to SortAggregate -- the "
        "aggregation buffer is no longer a mutable fixed-width type"
    )
    assert "HashAggregate" in plan


def test_span_decimal_encoding_orders_like_id_pos_tuple(spark):
    # the packed decimal id*10^10 + pos must pick the same "first
    # occurrence" as lexicographic (id, pos) -- exercised at the
    # domain edges: id near long-max/10^10 headroom, pos large, and
    # the (id=1, pos=2) vs (id=2, pos=1) inversion a naive id+pos
    # packing would get wrong.
    from nyc_crash_mapper_etl_script_spark.operators.dedup_text import (
        substring_span_stats,
    )

    w = "x" * 40  # one shared 40-char window
    docs = spark.createDataFrame(
        [(2, "A" + w), (1, "BB" + w), (900_000_000_000, w + "tail")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in substring_span_stats(docs, k=40).collect()
    }
    # doc 1 holds the window at pos 3, doc 2 at pos 2: first
    # occurrence is (1, 3) by (id, pos) order -- doc 1 keeps all
    # chars, doc 2 and the big-id doc lose the 40-char span
    assert out[1]["removed_chars"] == 0
    assert out[2]["removed_chars"] == 40
    assert out[900_000_000_000]["removed_chars"] == 40


def test_contamination_is_single_corpus_pass(spark):
    from nyc_crash_mapper_etl_script_spark.operators.contamination import (
        contamination_check,
    )

    corpus = spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("some words here number "), F.col("id")).alias("text"),
    )
    benchmark = spark.createDataFrame(
        [(99, "some words here number 7")], "doc_id long, text string"
    )
    plan = _plan(contamination_check(corpus, benchmark, "doc_id", "text", k=5))
    # one Generate for the corpus explode, one for the benchmark side
    assert plan.count("Generate") == 2, (
        "contamination_check re-derives the corpus (the r11 shape "
        "scanned it twice and joined the census back on a DISTINCT "
        "id set)"
    )


def test_minhash_band_census_computed_once(spark):
    # big_keys (the oversized-bucket census) is referenced by THREE
    # consumers (members anti-join + both oversized self-join sides);
    # without its lazy localCheckpoint Catalyst clones the band
    # explode + census Exchange + HashAggregate into each one (the
    # r12 before-plan ran it 3x).  Checkpointed, the final plan holds
    # exactly one groupBy("bk") count aggregate: the posting-list
    # collect_list (ObjectHashAggregate) and the pair-dedup, nothing
    # counting bucket sizes.
    from nyc_crash_mapper_etl_script_spark.operators.dedup_text import (
        minhash_near_duplicates,
    )

    docs = spark.createDataFrame(
        [(i, f"some text body number {i % 3} repeated words") for i in range(12)],
        "doc_id long, text string",
    )
    plan = _plan(
        minhash_near_duplicates(docs, num_perm=16, bands=4, max_bucket=4)
    )
    # census aggregates surface as HashAggregate(keys=[bk...]) pairs
    # (partial + final); the checkpointed plan keeps exactly one pair
    n_census = plan.count("keys=[bk")
    assert n_census <= 2, (
        f"band census cloned {n_census // 2}x -- big_keys' lazy "
        "localCheckpoint no longer truncates its consumers"
    )


def test_tfidf_norms_and_vecs_computed_once(spark):
    # finish() joins the norms under both aliases and the capped path
    # joins the weight maps under both aliases; without their lazy
    # localCheckpoints each aggregate (including the map-building
    # ObjectHashAggregate, the row's dominant cost) ran once per join
    # side (r12 before-plan: 2x HashAggregate(nrm) + 2x
    # ObjectHashAggregate(vec) subtrees).
    from nyc_crash_mapper_etl_script_spark.operators.dedup_text import (
        tfidf_cosine_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"shared words plus token {i % 2} extra body text") for i in range(10)],
        "doc_id long, text string",
    )
    plan = _plan(tfidf_cosine_pairs(docs, k=3, threshold=0.1, max_posting=8))
    assert plan.count("map_from_entries") <= 2, (
        "the per-doc weight-map ObjectHashAggregate is cloned per "
        "join side -- vecs' lazy localCheckpoint no longer truncates it"
    )
    assert plan.count("SQRT") <= 2, (
        "the norm aggregate is cloned per join side -- norms' lazy "
        "localCheckpoint no longer truncates it"
    )


def test_semantic_dedup_assigns_once_per_action(spark):
    from nyc_crash_mapper_etl_script_spark.operators.similarity import (
        semantic_dedup,
    )

    vecs = spark.createDataFrame(
        [(i, [float(i % 4), float((i * 3) % 5)]) for i in range(24)],
        "vec_id long, embedding array<double>",
    )
    plan = _plan(semantic_dedup(vecs, n_cells=2, threshold=0.9))
    assert plan.count("ArrowEvalPython") <= 1, (
        "the Arrow assignment stage is cloned into both prune-join "
        "sides -- the lazy localCheckpoint no longer truncates it"
    )


def test_q15_q2_fact_aggregate_computed_once(spark):
    # q15's revenue view feeds BOTH the max scalar and the equality
    # probe; q2's costs view feeds BOTH the per-part min and the
    # join-back.  Without their lazy localCheckpoints Catalyst clones
    # the whole fact aggregation into each consumer -- the registry
    # plans scanned lineitem twice per query (PLANS.md census).
    # Checkpointed, the declared plan holds no fact FileScan at all
    # (the one scan runs in the checkpoint-materialization job).
    from nyc_crash_mapper_etl_script_spark.harness import _REGISTRY

    sf_dir = "/root/testdata/sf0.001"
    for name in ("q15_top_supplier", "q2_min_cost_supplier"):
        fn, _sql = _REGISTRY[name]
        plan = _plan(fn(spark, sf_dir))
        n = plan.count("lineitem.parquet")
        assert n <= 1, (
            f"{name}: lineitem scanned {n}x -- the shared aggregate "
            "view's lazy localCheckpoint no longer truncates its "
            "consumers"
        )
