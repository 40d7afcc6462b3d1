"""Unit tests for round-5 training-pipeline operators: BM25 ranking,
bigram stupid-backoff LM scoring, domain-mixture token budgeting,
and chunking with overlap — each pinned against a hand-computed
expectation on a tiny frame (the registry rows cross-check the same
code against DuckDB at sf0.01)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- BM25


def test_bm25_matches_hand_formula(spark):
    from nyc_crash_mapper_etl_script_spark.operators.ranking import bm25_rank

    corpus = {
        1: "spark shuffle join join",
        2: "join",
        3: "scan filter prune",
        4: "",
    }
    df = _docs(spark, list(corpus.items()))
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_rank(df, ["join", "scan"], n=10).collect()
    }

    toks = {d: t.split() for d, t in corpus.items()}
    n_docs = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    dfreq = {
        q: sum(1 for t in toks.values() if q in t) for q in ("join", "scan")
    }
    k1, b = 1.2, 0.75
    for d in (1, 2, 3):
        exp = 0.0
        for q in ("join", "scan"):
            tf = toks[d].count(q)
            if tf == 0:
                continue
            idf = math.log(
                (n_docs - dfreq[q] + 0.5) / (dfreq[q] + 0.5) + 1.0
            )
            exp += (
                idf
                * tf
                * (k1 + 1)
                / (tf + k1 * (1 - b + b * len(toks[d]) / avgdl))
            )
        assert got[d] == pytest.approx(round(exp, 6), abs=1e-6), d
    assert 4 not in got  # no query terms -> no score row


def test_bm25_topk_boundary_is_deterministic(spark):
    from nyc_crash_mapper_etl_script_spark.operators.ranking import bm25_rank

    # ten identical docs: identical scores, so the top-3 must be the
    # three lowest ids (tie-break), on every run
    df = _docs(spark, [(i, "alpha beta") for i in range(10)])
    ids = sorted(r["doc_id"] for r in bm25_rank(df, ["alpha"], n=3).collect())
    assert ids == [0, 1, 2]


# ------------------------------------------------- stupid-backoff LM


def test_lm_stupid_backoff_hand_computed(spark):
    from nyc_crash_mapper_etl_script_spark.operators.lm import (
        lm_stupid_backoff_nll,
    )

    rows = [
        (1, "a b a b", "ref"),      # ref: unigrams a:2 b:2; bigrams ab:2 ba:1
        (2, "a b c", "other"),      # scored only
        (3, "x", "other"),          # single token: no bigrams -> omitted
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, grp string")
    out = {
        r["doc_id"]: (r["n_bigrams"], r["nll"])
        for r in lm_stupid_backoff_nll(
            df, F.col("grp") == "ref", alpha=0.4
        ).collect()
    }
    T, V = 4, 2  # ref totals: 4 tokens, vocab {a, b}
    # doc 1: (a,b) seen 2/2=1.0 twice? positions: (a,b),(b,a),(a,b)
    p_ab = 2 / 2
    p_ba = 1 / 2
    nll1 = -(math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3
    assert out[1][0] == 3
    assert out[1][1] == pytest.approx(round(nll1, 6), abs=1e-6)
    # doc 2: (a,b) seen -> 1.0; (b,c) unseen -> backoff with n1(c)=0
    p_bc = 0.4 * (0 + 1.0) / (T + V)
    nll2 = -(math.log(p_ab) + math.log(p_bc)) / 2
    assert out[2][0] == 2
    assert out[2][1] == pytest.approx(round(nll2, 6), abs=1e-6)
    assert 3 not in out


def test_lm_unseen_prev_token_uses_backoff(spark):
    from nyc_crash_mapper_etl_script_spark.operators.lm import (
        lm_stupid_backoff_nll,
    )

    rows = [(1, "a b", "ref"), (2, "z a", "other")]
    df = spark.createDataFrame(rows, "doc_id long, text string, grp string")
    out = {
        r["doc_id"]: r["nll"]
        for r in lm_stupid_backoff_nll(
            df, F.col("grp") == "ref", alpha=0.4
        ).collect()
    }
    # (z, a): bigram unseen (z not in ref) -> backoff on n1(a)=1, T=2 V=2
    exp = -math.log(0.4 * (1 + 1.0) / (2 + 2))
    assert out[2] == pytest.approx(round(exp, 6), abs=1e-6)


# -------------------------------------------- mixture token budgeting


def _frac(key, salt=""):
    h = hashlib.md5((salt + str(key)).encode()).hexdigest()
    return int(h[:8], 16) / 2**32


def test_mixture_token_budget_hand_computed(spark):
    from nyc_crash_mapper_etl_script_spark.operators.sampling import (
        mixture_token_budget,
    )

    rows = [(i, "d1" if i % 2 == 0 else "d2", 10) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    weights = {"d1": 3.0, "d2": 1.0}
    budget = 80  # quotas: d1 = 60 (6 docs of 10), d2 = 20 (2 docs)
    got = mixture_token_budget(
        df, weights, budget, domain_col="source", size_col="n_tokens"
    ).collect()

    by_dom: dict[str, list[int]] = {"d1": [], "d2": []}
    for i, dom, _ in rows:
        by_dom[dom].append(i)
    expect = set()
    for dom, quota_docs in (("d1", 6), ("d2", 2)):
        order = sorted(by_dom[dom], key=lambda i: (_frac(i), i))
        expect |= set(order[:quota_docs])
    assert {r["doc_id"] for r in got} == expect
    # cumulative totals never exceed the quota
    for r in got:
        quota = 60 if r["source"] == "d1" else 20
        assert r["cum_tokens"] <= quota


def test_mixture_excludes_unweighted_domains(spark):
    from nyc_crash_mapper_etl_script_spark.operators.sampling import (
        mixture_token_budget,
    )

    rows = [(1, "keep", 5), (2, "drop", 5)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    got = mixture_token_budget(df, {"keep": 1.0}, 100).collect()
    assert [r["doc_id"] for r in got] == [1]


def test_mixture_oversized_first_doc_blocks_domain(spark):
    from nyc_crash_mapper_etl_script_spark.operators.sampling import (
        mixture_token_budget,
    )

    # first-in-hash-order doc exceeds the quota alone: running total
    # is inclusive, so NOTHING from the domain is selected (greedy
    # prefix, not knapsack -- deterministic and engine-replayable)
    rows = [(1, "d", 1000), (2, "d", 1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    assert mixture_token_budget(df, {"d": 1.0}, 500).count() == 0


# ----------------------------------------------------- chunk_overlap


def test_chunk_overlap_exact_chunks(spark):
    from nyc_crash_mapper_etl_script_spark.operators.chunking import (
        chunk_overlap,
    )

    text = "abcdefghij"  # len 10
    df = _docs(spark, [(1, text), (2, ""), (3, None)])
    got = sorted(
        (r["chunk_id"], r["chunk_start"], r["chunk"])
        for r in chunk_overlap(df, width=4, stride=3).collect()
    )
    # starts 0,3,6,9 -> abcd, defg, ghij, j
    assert got == [
        (0, 0, "abcd"),
        (1, 3, "defg"),
        (2, 6, "ghij"),
        (3, 9, "j"),
    ]


def test_chunk_overlap_reconstructs_document(spark):
    from nyc_crash_mapper_etl_script_spark.operators.chunking import (
        chunk_overlap,
    )

    text = "the quick brown fox jumps over the lazy dog" * 3
    df = _docs(spark, [(7, text)])
    rows = sorted(
        (r["chunk_start"], r["chunk"])
        for r in chunk_overlap(df, width=16, stride=16).collect()
    )
    assert "".join(c for _, c in rows) == text  # stride == width: exact cover

    rows = sorted(
        (r["chunk_start"], r["chunk"])
        for r in chunk_overlap(df, width=16, stride=8).collect()
    )
    for start, chunk in rows:  # every chunk is a faithful slice
        assert text[start : start + 16] == chunk


def test_chunk_overlap_rejects_bad_params(spark):
    from nyc_crash_mapper_etl_script_spark.operators.chunking import (
        chunk_overlap,
    )

    df = _docs(spark, [(1, "abc")])
    with pytest.raises(ValueError):
        chunk_overlap(df, width=0, stride=3)
    with pytest.raises(ValueError):
        chunk_overlap(df, width=4, stride=0)


# ------------------------------------------- tf-idf cosine near-dup


def test_tfidf_cosine_hand_computed(spark):
    """Two docs sharing their full shingle set score cosine 1.0; an
    unrelated doc pairs with nothing at a 0.5 threshold; k=2 keeps
    the hand arithmetic small."""
    from nyc_crash_mapper_etl_script_spark.operators.dedup_text import (
        tfidf_cosine_pairs,
    )

    rows = [
        (1, "a b c"),   # shingles(k=2): "a b", "b c"
        (2, "a b c"),   # identical -> cosine 1.0 with 1
        (3, "x y z"),   # disjoint
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in tfidf_cosine_pairs(df, k=2, threshold=0.5).collect()
    }
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] == pytest.approx(1.0, abs=1e-6)


def test_tfidf_cosine_cap_preserves_values(spark):
    """The posting cap restricts candidates only: every surviving
    pair's cosine equals the uncapped value exactly (the full-vector
    verify), and the capped pair set is a subset."""
    from nyc_crash_mapper_etl_script_spark.operators.dedup_text import (
        tfidf_cosine_pairs,
    )

    rows = [
        (i, f"common common2 rare{i % 3} tail{i % 3} end{i % 3}")
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    un = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in tfidf_cosine_pairs(df, k=2, threshold=0.3).collect()
    }
    cap = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in tfidf_cosine_pairs(
            df, k=2, threshold=0.3, max_posting=5
        ).collect()
    }
    assert set(cap) <= set(un)
    for pair, c in cap.items():
        assert c == un[pair], pair
    # the planted same-suffix groups survive the cap (rare shingles)
    assert (0, 3) in cap


# ------------------------------------------------------ DSIR selection


def test_dsir_ranks_target_like_docs_first(spark):
    """Docs matching the target slice's bigram distribution get
    higher importance than corpus-typical docs; importance equals
    the hand-joined difference of the two NLL passes."""
    from nyc_crash_mapper_etl_script_spark.operators.lm import (
        dsir_select,
        lm_stupid_backoff_nll,
    )

    rows = [
        (1, "a b a b", "tgt"),
        (2, "a b a b a b", "tgt"),
        (3, "x y x y", "other"),
        (4, "a b x y", "other"),
        (5, "a b a b", "other"),   # looks like target -> high importance
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, grp string")
    out = dsir_select(df, F.col("grp") == "tgt", k=5).collect()
    imp = {r["doc_id"]: r["importance"] for r in out}
    # target-like docs outrank the off-distribution one
    assert imp[5] > imp[3]
    assert imp[1] > imp[3]
    # cross-check against the two scorer passes joined by hand
    t = {r["doc_id"]: r["nll"] for r in
         lm_stupid_backoff_nll(df, F.col("grp") == "tgt").collect()}
    b = {r["doc_id"]: r["nll"] for r in
         lm_stupid_backoff_nll(df, F.lit(True)).collect()}
    for d, i in imp.items():
        assert i == pytest.approx(round(b[d] - t[d], 6), abs=1e-6), d
