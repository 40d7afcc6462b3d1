"""Round-5 tail operators: span-level substring dedup accounting,
Gopher rule battery, KMV sketch set operations."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.operators.dedup_text import (
    substring_span_stats,
)
from nyc_crash_mapper_etl_script_spark.operators.quality_rules import gopher_rules
from nyc_crash_mapper_etl_script_spark.operators.sketches import kmv_set_overlap


# ---------------------------------------------------------------- spans


def test_substring_spans_hand_built(spark):
    """Doc 2 copies a 12-char run from doc 1 at two places; with k=8
    the duplicated windows must merge into the right maximal spans
    and doc 1 (the first occurrence) must keep everything."""
    a = "abcdefghijklmnopqrstuvwxyz0123456789"  # 36 chars, unique
    # doc 2: 12-char run from a (positions 1..12), unique middle,
    # another copied run (positions 21..32)
    b = a[:12] + "ZZZZYYYYXXXXWWWW" + a[20:32]
    docs = spark.createDataFrame(
        [(1, a), (2, b)], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in substring_span_stats(docs, k=8).collect()
    }
    # doc 1: everything is a first occurrence
    assert out[1]["n_spans"] == 0
    assert out[1]["removed_chars"] == 0
    assert out[1]["kept_chars"] == 36
    # doc 2: two duplicated runs of 12 chars each -> 2 spans; every
    # k=8 window fully inside a copied run duplicates, and the merged
    # span covers exactly the copied chars
    assert out[2]["n_spans"] == 2
    assert out[2]["removed_chars"] == 24
    assert out[2]["kept_chars"] == len(b) - 24
    # each 12-char run holds 12-8+1 = 5 duplicate windows
    assert out[2]["n_dup_windows"] == 10


def test_substring_spans_within_doc_repeat(spark):
    """A repeat WITHIN one doc: only the later occurrence is marked."""
    seg = "0123456789ABCDEF"  # 16 chars
    t = seg + "qqqq" + seg
    docs = spark.createDataFrame([(7, t)], ["doc_id", "text"])
    row = substring_span_stats(docs, k=8).collect()[0]
    assert row["n_spans"] == 1
    assert row["removed_chars"] == 16
    assert row["kept_chars"] == len(t) - 16


def test_substring_spans_short_and_clean_docs(spark):
    docs = spark.createDataFrame(
        [(1, "short"), (2, "x" * 50), (3, None)], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in substring_span_stats(docs, k=40).collect()
    }
    assert out[1]["n_spans"] == 0 and out[1]["kept_chars"] == 5
    assert out[3]["n_chars"] == 0 and out[3]["kept_chars"] == 0
    # doc 2 is all-'x': its 11 windows are identical, the first kept,
    # the rest merge into one span covering chars 2..50
    assert out[2]["n_spans"] == 1
    assert out[2]["removed_chars"] == 49
    assert out[2]["kept_chars"] == 1


def test_substring_spans_single_pass_parity(spark):
    """The row_number single-pass plan and the skew-safe agg+probe
    plan produce identical accounting."""
    a = "abcdefghijklmnopqrstuvwxyz0123456789"
    b = a[:12] + "ZZZZYYYYXXXXWWWW" + a[20:32]
    seg = "0123456789ABCDEF"
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, seg + "qqqq" + seg), (4, "x" * 50), (5, None)],
        ["doc_id", "text"],
    )
    safe = sorted(
        map(tuple, substring_span_stats(docs, k=8).collect())
    )
    fast = sorted(
        map(tuple, substring_span_stats(docs, k=8, single_pass=True).collect())
    )
    assert safe == fast


# ---------------------------------------------------------------- gopher


def test_gopher_rules_hand_built(spark):
    good = " ".join(
        ["the", "be", "to", "of", "and"] + ["quality"] * 55
    )  # 60 words, stopwords present, mean len in range
    short = "the and one two"  # word count below 50
    symbols = " ".join(["##word"] * 60)  # symbol ratio 1.0, no stopwords
    bullets = "\n".join(["- item the be of and " + "x" * 3] * 4) + "\nthe be"
    docs = spark.createDataFrame(
        [(1, good), (2, short), (3, symbols), (4, bullets), (5, None)],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r.asDict() for r in gopher_rules(docs).collect()}
    assert out[1]["keep"] is True
    assert out[1]["n_words"] == 60
    assert out[1]["stopword_hits"] == 5
    assert out[2]["keep"] is False  # too short
    assert out[3]["keep"] is False
    assert out[3]["symbol_word_ratio"] == pytest.approx(2.0)
    # 4/5 lines start with a bullet -> ratio 0.8 passes the 0.9 rule,
    # but word count fails
    assert out[4]["bullet_line_ratio"] == pytest.approx(0.8)
    assert out[4]["keep"] is False
    assert out[5]["n_words"] == 0 and out[5]["keep"] is False


def test_gopher_mean_word_length_bounds(spark):
    ok = " ".join(["the", "be", "that", "have"] * 15)  # mean ~3
    screams = " ".join(["the", "be"] + ["supercalifragilistic"] * 58)
    docs = spark.createDataFrame(
        [(1, ok), (2, screams)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r.asDict() for r in gopher_rules(docs).collect()}
    assert out[1]["keep"] is True
    assert out[2]["mean_word_len"] > 10.0
    assert out[2]["keep"] is False


# ---------------------------------------------------------------- kmv ops


def test_kmv_overlap_exact_when_under_k(spark):
    """Domains smaller than k: the 'estimates' are exact."""
    a = spark.range(0, 100).select(F.col("id").alias("v"))
    b = spark.range(50, 150).select(F.col("id").alias("v"))
    row = kmv_set_overlap(a, b, "v", k=256).collect()[0]
    assert row["n_hashes"] == 150
    assert row["est_union"] == pytest.approx(150.0)
    assert row["est_jaccard"] == pytest.approx(50 / 150, abs=1e-4)
    assert row["est_intersection"] == pytest.approx(50.0, abs=0.1)


def test_kmv_overlap_estimates_above_k(spark):
    """Domains larger than k: estimates land within a loose KMV
    error envelope (k=256 -> ~6% std err)."""
    a = spark.range(0, 4000).select(F.col("id").alias("v"))
    b = spark.range(2000, 6000).select(F.col("id").alias("v"))
    row = kmv_set_overlap(a, b, "v", k=256).collect()[0]
    assert row["n_hashes"] == 256
    assert row["est_union"] == pytest.approx(6000, rel=0.25)
    assert row["est_jaccard"] == pytest.approx(2000 / 6000, abs=0.12)
    assert row["est_intersection"] == pytest.approx(2000, rel=0.45)


def test_kmv_overlap_disjoint_and_identical(spark):
    a = spark.range(0, 500).select(F.col("id").alias("v"))
    b = spark.range(500, 1000).select(F.col("id").alias("v"))
    row = kmv_set_overlap(a, b, "v", k=64).collect()[0]
    assert row["est_jaccard"] == 0.0
    assert row["est_intersection"] == 0.0
    row2 = kmv_set_overlap(a, a, "v", k=64).collect()[0]
    assert row2["est_jaccard"] == 1.0
    assert row2["est_union"] == row2["est_intersection"]


# ------------------------------------------------------- span property


def _span_reference(corpus: list[tuple[int, str]], k: int):
    """Brute-force python reference for substring_span_stats: mark
    every k-window instance whose text occurred at a smaller
    (doc_id, pos), merge intervals, account chars."""
    first: dict[str, tuple[int, int]] = {}
    for did, text in sorted(corpus):
        t = text or ""
        for p in range(len(t) - k + 1):
            w = t[p : p + k]
            if w not in first:
                first[w] = (did, p)
    out = {}
    for did, text in corpus:
        t = text or ""
        marks = []
        for p in range(len(t) - k + 1):
            if first[t[p : p + k]] != (did, p):
                marks.append(p)
        spans = []
        for p in marks:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + k)
            else:
                spans.append([p, p + k])
        removed = sum(e - s for s, e in spans)
        out[did] = (
            len(t),
            len(marks),
            len(spans),
            removed,
            len(t) - removed,
        )
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="abc", min_size=0, max_size=40),
        min_size=1,
        max_size=12,
    ),
    k=st.integers(min_value=2, max_value=6),
)
def test_substring_spans_match_python_reference(spark, texts, k):
    """Tiny alphabet + short windows force heavy duplication within
    and across docs; both engine paths must match the brute-force
    reference exactly."""
    corpus = list(enumerate(texts))
    ref = _span_reference(corpus, k)
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    for single_pass in (False, True):
        got = {
            r["doc_id"]: (
                r["n_chars"],
                r["n_dup_windows"],
                r["n_spans"],
                r["removed_chars"],
                r["kept_chars"],
            )
            for r in substring_span_stats(
                docs, k=k, single_pass=single_pass
            ).collect()
        }
        assert got == ref


# ----------------------------------------------------- canonical select


def test_select_canonical_keeps_best_quality(spark):
    from nyc_crash_mapper_etl_script_spark.operators.dedup_text import (
        select_canonical,
    )

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)],
        ["doc_id", "cluster"],
    )
    quality = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5), (5, 0.7), (6, 0.7)],
        ["doc_id", "q"],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in select_canonical(clusters, quality).collect()
    }
    # cluster 1: docs 2 and 3 tie at 0.9 -> lowest id (2) wins
    assert out[1]["canonical_id"] == 2 and out[1]["keep"] is False
    assert out[2]["keep"] is True
    assert out[3]["keep"] is False
    assert out[1]["cluster_size"] == 3
    # singleton keeps itself
    assert out[4]["keep"] is True and out[4]["cluster_size"] == 1
    # cluster 5: tie at 0.7 -> doc 5
    assert out[5]["keep"] is True and out[6]["keep"] is False
    # exactly one keeper per cluster
    keepers = [d for d, r in out.items() if r["keep"]]
    assert sorted(keepers) == [2, 4, 5]
