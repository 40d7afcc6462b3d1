"""Injectable tokenizer hook (functions/tokenizer.py): backend
resolution (injected > tiktoken > stub), stub == the registry-pinned
regex count, token-budget packing via size_col='tokens'."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.functions.tokenizer import (
    INJECTED,
    STUB,
    resolve_tokenizer,
    tiktoken_available,
    token_count,
    with_token_budget,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "hello, world! 42 times."),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )


def test_backend_resolution_order():
    fake = lambda texts: [len(t.split()) for t in texts]  # noqa: E731
    assert resolve_tokenizer(fake, "auto")[0] == INJECTED
    assert resolve_tokenizer(None, "stub")[0] == STUB
    assert resolve_tokenizer(fake, "stub")[0] == STUB  # stub pins stub
    if not tiktoken_available():
        assert resolve_tokenizer(None, "auto")[0] == STUB
        with pytest.raises(NotImplementedError, match="real"):
            resolve_tokenizer(None, "real")
    assert resolve_tokenizer(fake, "real")[0] == INJECTED
    with pytest.raises(ValueError, match="backend"):
        resolve_tokenizer(None, "bogus")


def test_stub_matches_registry_regex(spark):
    from nyc_crash_mapper_etl_script_spark.functions.text import (
        bpe_ish_token_count,
    )

    d = _docs(spark)
    got = d.select(
        "doc_id",
        token_count(F.col("text"), backend="stub").alias("a"),
        bpe_ish_token_count(F.col("text")).alias("b"),
    )
    assert all(r["a"] == r["b"] for r in got.collect())
    # and the stub stays JVM-side: no Python stage in the plan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_injected_backend_counts_and_nulls(spark):
    # a deterministic fake "real" tokenizer: whitespace words, the
    # Pillow pattern's stand-in for tiktoken in this container
    fake = lambda texts: [len(t.split()) for t in texts]  # noqa: E731
    got = {
        r["doc_id"]: r["tokens"]
        for r in with_token_budget(
            _docs(spark), "text", tokenizer=fake
        ).collect()
    }
    assert got == {1: 9, 2: 4, 3: 0, 4: 0}  # NULL counts 0, like stub


def test_token_budget_packing(spark):
    """pack_greedy over size_col='tokens' computed by the hook: packs
    fill to a TOKEN budget, oversized docs get singleton packs."""
    from nyc_crash_mapper_etl_script_spark.operators.packing import (
        pack_greedy,
    )

    fake = lambda texts: [len(t.split()) for t in texts]  # noqa: E731
    d = spark.createDataFrame(
        [
            ("s", 1, "a b c"),          # 3 tokens
            ("s", 2, "d e"),            # 2 -> pack 1 (5/6)
            ("s", 3, "f g h"),          # 3 -> overflow, pack 2
            ("s", 4, " ".join("x" * 9)),  # 9 > budget -> singleton
        ],
        "source string, doc_id long, text string",
    )
    sized = with_token_budget(d, "text", tokenizer=fake)
    packed = pack_greedy(
        sized, group_col="source", order_col="doc_id",
        size_col="tokens", budget=6,
    )
    got = {r["doc_id"]: r["pack_id"] for r in packed.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 3}
