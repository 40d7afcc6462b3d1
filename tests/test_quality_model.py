"""Model-scored quality gating (operators/quality_model.py): Column
vs Arrow backends agree, the fast path stays JVM-side, the gate is a
logit-space threshold."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.operators.quality_model import (
    FEATURES,
    gate_quality,
    score_quality,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox and the lazy dog is of to note"),
            (2, "!!! ??? ### $$$ %%%"),
            (3, "plain words without common stopwords here"),
            (4, ""),
            (5, None),
        ],
        "doc_id long, text string",
    )


def test_column_and_arrow_backends_agree(spark):
    # local def: cloudpickle ships it by value to executors
    def _linear(feats):
        import numpy as np

        z = (
            -0.5
            + 2.0 * feats["len_norm"]
            + -3.0 * feats["punct"]
            + 4.0 * feats["stop"]
            + 1.0 * feats["ntok_norm"]
        )
        return np.round(z.to_numpy(), 6)

    d = _docs(spark)
    col = {
        r["doc_id"]: r["q_logit"]
        for r in score_quality(d).select("doc_id", "q_logit").collect()
    }
    arrow = {
        r["doc_id"]: r["q_logit"]
        for r in score_quality(d, scorer=_linear)
        .select("doc_id", "q_logit")
        .collect()
    }
    assert col.keys() == arrow.keys()
    for k in col:
        assert col[k] == pytest.approx(arrow[k], abs=1e-9)


def test_column_backend_is_pure_codegen(spark):
    scored = score_quality(_docs(spark), prob_col="p")
    plan = scored._jdf.queryExecution().executedPlan().toString()
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan
    # and the probability is the sigmoid of the logit
    for r in scored.collect():
        z = r["q_logit"]
        assert r["p"] == pytest.approx(1.0 / (1.0 + math.exp(-z)), abs=1e-5)


def test_gate_is_logit_threshold(spark):
    d = _docs(spark)
    scored = {r["doc_id"]: r["q_logit"] for r in score_quality(d).collect()}
    thr = sorted(scored.values())[2]
    kept = {r["doc_id"] for r in gate_quality(d, threshold_logit=thr).collect()}
    assert kept == {k for k, v in scored.items() if v >= thr}
    assert 0 < len(kept) < 5  # a real split (ties at thr may keep >3)
    # p-threshold equivalence: ln(p/(1-p)) gates identically
    p = 1.0 / (1.0 + math.exp(-thr))
    assert math.log(p / (1 - p)) == pytest.approx(thr, abs=1e-9)


def test_arrow_scorer_sees_ordered_feature_frame(spark):
    # the probe runs on executors: encode the column-order check into
    # the returned score instead of mutating driver state
    def probe(feats):
        ok = list(feats.columns) == list(FEATURES)
        return feats["len_norm"].to_numpy() * 0.0 + (1.0 if ok else -1.0)

    got = score_quality(_docs(spark), scorer=probe).collect()
    assert got and all(r["q_logit"] == 1.0 for r in got)


def test_weight_vector_validation(spark):
    with pytest.raises(ValueError, match="weights"):
        score_quality(_docs(spark), weights=(1.0, 2.0))
