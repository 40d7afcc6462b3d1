"""Model-scored quality gating (r4 VERDICT item 4): score documents
with a CALLER-SUPPLIED linear/logistic model over the engine's text
quality features, and gate the corpus on the score.

Real pipelines gate with a learned classifier (fastText-style quality
models scoring C4/CC dumps), not hand-tuned heuristics.  The engine
side of that is (a) a FEATURE VECTOR computed as pure Column
expressions over the scan -- zero Python, whole-stage codegen -- and
(b) an inference hook.  Two backends, same pattern as the tokenizer
and multimodal codec hooks:

- ``scorer=None`` (default): the model IS linear/logistic, so
  inference stays a Column expression -- ``sigmoid(w . x + b)``
  folded into codegen, no Python anywhere.  This covers every model
  exportable as coefficients (logistic regression, linear SVM, a
  distilled final layer) and is the REGISTRY-PINNED backend: the
  identical arithmetic replays in DuckDB, so the oracle twin is
  exact (the gate compares in LOGIT space -- monotone in the
  probability -- and the emitted score is rounded on a fixed grid,
  keeping the float comparison on representable values).
- ``scorer=callable``: batched Arrow inference for models that are
  NOT a dot product (a tree ensemble, an ONNX runtime, a tiny MLP):
  one ``mapInPandas`` stage receives the feature frame in Arrow
  batches and appends the score column.  The container ships no ML
  runtime, so tests drive this path with a deterministic numpy fake
  -- the plumbing (schema, batch shape, column order) is real.

At 100 TB: features + linear score are a projection over the parquet
scan (no shuffle, no Python); the Arrow path adds one narrow
vectorized stage.  Gating is a pushable filter on the computed
column.

The reference has no model-gating analog (north-star extension);
the heuristic cousin is ``functions.text.quality_score``.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.functions.text import (
    punct_ratio,
    stopword_ratio,
    whitespace_token_count,
)

#: the standard feature vector, in weight order.  Each is a pure
#: Column expression over ``text``; all bounded [0, ~1] except ntok.
FEATURES = ("len_norm", "punct", "stop", "ntok_norm")


def quality_features(text: Column) -> dict[str, Column]:
    """The engine's quality features as named Column expressions:
    ``len_norm`` = chars/20000 capped at 1, ``punct`` = punctuation
    ratio, ``stop`` = stopword ratio, ``ntok_norm`` = whitespace
    tokens/5000 capped at 1.  Normalized so one weight vector
    transfers across scales."""
    n = F.length(F.coalesce(text, F.lit("")))
    return {
        "len_norm": F.least(F.lit(1.0), n / F.lit(20000.0)),
        "punct": punct_ratio(text),
        "stop": stopword_ratio(text),
        "ntok_norm": F.least(
            F.lit(1.0), whitespace_token_count(text) / F.lit(5000.0)
        ),
    }


def score_quality(
    df: DataFrame,
    text_col: str = "text",
    weights: Sequence[float] = (2.0, -3.0, 4.0, 1.0),
    bias: float = -0.5,
    score_col: str = "q_logit",
    prob_col: Optional[str] = None,
    scorer: Optional[Callable] = None,
) -> DataFrame:
    """Append the model score to ``df``.

    Column backend (``scorer=None``): ``score_col`` = the LOGIT
    ``w . features + b`` computed left-to-right (fixed association so
    an oracle replays it bit-for-bit), rounded to the 1e-6 grid;
    ``prob_col`` (optional) = the sigmoid of the unrounded logit.

    Arrow backend: ``scorer(features_pdf) -> 1-D float array`` is
    applied per Arrow batch via ``mapInPandas``; the feature frame
    has exactly the FEATURES columns in order."""
    feats = quality_features(F.col(text_col))
    if scorer is None:
        if len(weights) != len(FEATURES):
            raise ValueError(
                f"weights must have {len(FEATURES)} entries {FEATURES}"
            )
        logit = F.lit(float(bias))
        for w, name in zip(weights, FEATURES):
            logit = logit + F.lit(float(w)) * feats[name]
        out = df.withColumn(
            score_col, F.round(logit, 6)
        )
        if prob_col:
            out = out.withColumn(
                prob_col, F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6)
            )
        return out

    import pandas as pd  # noqa: F401

    from pyspark.sql.types import DoubleType, StructField, StructType

    with_feats = df.select(
        "*", *[feats[name].alias(f"__f_{name}") for name in FEATURES]
    )
    schema = StructType(
        [f for f in df.schema.fields]
        + [StructField(score_col, DoubleType(), True)]
    )
    fcols = [f"__f_{name}" for name in FEATURES]
    keep = [f.name for f in df.schema.fields]

    def infer(batches):
        for pdf in batches:
            scores = scorer(
                pdf[fcols].rename(
                    columns=dict(zip(fcols, FEATURES))
                )
            )
            out = pdf[keep].copy()
            out[score_col] = scores
            yield out

    return with_feats.mapInPandas(infer, schema)


def gate_quality(
    df: DataFrame,
    text_col: str = "text",
    threshold_logit: float = 0.0,
    weights: Sequence[float] = (2.0, -3.0, 4.0, 1.0),
    bias: float = -0.5,
    scorer: Optional[Callable] = None,
    score_col: str = "q_logit",
) -> DataFrame:
    """Rows whose model score clears the gate (``sigmoid`` monotone:
    a probability threshold p is the logit threshold ``ln(p/(1-p))``,
    so the gate compares in logit space and stays exact).  The filter
    sits directly on the computed column -- one scan, no shuffle."""
    scored = score_quality(
        df, text_col, weights, bias, score_col=score_col, scorer=scorer
    )
    return scored.where(F.col(score_col) >= threshold_logit)
