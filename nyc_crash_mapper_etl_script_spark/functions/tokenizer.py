"""Injectable tokenizer hook (r4 VERDICT item 3): REAL token counts
when a tokenizer backend is available, the deterministic regex stub
otherwise -- the same pattern as the multimodal codecs (real Pillow
path when installed, deterministic fake otherwise,
operators/multimodal.py).

Why it matters: in a training-data pipeline the TOKEN budget -- not
the char count -- drives sequence packing (``operators.packing
.pack_greedy``'s ``budget``) and mixture weighting.  The engine-side
plumbing is identical for every backend: an Arrow-batched pandas UDF
mapping a text column to an int count, so the hot path is vectorized
batch tokenization, never row-at-a-time Python.

Backends, in ``resolve_tokenizer`` order:

- a caller-supplied callable ``list[str] -> list[int]`` (bring your
  own tokenizer: a tiktoken ``Encoding``, a HuggingFace
  ``tokenizers.Tokenizer``, anything picklable or importable from
  workers);
- ``tiktoken`` auto-discovery when the package (and its vocab cache)
  is present -- loaded lazily INSIDE the UDF so only the encoding
  name crosses to executors, never the encoder object;
- the ``bpe_ish_token_count`` regex stub (``functions/text.py``) --
  pure Column expression, whole-stage codegen, zero Python.  The
  REGISTRY rows pin this backend: it is deterministic and
  DuckDB-replayable, which is what keeps the oracle twins exact.

The reference has no tokenizer analog (its text surface is SQL
string functions); this is a north-star extension.
"""

from __future__ import annotations

from typing import Callable, Optional

import pandas as pd

from pyspark.sql import Column

TokenizerFn = Callable[[list], list]

#: resolution outcome marker for tests/telemetry
STUB = "stub"
TIKTOKEN = "tiktoken"
INJECTED = "injected"


def tiktoken_available(encoding: str = "gpt2") -> bool:
    """True when tiktoken can actually LOAD the encoding (the package
    fetches vocab files on first use; an installed-but-offline
    environment must fall back to the stub, not die in an executor)."""
    try:
        import tiktoken

        tiktoken.get_encoding(encoding)
        return True
    except Exception:  # noqa: BLE001 -- any failure means unavailable
        return False


def resolve_tokenizer(
    tokenizer: Optional[TokenizerFn] = None,
    backend: str = "auto",
    encoding: str = "gpt2",
) -> tuple[str, Optional[TokenizerFn]]:
    """Pick the token-count backend.  Returns ``(kind, fn)`` where
    ``kind`` is INJECTED / TIKTOKEN / STUB and ``fn`` is the batch
    counter for the python-backed kinds (None for STUB).

    ``backend``: 'auto' (injected > tiktoken > stub), 'stub' (always
    the regex -- what the registry rows pin), 'real' (injected or
    tiktoken, raise if neither resolves)."""
    if backend not in ("auto", "stub", "real"):
        raise ValueError(f"unknown tokenizer backend {backend!r}")
    if backend == "stub":
        return STUB, None
    if tokenizer is not None:
        return INJECTED, tokenizer
    if tiktoken_available(encoding):
        enc_name = encoding  # only the NAME is captured/pickled

        def count(texts: list) -> list:
            import tiktoken

            enc = tiktoken.get_encoding(enc_name)
            return [len(t) for t in enc.encode_ordinary_batch(texts)]

        return TIKTOKEN, count
    if backend == "real":
        raise NotImplementedError(
            "backend='real' requires an injected tokenizer callable or "
            "an importable tiktoken with its vocab cache; neither is "
            "available (pass tokenizer=..., or use backend='auto' to "
            "fall back to the regex stub)"
        )
    return STUB, None


def token_count(
    text: Column,
    tokenizer: Optional[TokenizerFn] = None,
    backend: str = "auto",
    encoding: str = "gpt2",
) -> Column:
    """Token count of ``text`` under the resolved backend.

    Stub: a pure Column expression (codegen, no Python).  Python
    backends: one Arrow-batched pandas UDF -- NULL text counts 0,
    matching the stub."""
    kind, fn = resolve_tokenizer(tokenizer, backend, encoding)
    if kind == STUB:
        from nyc_crash_mapper_etl_script_spark.functions.text import (
            bpe_ish_token_count,
        )

        return bpe_ish_token_count(text)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _count(s: pd.Series) -> pd.Series:
        return pd.Series(
            fn(s.fillna("").tolist()), index=s.index, dtype="int32"
        )

    return _count(text)


def with_token_budget(
    df,
    text_col: str,
    out_col: str = "tokens",
    tokenizer: Optional[TokenizerFn] = None,
    backend: str = "auto",
    encoding: str = "gpt2",
):
    """``df`` plus an ``out_col`` token count -- the packing-budget
    hook: feed the result to ``pack_greedy(..., size_col=out_col,
    budget=<tokens>)`` so packs fill to a TOKEN budget instead of a
    char proxy."""
    from pyspark.sql import functions as F

    return df.withColumn(
        out_col, token_count(F.col(text_col), tokenizer, backend, encoding)
    )
