"""Stateful streaming CDC (reference §2.9 C1 as a stream).

The reference's walkmapper sync recomputes a fingerprint per row on
every nightly run and diffs it against the warehouse copy
(walkmapper/mysql2carto.py:103-110, 203-248).  Streamed, that diff is
per-key state: remember the last-seen fingerprint for each key and
classify every arriving row as insert (key never seen), update
(fingerprint changed), or skip (identical) — no warehouse re-scan per
micro-batch.

``applyInPandasWithState`` gives exactly that: grouped Arrow batches
plus a per-key state cell, checkpointed with the query.  State is one
fingerprint string per key — at 10^9 keys that is a few tens of GB
spread across executors, the supported regime for state stores
(RocksDB-backed in production; configure
``spark.sql.streaming.stateStore.providerClass``).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from nyc_crash_mapper_etl_script_spark.functions.fingerprint import row_fingerprint

CDC_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("cdc_class", T.StringType()),
        T.StructField("fingerprint", T.StringType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("fingerprint", T.StringType())])


def _classify_group(
    key: tuple[Any, ...],
    batches: Iterator["pd.DataFrame"],  # noqa: F821
    state: GroupState,
) -> Iterator["pd.DataFrame"]:
    import pandas as pd

    prev = state.get[0] if state.exists else None
    # last row of the micro-batch wins for the stored fingerprint
    # (matches the batch classifier, which sees one row per key)
    cls, fp = None, prev
    for pdf in batches:
        for f in pdf["__fp"]:
            if fp is None:
                cls = "insert" if cls is None else cls
                fp = f
            elif f != fp:
                cls = "update" if cls != "insert" else cls
                fp = f
            elif cls is None:
                cls = "skip"
    state.update((fp,))
    yield pd.DataFrame({"key": [key[0]], "cdc_class": [cls], "fingerprint": [fp]})


def stateful_cdc_classify(
    stream: DataFrame, key_col: str, summary_cols: list[str]
) -> DataFrame:
    """Classify each streamed key as insert/update/skip against the
    fingerprint remembered in per-key state.  Works on a streaming
    DataFrame; compose with ``writeStream.foreachBatch``/sinks."""
    keyed = stream.select(
        F.col(key_col).cast("long").alias("key"),
        row_fingerprint(*[F.col(c) for c in summary_cols]).alias("__fp"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _classify_group,
        outputStructType=CDC_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
