"""Gap-based session windows over a stream (applyInPandasWithState).

The streaming twin of ``operators.sessionize.sessionize_batch``: the
same session boundaries (a gap strictly greater than ``gap_seconds``
closes the session), computed incrementally with one open-session
record of state per key.

Emission contract (append mode):

 - a session is emitted the moment it CLOSES -- either a later event
   of the same key arrives past the gap (closed within a batch or
   across batches via state), or the event-time watermark passes
   ``last_event + gap`` (event-time timeout), which is how the final
   open session of an idle key drains without ever seeing another
   event;
 - the still-open session is held in state, never emitted early, so
   downstream sees each session exactly once.

State per key is four scalars (start/last in integer microseconds,
count, value sum) -- at 10^8 concurrent keys that is a few GB spread
across executors, the supported state-store regime (RocksDB provider
in production).  Event-time timeouts ride the same watermark the
windowed rollups use; there is no processing-time coupling, so replay
from a checkpoint is deterministic.

Reference parity: the reference has no streaming; this is part of the
training-pipeline extension surface (SURVEY §6), and its batch twin is
the oracle-checked ``sessionize_events`` registry entry.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

# open session: [start_us, last_us, n, total]
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def _make_fold(gap_us: int):
    def _fold(
        key: tuple[Any, ...],
        batches: Iterator["pd.DataFrame"],  # noqa: F821
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        def session_row(start_us: int, last_us: int, n: int, total: float):
            return {
                "key": key[0],
                "session_start": pd.Timestamp(start_us, unit="us"),
                "session_end": pd.Timestamp(last_us, unit="us"),
                "n_events": n,
                "total_value": round(total, 2),
            }

        closed = []
        if state.hasTimedOut:
            # watermark passed last_event + gap: drain the open session
            start_us, last_us, n, total = state.get
            closed.append(session_row(start_us, last_us, n, total))
            state.remove()
            if closed:
                yield pd.DataFrame(closed)
            return

        open_s = list(state.get) if state.exists else None
        events: list[tuple[int, float]] = []
        for pdf in batches:
            us = pdf["__ts"].astype("int64") // 1000
            vals = pdf["__val"].astype("float64")
            events.extend(zip(us.tolist(), vals.tolist()))
        events.sort()
        for ts_us, val in events:
            if open_s is None:
                open_s = [ts_us, ts_us, 1, val]
            elif ts_us - open_s[1] > gap_us:
                closed.append(session_row(*open_s))
                open_s = [ts_us, ts_us, 1, val]
            else:
                open_s[1] = max(open_s[1], ts_us)
                open_s[2] += 1
                open_s[3] += val
        if open_s is not None:
            state.update(tuple(open_s))
            # drain when the watermark passes last_event + gap
            state.setTimeoutTimestamp((open_s[1] + gap_us) // 1000 + 1)
        if closed:
            yield pd.DataFrame(closed)

    return _fold


def sessionize_stream(
    stream: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    value_col: str | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Sessionize a streaming DataFrame; returns the closed-session
    stream (append mode).  ``stream`` must carry an event-time column;
    the watermark is applied here so the event-time timeouts and
    late-event dropping share one policy."""
    value = F.col(value_col) if value_col else F.lit(0.0)
    keyed = stream.withWatermark(ts_col, watermark_delay).select(
        F.col(key_col).cast("long").alias("key"),
        F.col(ts_col).alias("__ts"),
        value.cast("double").alias("__val"),
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _make_fold(int(gap_seconds) * 1_000_000),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
