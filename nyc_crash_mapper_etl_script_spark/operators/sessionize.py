"""Gap-based sessionization (batch).

Groups a keyed event stream into sessions: consecutive events of the
same key belong to one session while the gap between them is <= the
threshold; a longer silence starts a new session.  This is the batch
twin of ``streaming.sessions.sessionize_stream`` -- identical session
boundaries, so a backfill over historical parquet and the live stream
agree row for row (the reference's nightly-rerun = streaming-catchup
equivalence, SURVEY §2.9 C5/C6, applied to sessions).

Plan shape: one shuffle on the key for the ordering window (lag +
running sum), then a hash aggregate on (key, session_id).  The
aggregate keys are a refinement of the window partitioning, so the
second exchange is hash(key, session_id) over already-key-clustered
data -- skew-free as long as no single key holds a meaningful share
of all events (at 100 TB the hot-key guard is ``operators.skew``).
Gap comparison is a direct timestamp-vs-interval test
(``ts > lag + INTERVAL gap``) -- exact at microsecond resolution,
ANSI-replayable in DuckDB, and type-agnostic: it works identically
for TIMESTAMP and TIMESTAMP_NTZ columns (parquet writers disagree on
which they produce), where an epoch-micros conversion would either
fail to resolve on NTZ or shift across DST in a non-UTC session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize_batch"]


def sessionize_batch(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_col: str | None = None,
    value_col: str | None = None,
) -> DataFrame:
    """One row per (key, session): start/end timestamps, event count,
    and (optionally) the round-2 sum of ``value_col``.

    ``session_id`` is the per-key ordinal (1-based, by session start):
    a running sum over the session-open flag, where a session opens on
    the key's first event or when the gap from the previous event
    exceeds ``gap_seconds`` (strictly greater -- an exactly-gap-sized
    silence stays in-session, matching the streaming fold)."""
    base = df.select(
        F.col(key_col),
        F.col(ts_col).alias("__ts"),
        *([F.col(tiebreak_col).alias("__tb")] if tiebreak_col else []),
        *([F.col(value_col).alias("__val")] if value_col else []),
    )
    order = [F.col("__ts").asc()]
    if tiebreak_col:
        order.append(F.col("__tb").asc())
    w = Window.partitionBy(key_col).orderBy(*order)
    lag_ts = F.lag(F.col("__ts")).over(w)
    gap_iv = F.make_dt_interval(secs=F.lit(int(gap_seconds)))
    opens = (
        F.when(
            lag_ts.isNull() | (F.col("__ts") > lag_ts + gap_iv),
            1,
        )
        .otherwise(0)
        .cast("long")
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = base.withColumn("__open", opens).withColumn(
        "session_id", F.sum("__open").over(run)
    )
    aggs = [
        F.min("__ts").alias("session_start"),
        F.max("__ts").alias("session_end"),
        F.count("*").alias("n_events"),
    ]
    if value_col:
        aggs.append(F.round(F.sum("__val"), 2).alias("total_value"))
    return sessions.groupBy(key_col, "session_id").agg(*aggs)
