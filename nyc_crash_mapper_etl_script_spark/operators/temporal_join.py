"""Temporal joins: as-of (nearest prior match) and interval (time
range containment) -- the two join shapes Spark's built-in equi-join
machinery does not express directly.

As-of join (``asof_join``)
    For each probe row, attach the latest reference row with the same
    key whose timestamp is <= (or <, strict mode) the probe timestamp.
    The classic merge-join problem, solved Spark-first with the
    union-and-fill trick: tag both sides, union them, and run ONE
    window over (key) ordered by (ts, side, tiebreak) carrying
    ``last(ref_struct, ignoreNulls)``.  That is a single shuffle on
    the key -- the same cost as the equi-join Spark would do anyway --
    and the window scan is a linear pass per key partition; no range
    lookup, no per-probe binary search, no broadcast of either side.
    At 100 TB both sides shuffle once on the key and nothing is
    materialized beyond the window's running last-value (one struct).
    Reference columns travel inside a single struct so the filled
    values always come from ONE reference row (per-column fills could
    tear a row when a reference column is legitimately NULL).

Interval join (``interval_join``)
    Match point rows to interval rows with NO equi key: grid-bucket
    time into fixed cells, explode each interval onto the cells it
    covers (bounded because intervals are bounded), map each point to
    its single cell, equi-join on the cell, then apply the exact
    range predicate.  Each (interval, point) pair meets in exactly
    one cell -- the point's -- so the join needs no post-dedup.  The
    1-D analog of the spatial grid join (operators/spatial_join.py);
    the cell size is the operator's skew/fan-out knob.

Both are pinned against independent DuckDB formulations (correlated
LIMIT-1 subquery / plain theta join) rather than a replay of the same
trick, so the oracle genuinely cross-checks the algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    ref: DataFrame,
    key_col: str,
    probe_ts: str,
    ref_ts: str,
    ref_value_cols: list[str],
    probe_cols: list[str] | None = None,
    inclusive: bool = True,
    ref_tiebreak: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Attach to each probe row the latest preceding reference row.

    ``inclusive=True`` means a reference row AT the probe timestamp
    matches (DuckDB ``ASOF JOIN`` / pandas ``merge_asof`` default);
    strict mode only matches strictly earlier rows.  Ties among
    reference rows at one timestamp break on ``ref_tiebreak``
    descending (the largest wins), making the result deterministic.

    Output: probe_cols + key + probe ts + ``{prefix}ts`` +
    ``{prefix}<col>`` for each reference value column (NULL when no
    reference row precedes the probe).
    """
    probe_cols = probe_cols or [
        c for c in probe.columns if c not in (key_col, probe_ts)
    ]
    # Side tag orders same-timestamp rows: inclusive -> reference rows
    # sort BEFORE the probe (visible to it); strict -> after.
    ref_tag, probe_tag = (0, 1) if inclusive else (1, 0)

    ref_struct = F.struct(
        F.col(ref_ts).alias(f"{prefix}ts"),
        *[F.col(c).alias(f"{prefix}{c}") for c in ref_value_cols],
    )
    tb_ref = F.col(ref_tiebreak) if ref_tiebreak else F.lit(0)

    r = ref.select(
        F.col(key_col).alias("__k"),
        F.col(ref_ts).alias("__ts"),
        F.lit(ref_tag).alias("__tag"),
        tb_ref.cast("long").alias("__tb"),
        ref_struct.alias("__rv"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe_cols],
    )
    p = probe.select(
        F.col(key_col).alias("__k"),
        F.col(probe_ts).alias("__ts"),
        F.lit(probe_tag).alias("__tag"),
        F.lit(0).cast("long").alias("__tb"),
        F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
        *[F.col(c) for c in probe_cols],
    )

    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r.unionByName(p).withColumn(
        "__fill", F.last("__rv", ignorenulls=True).over(w)
    )
    out = filled.where(F.col("__tag") == probe_tag).select(
        F.col("__k").alias(key_col),
        F.col("__ts").alias(probe_ts),
        *[F.col(c) for c in probe_cols],
        F.col(f"__fill.{prefix}ts").alias(f"{prefix}ts"),
        *[
            F.col(f"__fill.{prefix}{c}").alias(f"{prefix}{c}")
            for c in ref_value_cols
        ],
    )
    return out


def asof_fill(
    timeline: DataFrame,
    key_col: str,
    ts_col: str,
    tag_col: str,
    ref_value_cols: list[str],
    ref_tag: int = 0,
    prefix: str = "asof_",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """As-of fill over a MATERIALIZED timeline: one table already
    holding reference rows (``tag_col == ref_tag``) and probe rows
    interleaved -- the storage-side half of :func:`asof_join`, whose
    union the write already paid for.  ``tiebreak_cols`` extend the
    window order so reference rows tied on (ts) resolve
    deterministically (the LAST in tiebreak order wins, i.e. the
    largest tiebreak -- matching ``asof_join``'s ref_tiebreak);
    include them at the tail of the table's sort_cols so the sorted
    scan still satisfies the full ordering.

    Each probe row comes back with ``{prefix}ts`` / ``{prefix}<col>``
    from the latest reference row at or before its timestamp (the
    same one-struct fill as ``asof_join``, so a reference column that
    is legitimately NULL can never tear across two reference rows).

    The 100 TB point of the materialized form: when ``timeline`` is a
    cluster-by TxTable read through ``read_clustered`` (bucketed on
    ``key_col``, sorted by ``(key_col, ts_col, tag_col)``), the
    window's required distribution AND ordering are satisfied by the
    scan itself -- the plan carries ZERO Exchange and ZERO Sort
    (pinned by tests/test_txtable_clustered.py), because the
    shuffle+sort were paid once at write time.  The runtime-union
    :func:`asof_join` can never get this: a union erases its
    children's partitioning claims no matter how the inputs are
    stored."""
    ref_struct = F.when(
        F.col(tag_col) == F.lit(ref_tag),
        F.struct(
            F.col(ts_col).alias(f"{prefix}ts"),
            *[F.col(c).alias(f"{prefix}{c}") for c in ref_value_cols],
        ),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(
            F.col(ts_col).asc(),
            F.col(tag_col).asc(),
            *[F.col(c).asc() for c in (tiebreak_cols or [])],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = timeline.withColumn(
        "__fill", F.last(ref_struct, ignorenulls=True).over(w)
    )
    out_cols = [
        c for c in timeline.columns if c not in (tag_col,) and c not in ref_value_cols
    ]
    return filled.where(F.col(tag_col) != F.lit(ref_tag)).select(
        *out_cols,
        F.col(f"__fill.{prefix}ts").alias(f"{prefix}ts"),
        *[F.col(f"__fill.{prefix}{c}").alias(f"{prefix}{c}") for c in ref_value_cols],
    )


def _cell(ts_col, cell_seconds: int):
    # Bucket id from epoch micros.  The cast-to-timestamp is a no-op
    # for TIMESTAMP and a UTC-pinned wall-clock mapping for
    # TIMESTAMP_NTZ (session tz is UTC); either way BOTH sides of the
    # join bucket identically, and exactness comes from the final
    # range predicate, never from the bucketing.
    us = F.unix_micros(ts_col.cast("timestamp"))
    return F.floor(us / F.lit(int(cell_seconds) * 1_000_000))


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo_col: str,
    hi_col: str,
    cell_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Join point rows to interval rows where
    ``lo <= point_ts < hi`` with no equi key, via a 1-D time grid.

    Intervals explode onto covered cells -- ceil(len/cell)+1 rows
    each, bounded as long as interval length is bounded -- and points
    map to exactly one cell, so every qualifying pair meets exactly
    once and no dedup is needed.  ``how='left_intervals'`` keeps
    intervals with no matching point (point columns NULL) via a
    null-safe anti-join of the interval rows against the matched
    pairs; an interval row duplicated in the input yields one NULL
    row per duplicate.

    Returns all interval columns plus all point columns.
    """
    from nyc_crash_mapper_etl_script_spark.functions.scratch import reserve

    reserve(intervals, "__cell")
    reserve(points, "__cell")
    lo = F.col(lo_col)
    hi = F.col(hi_col)
    iv = intervals.withColumn(
        "__cell",
        F.explode(F.sequence(_cell(lo, cell_seconds), _cell(hi, cell_seconds))),
    )
    pt = points.withColumn("__cell", _cell(F.col(point_ts), cell_seconds))
    joined = iv.join(pt, on="__cell", how="inner").where(
        (F.col(point_ts) >= lo) & (F.col(point_ts) < hi)
    )
    out = joined.drop("__cell")
    if how == "inner":
        return out
    if how == "left_intervals":
        # keep intervals with no qualifying point: null-safe anti-join
        # of the interval rows against the matched pairs' interval
        # columns (distinct treats NULLs equal, and eqNullSafe keeps
        # intervals with NULL value columns from false-surviving the
        # anti).  The anti side is matched-interval-distinct sized --
        # at most the interval dimension, never the point fan-out.
        icols = list(intervals.columns)
        pcols = [c for c in points.columns]
        m = out.select(*icols).distinct().alias("m")
        i = intervals.alias("i")
        cond = None
        for c in icols:
            e = F.col(f"i.{c}").eqNullSafe(F.col(f"m.{c}"))
            cond = e if cond is None else (cond & e)
        unmatched = i.join(m, cond, "left_anti").select(
            *[F.col(f"i.{c}").alias(c) for c in icols],
            *[F.lit(None).cast(points.schema[c].dataType).alias(c) for c in pcols],
        )
        return out.unionByName(unmatched)
    raise ValueError(f"unsupported how={how!r}")


def asof_join_salted(
    probe: DataFrame,
    ref: DataFrame,
    key_col: str,
    probe_ts: str,
    ref_ts: str,
    ref_value_cols: list[str],
    probe_cols: list[str] | None = None,
    ref_tiebreak: str | None = None,
    chunk_seconds: int = 86400,
    prefix: str = "asof_",
) -> DataFrame:
    """Hot-key-safe as-of join (inclusive): the segmented-scan form.

    The plain ``asof_join`` windows on the key alone, so one hot key
    (a bot user, a NULL-ish default) serializes into one task.  Here
    the window partitions on (key, time-chunk), bounding every task
    by the chunk width regardless of key skew; chunk-local misses
    are then resolved by a per-(key, chunk) summary pass:

    1. local fill within each (key, chunk) -- the big data's only
       wide operation, skew-bounded;
    2. per-(key, chunk) last-reference summaries (one row per key
       per active chunk -- orders of magnitude smaller);
    3. running last-summary over chunks per key (window over the
       SMALL summary set);
    4. probes still unfilled after step 1 take the latest summary of
       any EARLIER chunk via one equi-join on (key, chunk).

    Semantics are pinned equal to ``asof_join`` by test on random
    data.  Cost: the same single wide shuffle, one extra small
    aggregate + join; use when a key can hold a meaningful share of
    all events.
    """
    probe_cols = probe_cols or [
        c for c in probe.columns if c not in (key_col, probe_ts)
    ]
    ref_struct = F.struct(
        F.col(ref_ts).alias(f"{prefix}ts"),
        *[F.col(c).alias(f"{prefix}{c}") for c in ref_value_cols],
    )
    tb_ref = F.col(ref_tiebreak) if ref_tiebreak else F.lit(0)
    cell = lambda c: _cell(c, chunk_seconds)  # noqa: E731

    r = ref.select(
        F.col(key_col).alias("__k"),
        F.col(ref_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        tb_ref.cast("long").alias("__tb"),
        ref_struct.alias("__rv"),
        cell(F.col(ref_ts)).alias("__cell"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe_cols],
    )
    p = probe.select(
        F.col(key_col).alias("__k"),
        F.col(probe_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(0).cast("long").alias("__tb"),
        F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
        cell(F.col(probe_ts)).alias("__cell"),
        *[F.col(c) for c in probe_cols],
    )

    w_local = (
        Window.partitionBy("__k", "__cell")
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = r.unionByName(p).withColumn(
        "__fill", F.last("__rv", ignorenulls=True).over(w_local)
    )

    # per-(key, chunk) last reference -- max_by over the chunk's refs.
    # Lazy localCheckpoint: summaries feeds BOTH the (key, cell)
    # universe and the carry join -- without it the full reference
    # scan + argmax aggregate is cloned into each consumer.  The
    # checkpointed relation is one row per key per active chunk.
    summaries = (
        r.groupBy("__k", "__cell")
        .agg(
            F.max_by(
                F.col("__rv"), F.struct(F.col("__ts"), F.col("__tb"))
            ).alias("__last_rv")
        )
        .localCheckpoint(eager=False)
    )
    # The carry must be defined at every PROBE cell too, not only at
    # cells that contain a reference -- a probe chunk with no refs at
    # all still inherits from the nearest earlier ref chunk.  Build
    # the (key, cell) universe from both sides (distinct key-cells:
    # summary-sized, small), outer-join the summaries on, and run the
    # running-last over that.
    universe = (
        p.select("__k", "__cell")
        .union(summaries.select("__k", "__cell"))
        .distinct()
    )
    w_chunks = (
        Window.partitionBy("__k")
        .orderBy(F.col("__cell").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        universe.join(summaries, on=["__k", "__cell"], how="left")
        .withColumn(
            "__carry", F.last("__last_rv", ignorenulls=True).over(w_chunks)
        )
        .select("__k", "__cell", "__carry")
    )

    probes = local.where(F.col("__tag") == 1)
    resolved = probes.join(carry, on=["__k", "__cell"], how="left").withColumn(
        "__fill", F.coalesce(F.col("__fill"), F.col("__carry"))
    )
    return resolved.select(
        F.col("__k").alias(key_col),
        F.col("__ts").alias(probe_ts),
        *[F.col(c) for c in probe_cols],
        F.col(f"__fill.{prefix}ts").alias(f"{prefix}ts"),
        *[
            F.col(f"__fill.{prefix}{c}").alias(f"{prefix}{c}")
            for c in ref_value_cols
        ],
    )
