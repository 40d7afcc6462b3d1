"""Streaming as-of enrichment: stream-static join against a TxTable.

The live twin of ``operators.temporal_join.asof_join`` for the common
production shape: a micro-batched event stream must be enriched with
the LATEST dimension row per key, where the dimension is maintained
transactionally (TxTable merges from the CDC path).  Structured
Streaming's stream-static join re-resolves the static side per
micro-batch, so a dimension merge that commits between batches is
visible to the next batch with no restart -- exactly the freshness
contract an as-of join against "current state" means on a stream.

Two shapes:

 - ``enrich_stream``: plain stream-static LEFT join on the key; the
   static side is ``TxTable.read`` filtered to current rows (an SCD2
   dimension filters ``is_current``).  At scale the static side is
   broadcast when dimension-sized, else shuffle-joined per batch --
   Spark re-plans each micro-batch, so AQE picks per-batch.
 - ``enrich_stream_asof``: per-batch point-in-time resolution -- for
   each event, the latest dimension version with
   ``valid_from <= event ts`` (dimension carries SCD2 validity from
   ``operators.scd.scd2_history``).  Implemented inside
   ``foreachBatch`` with the SAME batch as-of operator, so batch and
   stream semantics cannot drift (one implementation, two drivers).

Reference parity: the reference's nightly joins freshly-fetched
dimension snapshots (main.py:536-552 districts fetch before the
update loop); this is that pattern with the snapshot replaced by a
transactional table and the nightly loop by micro-batches.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.sources.txtable import TxTable


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    key_col: str,
    dim_cols: list[str],
) -> DataFrame:
    """Stream-static LEFT join: each micro-batch sees the static
    side's CURRENT committed state."""
    right = dim.select(key_col, *dim_cols)
    return stream.join(right, on=key_col, how="left")


def enrich_stream_asof(
    stream: DataFrame,
    dim_table: TxTable,
    key_col: str,
    ts_col: str,
    valid_from_col: str,
    dim_value_cols: list[str],
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
):
    """foreachBatch as-of enrichment against a TxTable dimension.

    Every micro-batch re-reads the dimension (fresh TxTable commit
    state) and resolves each event against the version valid at the
    event's OWN timestamp via the batch ``asof_join`` -- late events
    get the historically-correct version, not the newest one.
    Returns the started StreamingQuery.
    """
    from nyc_crash_mapper_etl_script_spark.operators.temporal_join import (
        asof_join,
    )

    def process(batch: DataFrame, batch_id: int) -> None:
        dim = dim_table.read(batch.sparkSession)
        out = asof_join(
            probe=batch,
            ref=dim,
            key_col=key_col,
            probe_ts=ts_col,
            ref_ts=valid_from_col,
            ref_value_cols=dim_value_cols,
            inclusive=True,
        )
        sink(out, batch_id)

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(process)
        .start()
    )
