"""Document chunking with overlap (training-pipeline north star:
RAG-prep / long-document windowing -- split each document into
fixed-width character chunks on a fixed stride, adjacent chunks
overlapping by ``width - stride``).

Plan shape at 100 TB: pure codegen -- a ``sequence()`` of chunk
starts generated per row and exploded (Spark's Generate operator,
no Python, no shuffle), then a ``substring`` per chunk.  Output
row count is ceil(len / stride) per document; the operator is
embarrassingly parallel and preserves the input partitioning.
A downstream embedding stage consumes (doc_id, chunk_id) directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["chunk_overlap"]


def chunk_overlap(
    df: DataFrame,
    width: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_id, chunk_start, chunk_len, chunk): chunks of
    ``width`` chars starting every ``stride`` chars (0-based starts;
    ``chunk_id = start / stride``).  Starts run while ``start <
    len``, so every chunk is non-empty and the final partial chunk
    is kept.  Empty/NULL documents produce no chunks.
    """
    if stride <= 0 or width <= 0:
        raise ValueError("width and stride must be positive")
    text = F.coalesce(F.col(text_col), F.lit(""))
    starts = F.sequence(
        F.lit(0), F.greatest(F.length(text) - 1, F.lit(0)), F.lit(stride)
    )
    return (
        df.where(F.length(text) > 0)
        .select(
            F.col(id_col),
            F.length(text).alias("__len"),
            F.explode(starts).alias("chunk_start"),
            text.alias("__text"),
        )
        .select(
            id_col,
            (F.col("chunk_start") / stride).cast("long").alias("chunk_id"),
            "chunk_start",
            F.substring(F.col("__text"), F.col("chunk_start") + 1, F.lit(width)).alias(
                "chunk"
            ),
        )
        .withColumn("chunk_len", F.length("chunk"))
        .select(id_col, "chunk_id", "chunk_start", "chunk_len", "chunk")
    )
