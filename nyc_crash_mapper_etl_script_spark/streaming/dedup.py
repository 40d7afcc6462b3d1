"""Streaming deduplication (exact, key-scoped state).

The streaming twin of the batch exact dedup
(``operators.dedup_text.exact_duplicates`` /
``operators.dedup_merge.new_rows``): the first arrival of a key
passes, every later arrival is dropped.  Two flavors:

 - :func:`dedup_stream` -- unbounded exactness: state holds every key
   seen since the query started.  Right for bounded key universes
   (entity ids) or short-lived queries.
 - :func:`dedup_stream_within_watermark` -- state expires with the
   event-time watermark: duplicates are only suppressed while they
   can still legally arrive (the late-data window), so state size is
   O(keys per watermark window), the only regime that survives an
   unbounded 100 TB/day feed.  This is Spark's
   ``dropDuplicatesWithinWatermark``: a duplicate older than the
   watermark was already dropped as late data upstream, so expiring
   its key loses nothing.

Both compose with the TxTable append sink: dedup-then-append gives
the reference's INSERT-only-new-rows semantics (SURVEY §2.4 J1,
main.py:521-556) as a continuous query instead of a nightly diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["dedup_stream", "dedup_stream_within_watermark"]


def dedup_stream(stream: DataFrame, key_cols: list[str]) -> DataFrame:
    """First arrival per key wins, forever (state never expires)."""
    return stream.dropDuplicates(key_cols)


def dedup_stream_within_watermark(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark_delay: str,
) -> DataFrame:
    """First arrival per key wins while the key is inside the
    watermark window; state for older keys is reclaimed."""
    return stream.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
        key_cols
    )
