"""Array-construction Column helpers (reference §2.8 F5).

The reference collapses up to 5 numbered source columns into a
``text[]`` (main.py:135-163): each present value is single-quote
stripped, comma-split (``re.split(r'\\s*,\\s*', v)``), and
whitespace-trimmed; empty results are dropped.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def split_strip_quotes(c: Column) -> Column:
    """One source slot -> array of clean tokens.

    main.py:158-161: strip single quotes, split on commas with
    surrounding whitespace, trim.  (backlog/check_backlog.py:234-235
    is an older no-split variant; main.py behavior is canonical.)
    """
    cleaned = F.regexp_replace(c, "'", "")
    return F.filter(
        F.transform(F.split(cleaned, r"\s*,\s*"), lambda t: F.trim(t)),
        lambda t: t != F.lit(""),
    )


def collapse_numbered_columns(*cols: Column) -> Column:
    """N numbered columns -> one deduplicated-order-preserving array.

    ``ARRAY[..]::text[]`` construction at main.py:135-163; NULL slots
    and empty strings are dropped, comma-packed slots are exploded
    into multiple tokens.
    """
    empty = F.array().cast("array<string>")
    per_slot = F.array(*[F.coalesce(split_strip_quotes(c), empty) for c in cols])
    return F.flatten(per_slot)
