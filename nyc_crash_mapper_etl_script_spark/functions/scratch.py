"""Scratch-column collision guard.

Operators that stage intermediate values in ``__``-prefixed columns
(``__us``, ``__cell``, ``__lvl``, ...) via ``withColumn`` would
silently OVERWRITE an input column of the same name and then drop it.
``reserve`` makes that failure loud: call it with the scratch names an
operator is about to write; it raises if the input already carries
one.  (Operators that build their working set with a fresh
``select()`` don't need this -- they never overwrite input columns.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def reserve(df: DataFrame, *names: str) -> None:
    """Raise ``ValueError`` if any scratch name collides with an
    input column (which would be silently corrupted)."""
    clash = [n for n in names if n in df.columns]
    if clash:
        raise ValueError(
            f"input columns {clash} collide with reserved scratch names; "
            "rename them before calling this operator"
        )
