"""Skew-mitigated joins.

AQE's skew-join splitting (on in session.py) handles most hot keys at
runtime by splitting oversized shuffle partitions.  Salting is the
explicit, plan-level form for the cases AQE can't fix — e.g. one key
holding half the fact table (every NULL-geometry crash mapping to the
same "unknown" district, a dominant vehicle type in the crosswalk
probe): the fact side spreads each key over ``n_salts`` sub-keys and
the other side is replicated across all of them, so no single reducer
receives the whole hot key.

Cost model: replication multiplies the small side by ``n_salts`` —
use it when that side is too big to broadcast but small relative to
the skewed side (the classic mid-size dimension).  Result is
row-identical to the plain join by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted over ``n_salts`` sub-keys.

    The salt is a deterministic hash of the skewed side's full row, so
    a hot key's rows spread evenly regardless of value distribution
    (and re-runs are reproducible).  Columns come out as in
    ``skewed.join(other, key, how)``."""
    from nyc_crash_mapper_etl_script_spark.functions.scratch import reserve

    reserve(skewed, "__salt")
    reserve(other, "__salt")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    s = skewed.withColumn("__salt", salt)
    o = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return s.join(o, [key, "__salt"], how).drop("__salt")
