"""Bloom-filter pre-join: runtime row-level filtering for joins whose
dimension is too big to broadcast as a hash table but whose KEY SET
compresses into a few KB of bloom bits.

At 100 TB the standard shape is ``fact JOIN dim ON key`` where the
fact side shuffles everything, including the overwhelming majority of
rows that match nothing.  A bloom filter built from the dimension's
keys turns that into: build once (one small aggregate over the dim),
broadcast the bit array as a LITERAL into a pure codegen predicate,
and drop non-matching fact rows AT THE SCAN, before the shuffle.
False positives pass (and are removed by the exact join that
follows); false negatives are impossible.  This is the explicit,
engine-portable form of Spark's own InjectRuntimeFilter /
Delta-style dynamic file pruning -- useful when the optimizer's
automatic variant doesn't fire (non-equi pre-conditions, unions,
hand-built DAGs) or when the filter must be reproducible
cross-engine.

Hash family: position_i(key) = first-8-hex of md5(f"{i}:{key}") mod
n_bits -- the same DuckDB-replayable base hash as the sampling and
LSH families, so the ENTIRE filter (bits set, rows passed, false
positives included) is deterministic and reproducible 1:1 in the SQL
oracle.  The build is one distinct+bit_or aggregate (output bounded
by n_bits/64 longs, collected driver-side and memoized on the dim
plan via plancache); the probe never touches the dimension again.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _md5_pos(key: Column, i: int, n_bits: int) -> Column:
    """Bloom position i for a key.  For i < 4 all positions come from
    ONE md5: the 32 hex chars split into four 8-hex (32-bit) chunks --
    the Kirsch-Mitzenmacher observation that k independent-enough
    hashes can share one strong hash's bits, so the per-row cost is a
    single digest regardless of k.  Beyond 4, salt-prefixed digests
    (``md5(i ':' key)``) extend the family.  Both forms are
    DuckDB-replayable char-for-char."""
    if i < 4:
        h = F.conv(
            F.substring(F.md5(key.cast("string")), 1 + 8 * i, 8), 16, 10
        ).cast("long")
    else:
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), key.cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
    return F.pmod(h, F.lit(n_bits))


def bloom_build(
    dim: DataFrame, key_col: str, n_bits: int = 65536, n_hashes: int = 4
) -> list[int]:
    """Build the bit array from the dimension's keys: explode each
    key to its n_hashes positions, distinct, OR into n_bits/64 words
    (one small aggregate -- output bounded by the filter size, never
    the dimension).  Memoized on the dim plan, so re-declaring a DAG
    over an unchanged dimension reuses the collected words."""
    from nyc_crash_mapper_etl_script_spark.plancache import memo

    def compute() -> list[int]:
        key = F.col(key_col)
        positions = (
            dim.where(key.isNotNull())
            .select(
                F.explode(
                    F.array(*[_md5_pos(key, i, n_bits) for i in range(n_hashes)])
                ).alias("pos")
            )
            .distinct()
        )
        rows = (
            positions.groupBy(
                (F.col("pos") / F.lit(64)).cast("long").alias("w")
            )
            .agg(
                F.bit_or(
                    # call_function: the python shiftleft wrapper only
                    # accepts an int bit count, the SQL function takes
                    # a Column
                    F.call_function(
                        "shiftleft",
                        F.lit(1).cast("long"),
                        F.pmod(F.col("pos"), F.lit(64)).cast("int"),
                    )
                ).alias("bits")
            )
            .collect()
        )
        words = [0] * ((n_bits + 63) // 64)
        for r in rows:
            words[int(r["w"])] = int(r["bits"])
        return words

    return memo(dim, "bloom_words", (key_col, n_bits, n_hashes), compute)


def bloom_contains(
    key: Column, words: list[int], n_bits: int, n_hashes: int = 4
) -> Column:
    """Membership predicate as a pure Column expression: all n_hashes
    positions must have their bit set.  The bit array enters the plan
    ONCE as a literal array bound through forall's lambda, so the
    probe is zero-join, zero-shuffle, whole-stage-codegen work."""
    arr = F.array(*[F.lit(w).cast("long") for w in words])
    pos_arr = F.array(*[_md5_pos(key, i, n_bits) for i in range(n_hashes)])
    return F.forall(
        pos_arr,
        lambda p: F.call_function(
            "shiftrightunsigned",
            F.element_at(arr, (p / F.lit(64)).cast("int") + 1),
            F.pmod(p, F.lit(64)).cast("int"),
        ).bitwiseAND(F.lit(1))
        == 1,
    )


def bloom_prefilter(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = 65536,
    n_hashes: int = 4,
) -> DataFrame:
    """Fact rows whose key passes the dimension's bloom filter
    (includes deterministic false positives; zero false negatives).
    Compose with the exact join for final results -- the point is
    that the fact shuffle downstream now carries only
    |matches| + |false positives| rows."""
    words = bloom_build(dim, dim_key, n_bits, n_hashes)
    return fact.where(bloom_contains(F.col(fact_key), words, n_bits, n_hashes))


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_bits: int = 65536,
    n_hashes: int = 4,
) -> DataFrame:
    """Exact semi-join accelerated by the bloom prefilter: identical
    rows to ``fact.join(dim, fact[k]==dim[k], 'left_semi')``, but the
    shuffle only ever sees bloom survivors."""
    pre = bloom_prefilter(fact, dim, fact_key, dim_key, n_bits, n_hashes)
    keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    return pre.join(keys, on=fact_key, how="left_semi")
