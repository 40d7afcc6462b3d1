"""Deterministic cardinality sketch: KMV (k minimum values).

``approx_count_distinct`` (HLL++) is the right tool inside one
engine, but its estimate depends on Spark's private hash and register
layout -- unverifiable against any other system.  KMV with an md5
hash family is the portable alternative: hash every distinct value to
a uniform [0,1) fraction, keep the k smallest, and estimate
``(k-1) / h_(k)`` (Bar-Yossef et al. 2002).  md5 is identical
everywhere, so Spark and DuckDB produce the SAME estimate bit for
bit -- an *oracle-checkable* approximate aggregate.

Scale shape: the hash is a codegen projection; per-partition top-k
then global top-k is Spark's TakeOrdered path -- no full sort, no
single-task global window; the merge traffic is k rows per partition.
Memory is O(k) everywhere.  The same mergeability means sketches of
partitions/days can be unioned then re-minned -- the incremental
rollup a 100 TB corpus needs (sketch per partition once, merge
cheaply forever).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_fraction(col: Column, salt: str = "") -> Column:
    """Uniform [0,1) from md5: first 8 hex chars as uint32 / 2^32.
    DuckDB twin: ``('0x' || substr(md5(x), 1, 8))::BIGINT / 2^32``."""
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(4294967296.0)


def kmv_distinct(
    df: DataFrame,
    col: str,
    k: int = 256,
    salt: str = "",
) -> DataFrame:
    """One-row sketch summary: the KMV cardinality estimate for
    ``col`` plus the exact inputs it derives from (k and the k-th
    minimum hash), so consumers can merge or audit it.

    Columns: ``n_hashes`` (min(k, distinct count) actually kept),
    ``kth_min`` (largest kept hash), ``est_distinct`` (double;
    exactly n_hashes when the domain is smaller than k).
    """
    hashes = (
        df.where(F.col(col).isNotNull())
        .select(md5_fraction(F.col(col), salt).alias("__h"))
        .distinct()
        .orderBy(F.col("__h").asc())
        .limit(k)
    )
    return hashes.agg(
        F.count("*").alias("n_hashes"),
        F.max("__h").alias("kth_min"),
        F.round(
            F.when(
                F.count("*") < F.lit(k),
                F.count("*").cast("double"),
            ).otherwise((F.lit(k) - 1) / F.max("__h")),
            4,
        ).alias("est_distinct"),
    )


def kmv_distinct_grouped(
    df: DataFrame,
    group_col: str,
    col: str,
    k: int = 32,
    salt: str = "",
) -> DataFrame:
    """Per-group KMV sketches: one (n_hashes, est_distinct) row per
    group.  Distinct hashes first (map-combined), then a per-group
    top-k window over the DISTINCT hash rows -- the window input is
    already deduplicated, so its volume is min(group distinct, |domain|)
    per group, and the frame never materializes more than a sort run.
    Sketches of shards union + re-min into the same estimate, which
    is how a 100 TB corpus profiles per-source cardinalities in one
    pass per shard."""
    from pyspark.sql import Window

    hashes = (
        df.where(F.col(col).isNotNull())
        .select(F.col(group_col), md5_fraction(F.col(col), salt).alias("__h"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy(F.col("__h").asc())
    topk = hashes.withColumn("__rn", F.row_number().over(w)).where(
        F.col("__rn") <= k
    )
    return topk.groupBy(group_col).agg(
        F.count("*").alias("n_hashes"),
        F.round(
            F.when(F.count("*") < F.lit(k), F.count("*").cast("double")).otherwise(
                (F.lit(k) - 1) / F.max("__h")
            ),
            4,
        ).alias("est_distinct"),
    )


def kmv_set_overlap(
    a: DataFrame,
    b: DataFrame,
    col: str,
    k: int = 256,
    salt: str = "",
) -> DataFrame:
    """KMV sketch SET OPERATIONS between two element sets: one-row
    estimate of |A union B|, Jaccard(A, B) and |A intersect B| from
    the k minimum hashes of the UNION (Beyer et al. 2007 / the theta-
    sketch construction).  The k smallest union hashes are a uniform
    sample of A union B, so the fraction of them present in BOTH
    sides estimates Jaccard, and intersection = jaccard x union.

    This answers "how much do two 100 TB corpora overlap?" WITHOUT a
    corpus-sized join: each side folds to distinct md5 fractions
    (map-side-combined hash agg), membership flags merge on the hash
    value, and the k-smallest selection is Spark's TakeOrdered path
    (per-partition top-k, k rows per partition of merge traffic).
    Memory O(k) everywhere; sketches of shards union + re-min into
    the same estimate, so per-shard sketches are computed once and
    merged forever.

    Deterministic bit-for-bit on any engine with md5 -- the oracle
    replays estimate arithmetic exactly (round 4).

    Output (one row): n_hashes, est_union, est_jaccard,
    est_intersection.
    """
    ha = (
        a.where(F.col(col).isNotNull())
        .select(md5_fraction(F.col(col), salt).alias("__h"))
        .distinct()
        .withColumn("__in_a", F.lit(1))
        .withColumn("__in_b", F.lit(0))
    )
    hb = (
        b.where(F.col(col).isNotNull())
        .select(md5_fraction(F.col(col), salt).alias("__h"))
        .distinct()
        .withColumn("__in_a", F.lit(0))
        .withColumn("__in_b", F.lit(1))
    )
    elems = (
        ha.unionByName(hb)
        .groupBy("__h")
        .agg(F.max("__in_a").alias("__in_a"), F.max("__in_b").alias("__in_b"))
    )
    topk = elems.orderBy(F.col("__h").asc()).limit(k)
    n = F.count("*")
    est_union = F.when(n < F.lit(k), n.cast("double")).otherwise(
        (F.lit(k) - 1) / F.max("__h")
    )
    jac = F.sum(F.col("__in_a") * F.col("__in_b")).cast("double") / n
    return topk.agg(
        n.cast("long").alias("n_hashes"),
        F.round(est_union, 4).alias("est_union"),
        F.round(jac, 4).alias("est_jaccard"),
        F.round(jac * est_union, 4).alias("est_intersection"),
    )
