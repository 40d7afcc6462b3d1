"""Deterministic dataset splitting (training-pipeline north star).

A training corpus needs stable train/val/test assignment: the same
document must land in the same split on every run, on every cluster,
after every backfill -- so the split key is a HASH of the id, never a
random() (Spark's ``randomSplit`` resamples per run and per partition
layout).  The md5-derived fraction used here is reproducible in any
engine (DuckDB: ``('0x' || substr(md5(x), 1, 8))::UBIGINT / 2^32``),
which is also what makes the oracle twin exact.

Pure Column arithmetic -- codegen, zero shuffle, scales linearly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_fraction(key: Column, salt: str = "") -> Column:
    """Uniform [0, 1) fraction from md5(salt || key): first 8 hex
    chars -> 32-bit int / 2^32.  Salt rotates assignments without
    touching the data (a new epoch of splits = a new salt)."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(4294967296.0)


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Assign every row to a named split by hashed key.

    ``weights`` maps split name -> fraction (must sum to ~1; the last
    split absorbs rounding).  Assignment is a pure function of
    (salt, key): re-runs, backfills, and other engines agree row by
    row."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    frac = hash_fraction(F.col(key_col), salt)
    names = list(weights)
    bounds = []
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name]
        bounds.append((name, acc))
    expr = F.lit(names[-1])
    for name, hi in reversed(bounds):
        expr = F.when(frac < hi, name).otherwise(expr)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its
    md5-fraction is below its stratum's rate.  The classic
    rebalance-the-corpus move (e.g. keep 100% of low-resource
    languages, 10% of English) with the same guarantees as
    :func:`hash_split`: pure function of (salt, key), so re-runs,
    backfills, and the DuckDB oracle agree row by row -- unlike
    ``DataFrame.sampleBy``, which draws per-run randoms.  Strata
    absent from ``fractions`` get ``default_fraction`` (drop, by
    default).  Zero shuffle: one codegen'd filter over the scan."""
    frac = hash_fraction(F.col(key_col), salt)
    rate = F.lit(float(default_fraction))
    for stratum, p in sorted(fractions.items()):
        rate = F.when(F.col(strata_col) == stratum, F.lit(float(p))).otherwise(rate)
    return df.where(frac < rate)


def temperature_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    target_total: Column | int,
    salt: str = "",
) -> DataFrame:
    """Temperature-based source re-balancing (alpha = 0.5): sample
    source s with probability ``min(1, T / (sqrt(n_s) * SUM_t
    sqrt(n_t)))``, the keep-rate that draws ~T docs total with
    per-source mass proportional to sqrt(n_s) -- the standard
    up-weighting of rare sources in multi-corpus training mixes
    (alpha fixed at 0.5 because sqrt is IEEE-correctly-rounded
    everywhere, so any engine derives the identical threshold;
    a general pow() would not be bit-portable).

    Membership is hash_fraction(key) < p_s -- deterministic per row,
    stable across runs/engines/backfills like hash_split.  The
    per-source counts are one map-combined aggregate; thresholds
    broadcast back onto the fact table (dimension-sized join).
    Thresholds are rounded to 12 decimals so last-ulp summation
    differences between engines cannot flip a membership test.
    """
    t = F.lit(target_total).cast("double") if isinstance(target_total, int) else target_total
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    sqrt_sum = counts.agg(
        F.sum(F.sqrt(F.col("__n"))).alias("__ss")
    )
    probs = counts.crossJoin(F.broadcast(sqrt_sum)).select(
        F.col(group_col),
        F.round(
            F.least(
                F.lit(1.0), t / (F.sqrt(F.col("__n")) * F.col("__ss"))
            ),
            12,
        ).alias("__p"),
    )
    return (
        df.join(F.broadcast(probs), on=group_col)
        .where(hash_fraction(F.col(key_col), salt) < F.col("__p"))
        .drop("__p")
    )


def shuffled_shards(
    df: DataFrame,
    key: Column,
    n_shards: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic GLOBAL shuffle + sharding for training export
    (reference analog: none -- north-star extension): every row gets
    a shard id and a position inside its shard, both pure functions
    of md5(salt || key), so any engine -- and any rerun -- produces
    the identical byte order.  Training pipelines need this to write
    N shard files whose concatenation is a reproducible random
    permutation of the corpus (epoch order, resume-safe data
    loaders).

    Shape: shard = first-8-hex-digits bucket (uniform), position =
    row_number over (shard) ordered by the full hash -- ONE shuffle
    on shard, each window sized corpus/n_shards, no global sort and
    no single-task ordering bottleneck.  Writing with
    ``partitionBy(shard)`` then lays each shard out contiguous and
    position-sorted."""
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_shards
    ).cast("int")
    out = df.withColumn("__h", h).withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy(F.col("__h").asc(), key.asc())
    return out.withColumn(
        "pos", F.row_number().over(w).cast("long")
    ).drop("__h")


def weighted_sample(
    df: DataFrame,
    key: Column,
    weight: Column,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    A-ES), distributed and deterministic: each row draws
    u = md5-fraction(salt || key) and ranks by ln(u)/w -- the top-k
    ranks ARE a weight-proportional sample without replacement, and
    because u is a pure hash the same call reproduces the same
    sample in any engine (reference analog: none -- north-star
    training-data extension; the standard way to draw a budgeted
    subcorpus where quality scores are sampling weights).

    Plan: one narrow projection + TakeOrderedAndProject (per-partition
    heaps of k, driver merge) -- no shuffle of the full table, no
    global sort.  Rows with non-positive weight are excluded (their
    key is undefined).  Float caveat: cross-engine log() can differ
    in the last ulp; a flip requires two sort keys within ~1e-16
    relative, which the unique-key md5 draw makes probability-zero
    in practice (same class of caveat as the temperature sampler's
    documented pow-vs-sqrt choice)."""
    u = hash_fraction(key, salt)
    # ln(u)/w in (-inf, 0); larger (closer to 0) = more likely kept.
    # u is never exactly 0 (md5 of real keys), so ln is finite.
    score = F.log(u) / weight
    return (
        df.where(weight > 0)
        .withColumn("__aes", score)
        .orderBy(F.col("__aes").desc(), key.asc())
        .limit(k)
        .drop("__aes")
    )


def mixture_token_budget(
    df: DataFrame,
    weights: "dict[str, float]",
    budget_tokens: int,
    domain_col: str = "source",
    size_col: str = "n_tokens",
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Domain-mixture selection under a global token budget
    (training-pipeline north star: build an epoch's mixture by
    domain weights -- the public data-mixture recipe shape, e.g.
    The Pile / Dolma mixture tables).

    Each domain ``d`` gets a quota ``floor(budget * w_d / sum(w))``;
    within the domain, documents are ordered by the deterministic
    md5 fraction (salt-rotatable shuffle order -- the same order
    ``shuffled_shards`` exports), and a document is kept while the
    RUNNING token total up to and including it fits the quota.
    Deterministic: same data + weights + salt => the same mixture on
    any engine, which is what makes the oracle twin exact.

    Plan shape at 100 TB: the quota table is a HANDFUL of rows
    (broadcast join on domain); the running total is ONE window
    (cumsum) partitioned by domain -- a single shuffle on the domain
    key.  Skew note: a window partition is one task, so a domain
    with billions of docs serializes; for that shape pre-filter with
    ``hash_fraction < quota_d / domain_tokens * c`` (an overshoot
    cap) before the exact cumsum, which bounds the partition to
    ~quota-sized data.  Returns (key, domain, size, cum) for audit.
    """
    total_w = float(sum(weights.values()))
    spark = df.sparkSession
    quota_rows = [
        (d, int(budget_tokens * (w / total_w))) for d, w in sorted(weights.items())
    ]
    quotas = spark.createDataFrame(quota_rows, f"{domain_col} string, __quota long")
    from pyspark.sql import Window

    order = hash_fraction(F.col(key_col), salt)
    w = (
        Window.partitionBy(domain_col)
        .orderBy(order.asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.join(F.broadcast(quotas), domain_col)
        .withColumn("__cum", F.sum(size_col).over(w))
        .where(F.col("__cum") <= F.col("__quota"))
        .select(key_col, domain_col, size_col, F.col("__cum").alias("cum_tokens"))
    )
