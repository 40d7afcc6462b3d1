"""Document deduplication operators (north-star extensions).

Four strategies, all shuffle-frugal and designed for the 100 TB
training-data-pipeline case:

 - exact: content-hash groupBy (one shuffle on a 16-byte key)
 - minhash_lsh: shingle -> per-permutation min-hash signature computed
   entirely inside codegen (array transforms -- NO explode of the
   shingle set, so the pre-LSH stage is shuffle-free), then banded
   LSH: only band-key collisions shuffle, candidate pairs verified by
   signature agreement.  This is the scale path: cost is
   O(docs x bands) rows shuffled, never O(docs^2).
 - simhash: 64-bit sign-sum fingerprint + pigeonhole band blocking
   for hamming-distance candidates.
 - ngram_jaccard: exact jaccard over shingle sets for candidate pairs
   discovered via a shingle inverted index (the verify-stage oracle;
   quadratic only within a shared shingle's posting list).

All hashing is Spark's xxhash64 (deterministic across runs/executors).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.functions.text import shingles


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: fingerprint, keeper (min
    id), member count."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("fp"))
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("n"))
    )


_LONG_MAX = (1 << 63) - 1


def minhash_signature(text: Column, num_perm: int = 64, k: int = 5) -> Column:
    """MinHash signature as an ``array<bigint>`` of length num_perm.

    h_p(doc) = min over shingles of xxhash64(shingle, p) (the tuple
    hash is the permutation family).  ONE aggregate pass over the
    shingle array accumulating all num_perm minima -- the naive
    per-permutation ``array_min(transform(...))`` form re-evaluates
    the shingle construction num_perm times (measured 60x slower).
    Stays in codegen: no explode, no shuffle.  Empty docs get an
    all-NULL signature.
    """
    sh = shingles(text, k=k)
    perm_idx = F.sequence(F.lit(0), F.lit(num_perm - 1))
    sig = F.aggregate(
        sh,
        F.array_repeat(F.lit(_LONG_MAX).cast("long"), num_perm),
        lambda acc, s: F.zip_with(
            acc,
            F.transform(perm_idx, lambda p: F.xxhash64(s, p)),
            lambda a, b: F.least(a, b),
        ),
    )
    # empty shingle set -> NULL signature (array_min semantics of the
    # naive form), detected by the untouched sentinel
    return F.when(F.size(sh) > 0, sig)


def minhash_bands(sig: Column, bands: int, rows_per_band: int) -> Column:
    """LSH band keys: array of (band index, hash of the band's
    signature slice)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(sig, b * rows_per_band + F.lit(1), rows_per_band),
                        lambda v: v.cast("string"),
                    ),
                )
            ).alias("bucket"),
        ),
    )


def minhash_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    k: int = 5,
) -> DataFrame:
    """Near-duplicate pairs (a < b) whose estimated Jaccard (minhash
    signature agreement) >= threshold.

    Plan: signature projection (no shuffle) -> explode band keys
    (x bands) -> shuffle on (band, bucket) -> within-bucket self-join
    (bucket posting lists are tiny for non-degenerate corpora) ->
    distinct pairs -> signature-agreement verify.
    """
    rows_per_band = num_perm // bands
    sigs = docs.select(
        F.col(id_col).alias("id"),
        minhash_signature(F.col(text_col), num_perm, k).alias("sig"),
    ).where(F.element_at("sig", 1).isNotNull())
    banded = sigs.select(
        "id", "sig", F.explode(minhash_bands(F.col("sig"), bands, rows_per_band)).alias("bk")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bk") == F.col("b.bk")) & (F.col("a.id") < F.col("b.id")),
            "inner",
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda v: v,
        )
    )
    return (
        cand.withColumn(
            "est_jaccard", F.round(agree.cast("double") / F.lit(float(num_perm)), 6)
        )
        .drop("sig_a", "sig_b")
        .where(F.col("est_jaccard") >= threshold)
    )


#: signed-long bit weights (bit 63 is the sign bit)
_BIT_WEIGHTS = [1 << b for b in range(63)] + [-(1 << 63)]


def simhash64(text: Column, k: int = 1) -> Column:
    """64-bit SimHash over word k-shingles: bit b of the fingerprint
    is set when the sum over tokens of (+1 if bit b of
    xxhash64(token) else -1) is positive.

    One pass over the token array accumulating a 64-counter vector
    (zip_with inside aggregate -- pure codegen), then folded into a
    signed long."""
    sh = shingles(text, k=k)
    bit_idx = F.sequence(F.lit(0), F.lit(63))
    counts = F.aggregate(
        sh,
        F.array_repeat(F.lit(0).cast("int"), 64),
        lambda acc, tok: F.zip_with(
            acc,
            F.transform(
                bit_idx,
                lambda b: F.getbit(F.xxhash64(tok), b).cast("int") * F.lit(2) - F.lit(1),
            ),
            lambda x, y: x + y,
        ),
    )
    weights = F.array(*[F.lit(w).cast("long") for w in _BIT_WEIGHTS])
    return F.aggregate(
        F.zip_with(
            counts,
            weights,
            lambda c, w: F.when(c > 0, w).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (popcount of
    xor via bit_count)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs with hamming(simhash) <= max_hamming via pigeonhole
    blocking: split the 64-bit fingerprint into 4 16-bit chunks; any
    pair within distance 3 shares at least one chunk exactly."""
    sigs = docs.select(
        F.col(id_col).alias("id"), simhash64(F.col(text_col)).alias("sig")
    )
    # chunks unrolled in Python: shiftrightunsigned requires a literal
    # shift amount (not a lambda-bound Column)
    chunks = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(F.col("sig"), c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("ck"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.ck") == F.col("b.ck")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.sig"), F.col("b.sig")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return cand.where(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact Jaccard near-dup pairs via a shingle inverted index.

    shuffle 1: explode distinct (doc, shingle) pairs on shingle;
    shuffle 2: groupBy (a,b) counting shared shingles; then exact
    jaccard = |A∩B| / (|A|+|B|-|A∩B|).  At 100 TB you'd cap posting
    lists (drop shingles shared by >N docs -- they contribute only to
    already-candidate pairs); here lists are small.
    """
    tok = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(shingles(F.col(text_col), k=k))).alias("sh"),
        )
    )
    sizes = tok.groupBy("id").agg(F.count("*").alias("n_sh"))
    a, b = tok.alias("a"), tok.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    out = (
        common.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("common")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out
