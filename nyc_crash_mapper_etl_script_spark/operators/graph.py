"""Iterative graph analytics over relational edge sets (reference
analog: none -- north-star extension; the cluster-resolution
pointer jumping in operators/dedup_text.duplicate_clusters is the
other member of this family).

PageRank here is the fixed-iteration power method expressed as plain
DataFrame joins/aggregates, so the SAME computation is replayable in
ANSI SQL by unrolling the iterations -- which is exactly how the
registry oracle checks it (an oracle-checked iterative algorithm,
not a rows-only one).  Scale shape per iteration: one join of edges
to the current ranks on src (shuffle on src, or broadcast when the
rank table is dimension-sized), one map-combined sum on dst, one
left join back onto the node set; lineage is truncated every
iteration with a lazy localCheckpoint so K iterations cost K stages,
not a 2^K plan tree.

AQE caveat (measured, 65 jobs during declaration at sf0.1): creating
a checkpoint RDD under adaptive execution EXECUTES the subtree's
shuffle stages eagerly -- AdaptiveSparkPlan must run query stages to
finalize the physical plan toRdd needs -- so most of an iterative
declaration's wall time is real stage execution, and only the final
result stage remains for the first action.  Benchmark iterative
operators on declare+execute together, never the action alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank: returns (id, pagerank) with ranks
    rounded at 6 decimals (the cross-engine float-parity grid --
    per-iteration summation order differs between engines by ~1 ulp
    and five iterations amplify that to ~1e-15 relative, far inside
    the grid).  Dangling nodes (no out-edges) simply leak their
    mass, the common simplification; nodes with no IN-edges hold the
    base rank.  ``edges`` is directed -- symmetrize before calling
    for an undirected graph."""
    from nyc_crash_mapper_etl_script_spark.plancache import memo

    n = memo(nodes, "pr_n", (), lambda: nodes.count())
    base = (1.0 - damping) / n
    ids = nodes.select(F.col(id_col).alias("__id"))
    outdeg = edges.groupBy(F.col(src_col).alias("__src")).agg(
        F.count(F.lit(1)).alias("__deg")
    )
    ranks = ids.withColumn("__pr", F.lit(1.0 / n))
    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges[src_col] == ranks["__id"])
            .join(outdeg, edges[src_col] == outdeg["__src"])
            .select(
                F.col(dst_col).alias("__id"),
                (F.col("__pr") / F.col("__deg")).alias("__c"),
            )
        )
        summed = contrib.groupBy("__id").agg(F.sum("__c").alias("__s"))
        ranks = (
            ids.join(summed, "__id", "left")
            .select(
                "__id",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("__s"), F.lit(0.0))
                ).alias("__pr"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select(
        F.col("__id").alias(id_col), F.round("__pr", 6).alias("pagerank")
    )


def pagerank_converged(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    tol: float = 1e-6,
    max_iterations: int = 50,
    damping: float = 0.85,
) -> tuple[DataFrame, int]:
    """Convergence-terminated PageRank: iterate until the L1 delta
    between successive rank vectors drops below ``tol`` (one bounded
    sum-of-abs aggregate per iteration -- a scalar driver action, the
    price of a data-dependent stopping rule; the fixed-iteration
    :func:`pagerank` is the oracle-replayable form and shares its
    per-iteration plan shape).  Returns (ranks, iterations_run).
    Each check reads the two checkpointed rank vectors, so the delta
    scan is O(nodes), never a recompute of the chain."""
    from nyc_crash_mapper_etl_script_spark.plancache import memo

    n = memo(nodes, "pr_n", (), lambda: nodes.count())
    base = (1.0 - damping) / n
    ids = nodes.select(F.col(id_col).alias("__id"))
    outdeg = edges.groupBy(F.col(src_col).alias("__src")).agg(
        F.count(F.lit(1)).alias("__deg")
    )
    ranks = ids.withColumn("__pr", F.lit(1.0 / n)).localCheckpoint()
    it = 0
    for it in range(1, max_iterations + 1):
        contrib = (
            edges.join(ranks, edges[src_col] == ranks["__id"])
            .join(outdeg, edges[src_col] == outdeg["__src"])
            .select(
                F.col(dst_col).alias("__id"),
                (F.col("__pr") / F.col("__deg")).alias("__c"),
            )
        )
        summed = contrib.groupBy("__id").agg(F.sum("__c").alias("__s"))
        nxt = (
            ids.join(summed, "__id", "left")
            .select(
                "__id",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("__s"), F.lit(0.0))
                ).alias("__pr"),
            )
            .localCheckpoint()
        )
        delta = (
            ranks.select("__id", F.col("__pr").alias("__old"))
            .join(nxt, "__id")
            .agg(F.sum(F.abs(F.col("__pr") - F.col("__old"))).alias("d"))
            .first()["d"]
        )
        ranks = nxt
        if delta is not None and delta < tol:
            break
    return (
        ranks.select(
            F.col("__id").alias(id_col), F.round("__pr", 6).alias("pagerank")
        ),
        it,
    )
