"""Size-aware materialization of multiply-consumed plan subtrees.

Catalyst clones a DataFrame's upstream plan into every consumer, so an
operator whose intermediate feeds 2+ branches re-executes the whole
subtree per branch unless the subtree is materialized once.  The r12
optimization round used ``localCheckpoint(eager=False)`` for that
everywhere; for DIMENSION-sized relations (aggregates, norms, per-key
summaries) that is unconditionally right.  For CORPUS-sized relations
it has two costs that only show up at cluster scale (r12 VERDICT item
2):

- the checkpointed blocks live at MEMORY_AND_DISK in executor
  *storage* memory, competing with execution memory for the very
  shuffles the operator still runs (guide §5), and
- ``localCheckpoint`` TRUNCATES lineage: the blocks are
  non-replicated, so one executor loss fails the whole job instead of
  recomputing a partition.

:func:`share_corpus_subtree` keeps the local/bench behavior --
``localCheckpoint(eager=False)`` -- whenever the subtree's estimated
INPUT is small, and switches to ``persist(StorageLevel.DISK_ONLY)``
past the bound: same one-materialization-per-action plan shape (the
CacheManager substitutes the cached relation into every consumer),
no storage-memory competition (disk only), and lineage preserved --
an executor loss recomputes the lost partitions instead of killing
the job.

Sizing: the sum of the plan's FILE-relation leaf estimates (real
parquet file sizes, read off the optimized plan on the driver in
<1 ms, no job).  Leaf sizes are the one Catalyst estimate that is
reliable -- join/explode OUTPUT estimates are multiplicative guesses
(an r13 probe measured a sf0.1 self-join estimated at 24000x its
input) -- and "how much source data feeds this subtree" is exactly
the scale question: corpus-derived intermediates are within a small
factor of their corpus input, never orders of magnitude away.
Non-file leaves (localCheckpoint RDDs, local relations) contribute
nothing; a subtree with NO file leaves keeps the checkpoint branch.

The bound is deliberately order-of-magnitude
(``$SPARK_GRAFT_SHARED_MATERIALIZE_MAX_BYTES``, default 32 GiB): a
narrow intermediate derived from <=32 GiB of input fits comfortably
in cluster storage, while a 100 TB corpus is 3.5 orders of magnitude
past the bound, so intermediate-width misestimates can never flip
the branch.

The DISK_ONLY branch is never taken in the local bench/oracle runs
(sf inputs are MBs), so bench timings keep re-materializing per rep
exactly as before -- nothing is cached across timed runs.  A service
caller at scale that re-declares the same plan in one session will
reuse the persisted relation until it unpersists; that is standard
``persist`` semantics and the documented contract here.
"""

from __future__ import annotations

import os

from pyspark import StorageLevel
from pyspark.sql import DataFrame

_ENV = "SPARK_GRAFT_SHARED_MATERIALIZE_MAX_BYTES"
_DEFAULT_MAX_BYTES = 32 * 1024**3


def file_input_bytes(df: DataFrame) -> int:
    """Sum of the FILE-relation leaf size estimates of ``df``'s
    optimized plan -- the bytes of source data feeding the subtree.
    Driver-side, sub-millisecond, no job.  Returns -1 when the plan
    cannot be inspected (API drift); non-file leaves (checkpointed
    RDDs, local relations) count 0."""
    try:
        leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
        total = 0
        for i in range(leaves.size()):
            leaf = leaves.apply(i)
            if leaf.getClass().getSimpleName() == "LogicalRelation":
                total += int(str(leaf.stats().sizeInBytes()))
        return total
    except Exception:  # noqa: BLE001 -- estimate is best-effort
        return -1


def share_corpus_subtree(df: DataFrame) -> DataFrame:
    """Materialize a multiply-consumed CORPUS-scale subtree once.

    Under the bound (the whole local/bench regime):
    ``localCheckpoint(eager=False)`` -- plans and bench identical to
    the r12 behavior.  Past it: ``persist(DISK_ONLY)`` -- one
    materialization per action, lineage-preserving, out of executor
    storage memory.  An uninspectable plan (-1) takes the checkpoint
    branch so local behavior can never silently change."""
    bound = int(os.environ.get(_ENV, _DEFAULT_MAX_BYTES))
    if file_input_bytes(df) <= bound:
        return df.localCheckpoint(eager=False)
    return df.persist(StorageLevel.DISK_ONLY)
