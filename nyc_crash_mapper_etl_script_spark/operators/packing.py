"""Greedy sequence packing (training-pipeline north star).

LLM pretraining batches want documents packed into fixed token
budgets with minimal padding.  The assignment is inherently
sequential -- pack p is full only once the running total would
overflow -- so it cannot be a window expression; it IS perfectly
parallel across groups.  Spark shape: ``applyInPandas`` over the
group key with a deterministic in-group order; each group's packing
is a linear pandas scan (Arrow in, Arrow out).

At 100 TB one "source" can be most of the corpus, so the group key
must be bounded: ``shards`` > 1 subdivides each group by an
md5-derived shard of the id (deterministic, engine-portable), putting
a hard ceiling of |group| / shards on task memory at the cost of one
partially-filled final pack per shard.  The shard is part of the
output pack identity, so re-runs and backfills agree.

The greedy rule (first-fit in id order, oversized docs get a
singleton pack) is deliberately the simplest deterministic packing --
the same rule a DuckDB recursive CTE can replay row for row, which
is what makes the oracle twin exact.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_greedy(
    df: DataFrame,
    group_col: str,
    order_col: str,
    size_col: str,
    budget: int,
    shards: int = 1,
    salt: str = "",
) -> DataFrame:
    """Assign each row a ``pack_id`` (1-based per group/shard) such
    that packs fill greedily to ``budget`` in ``order_col`` order.

    Output: group_col, (shard if shards > 1), order_col, size_col,
    ``pack_id`` and ``pack_fill`` (running size after this row).
    """
    cols = [group_col, order_col, size_col]
    sel = df.select(*cols)
    group_keys = [group_col]
    if shards > 1:
        h = F.md5(F.concat(F.lit(salt), F.col(order_col).cast("string")))
        shard = F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(shards))
        sel = sel.withColumn("shard", shard)
        group_keys = [group_col, "shard"]

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in sel.schema.fields
    )
    schema = f"{out_fields}, pack_id bigint, pack_fill bigint"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        pack_ids, fills = [], []
        pid, acc = 1, 0
        for size in pdf[size_col].astype("int64"):
            if acc > 0 and acc + size > budget:
                pid += 1
                acc = 0
            acc += int(size)
            pack_ids.append(pid)
            fills.append(acc)
        pdf["pack_id"] = pd.Series(pack_ids, dtype="int64")
        pdf["pack_fill"] = pd.Series(fills, dtype="int64")
        return pdf

    return sel.groupBy(*group_keys).applyInPandas(pack, schema=schema)


def pack_concat(
    packed: DataFrame,
    docs: DataFrame,
    group_cols: list[str],
    order_col: str,
    text_col: str,
    sep: str = "\n\n",
) -> DataFrame:
    """Materialize packed training rows: join the pack assignment
    back to the document text and concatenate each pack's docs in
    ``order_col`` order.

    The ordered concat is collect_list of (order, text) structs +
    sort_array + transform -- all JVM-side; no per-group Python, no
    window.  One shuffle on the pack key; the struct sort is
    per-group in memory, bounded because a pack holds at most
    budget/min_doc_size documents by construction.

    Output: group_cols + ``n_docs`` + ``packed_text``.
    """
    joined = packed.join(docs.select(order_col, text_col), on=order_col)
    return joined.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.concat_ws(
            sep,
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col(order_col), F.col(text_col)))
                ),
                lambda s: s[text_col],
            ),
        ).alias("packed_text"),
    )
