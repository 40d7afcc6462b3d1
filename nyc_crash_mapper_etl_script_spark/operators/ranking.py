"""BM25 document ranking (training-pipeline north star: retrieval-
style relevance scoring over a document corpus, e.g. for targeted
corpus selection or dedup-aware retrieval eval).

Okapi BM25 with the Lucene-style smoothed IDF (public formulation,
Robertson & Zaragoza 2009):

    score(d, q) = sum_{t in q} idf(t) * tf(t,d) * (k1 + 1)
                  / (tf(t,d) + k1 * (1 - b + b * |d| / avgdl))
    idf(t)      = ln( (N - df(t) + 0.5) / (df(t) + 0.5) + 1 )

Plan shape at 100 TB: the query-term filter lands BEFORE the tf
aggregate (the explode only shuffles matching tokens -- a handful of
terms, not the corpus vocabulary), document length is a codegen'd
``size()`` in the scan projection (no second explode), df reuses the
tf relation (tf rows are already per (doc, token), so a count per
token IS the document frequency), and N/avgdl ride in as ONE
broadcast 1-row aggregate.  The final top-k is TakeOrderedAndProject
via ``operators.topk.top_k`` -- per-partition heaps, no global sort.
Scores are rounded at 6 before ranking so the top-k boundary is
engine-independent (doc-id tie-break).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.operators.topk import top_k
from nyc_crash_mapper_etl_script_spark.operators.vocab import tokens

__all__ = ["bm25_rank"]


def bm25_rank(
    df: DataFrame,
    query_terms: list[str],
    n: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-n documents by BM25 score against ``query_terms``.

    Returns (id_col, score) with score rounded at 6; ties at the
    boundary break on ascending id so the result set is
    deterministic on any engine.
    """
    toks = tokens(F.col(text_col))
    # lazy localCheckpoints: doclen feeds the N/avgdl aggregate AND
    # the per-doc join, tf feeds the df count AND the scoring join --
    # without them Catalyst clones each subtree into both consumers
    # and the corpus is tokenized four times per action instead of
    # twice.  Both relations are narrow ((id, dl) and
    # (id, token, tf) restricted to query terms), so materializing
    # them costs bytes proportional to the corpus ROW COUNT, not its
    # text.
    doclen = df.select(F.col(id_col), F.size(toks).alias("dl")).localCheckpoint(
        eager=False
    )
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("token"))
        .where(F.col("token").isin(list(query_terms)))
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    stats = doclen.agg(
        F.count("*").alias("__n"), F.avg("dl").alias("__avgdl")
    )
    idf = F.log(
        (F.col("__n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    norm = F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("__avgdl")
    )
    term_score = idf * F.col("tf") * F.lit(k1 + 1.0) / (F.col("tf") + norm)
    scored = (
        tf.join(dfreq, "token")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(term_score), 6).alias("score"))
    )
    return top_k(scored, "score", n, id_col)
