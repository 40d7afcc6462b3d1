"""Continuous corpus-prep pipeline (plans/corpus_stream.py): the LLM
stack chained table-to-table the way the nightly chains the crash
stack.  Pins the two contracts the r5 verdict asks for: (1) streamed
corpus == batch pipeline recompute after every batch, (2) a replayed
micro-batch (crash between table commit and checkpoint commit) never
appends twice."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nyc_crash_mapper_etl_script_spark.plans.corpus_stream import (
    corpus_prep_stream,
    corpus_stats,
    prep_batch,
)
from nyc_crash_mapper_etl_script_spark.sources.txtable import TxTable

GOOD = (
    "the quick brown fox jumps over the lazy dog and then the fox "
    "rests in the shade of an old oak tree while the dog watches "
    "the road to the farm in the calm light of the afternoon sun"
)
NOISY = "!!! ??? *** $$$ %%% @@@ ((( ))) ### ^^^ &&& ~~~ ``` |||"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", src, len(t)) for (i, t, src) in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@pytest.fixture()
def corpus_env(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus_stream")
    source = TxTable(str(root / "docs"), retain_history=True)
    corpus = TxTable(str(root / "scored"))
    ckpt = str(root / "ck")
    return source, corpus, ckpt


def _drain(spark, source, corpus, ckpt):
    q = corpus_prep_stream(spark, source, corpus, ckpt, threshold_logit=-0.35)
    q.awaitTermination(300)


def _stats(spark, corpus):
    return {
        tuple(r)
        for r in corpus_stats(corpus.read(spark)).collect()
    }


def test_corpus_stream_matches_batch_recompute(spark, corpus_env):
    """Multi-batch: each drain leaves the corpus table equal to the
    batch pipeline (gate -> keep-lowest-id exact dedup) recomputed
    over everything ingested so far -- including cross-batch
    duplicate fingerprints and gated-out docs."""
    source, corpus, ckpt = corpus_env

    b1 = [
        (1, GOOD, "web"),
        (2, GOOD + " extra tail keeps the text distinct", "web"),
        (3, NOISY, "spam"),      # fails the gate
        (4, GOOD, "web"),        # within-batch dup of 1
    ]
    source.init(_docs(spark, b1))
    _drain(spark, source, corpus, ckpt)

    ingested = _docs(spark, b1)
    want = {
        tuple(r) for r in corpus_stats(prep_batch(ingested)).collect()
    }
    assert _stats(spark, corpus) == want
    kept_ids = {r["doc_id"] for r in corpus.read(spark).collect()}
    assert kept_ids == {1, 2}  # 3 gated out, 4 deduped against 1

    # sanity: the gate does real work on this fixture
    assert {r["doc_id"] for r in prep_batch(ingested).collect()} == {1, 2}

    b2 = [
        (5, GOOD, "web"),                                  # cross-batch dup of 1
        (6, "a different good document where the words of the story "
            "flow to the end and the reader is happy with the tale "
            "of the fox and the dog in the field by the barn", "books"),
        (7, NOISY + " !!!", "spam"),                       # fails the gate
        (8, GOOD + " extra tail keeps the text distinct", "web"),  # dup of 2
    ]
    source.append(_docs(spark, b2))
    _drain(spark, source, corpus, ckpt)

    all_rows = _docs(spark, b1 + b2)
    want = {tuple(r) for r in corpus_stats(prep_batch(all_rows)).collect()}
    assert _stats(spark, corpus) == want
    kept_ids = {r["doc_id"] for r in corpus.read(spark).collect()}
    assert kept_ids == {1, 2, 6}

    # full table equality, not just stats: streamed == batch recompute
    # (fp_pfx is the sink's partition-layout column, not pipeline data)
    streamed = {tuple(r) for r in corpus.read(spark).drop("fp_pfx").collect()}
    batch = {tuple(r) for r in prep_batch(all_rows).collect()}
    assert streamed == batch


def test_corpus_anti_join_is_partition_pruned(spark, corpus_env):
    """The 100 TB contract (r6 VERDICT item 2): the cross-batch
    anti-join's corpus side reads ONLY the partitions for the batch's
    own fp prefixes -- a strict file subset of the table, ivf_probe
    style."""
    source, corpus, ckpt = corpus_env
    # first batch: many distinct fps spread over several prefixes
    b1 = [(i, f"{GOOD} variant number {i} of the long tale", "web")
          for i in range(1, 13)]
    source.init(_docs(spark, b1))
    _drain(spark, source, corpus, ckpt)
    assert corpus.partition_by == ["fp_pfx"]
    all_files = set(corpus._live_files())
    pfx_dirs = {f.split(os.sep)[0] for f in all_files}
    assert len(pfx_dirs) > 1, "fixture must span multiple fp prefixes"
    # a one-doc second batch touches exactly one prefix
    b2 = [(20, f"{GOOD} variant number 20 of the long tale", "web")]
    batch_pfx = {
        r["fp_pfx"]
        for r in prep_batch(_docs(spark, b2))
        .select(F.substring("fp", 1, 2).alias("fp_pfx"))
        .collect()
    }
    pruned = set(corpus.partition_files("fp_pfx", batch_pfx))
    assert pruned < all_files, "pruned read must be a strict file subset"
    assert all(f.split(os.sep)[0] in {f"fp_pfx={p}" for p in batch_pfx}
               for f in pruned)
    # and the pruned read returns exactly the matching partitions' rows
    got = {
        r["fp"]
        for r in corpus.read_partitions(spark, "fp_pfx", batch_pfx).collect()
    }
    want = {
        r["fp"]
        for r in corpus.read(spark)
        .where(F.col("fp_pfx").isin(list(batch_pfx)))
        .collect()
    }
    assert got == want
    # end-to-end: the pruned anti-join still computes the right corpus
    source.append(_docs(spark, b2))
    _drain(spark, source, corpus, ckpt)
    all_rows = _docs(spark, b1 + b2)
    streamed = {tuple(r) for r in corpus.read(spark).drop("fp_pfx").collect()}
    batch = {tuple(r) for r in prep_batch(all_rows).collect()}
    assert streamed == batch


def test_corpus_stream_crash_replay_is_idempotent(spark, corpus_env):
    """The crash window: corpus commit landed, streaming checkpoint
    commit lost.  Spark re-runs the micro-batch; the batch-id-aware
    sink sees batch_id <= last_txn_version and no-ops, so no row is
    appended twice and a subsequent real batch still lands."""
    source, corpus, ckpt = corpus_env

    source.init(_docs(spark, [(1, GOOD, "web"), (2, NOISY, "spam")]))
    _drain(spark, source, corpus, ckpt)
    v_after = corpus._snapshot_version()
    want = _stats(spark, corpus)

    commits = sorted(
        c for c in os.listdir(os.path.join(ckpt, "commits"))
        if not c.startswith(".")
    )
    last = commits[-1]
    os.remove(os.path.join(ckpt, "commits", last))
    crc = os.path.join(ckpt, "commits", f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    _drain(spark, source, corpus, ckpt)  # Spark replays the batch
    assert _stats(spark, corpus) == want, "replayed batch appended twice"
    assert corpus._snapshot_version() == v_after, "replay committed again"

    # the pipeline is still live after the replay: a new batch lands
    source.append(_docs(spark, [(9, GOOD + " and then some", "web")]))
    _drain(spark, source, corpus, ckpt)
    assert {r["doc_id"] for r in corpus.read(spark).collect()} == {1, 9}


def test_auto_compaction_bounds_live_files(spark, corpus_env):
    """r8 VERDICT #3: with compact_every_n_commits=N, a stream driven
    for >=3N batches keeps the corpus table's live-file count bounded
    (merged + at most N recent appends) while the no-policy twin grows
    O(batches) -- and the rows stay exactly the batch recompute."""
    from nyc_crash_mapper_etl_script_spark.functions.text import doc_fingerprint

    source, corpus, ckpt = corpus_env

    # craft gate-passing docs that all share ONE fingerprint prefix,
    # so every batch appends a file into the SAME partition dir (the
    # accumulation the policy exists to bound).  Prefix discovered
    # from the real fingerprint function, not assumed.
    cands = spark.createDataFrame(
        [(i, GOOD + f" variant tail number {i}") for i in range(4000)],
        "i long, text string",
    ).select("i", "text", F.substring(doc_fingerprint(F.col("text")), 1, 2).alias("p"))
    by_p = {}
    for r in cands.collect():
        by_p.setdefault(r["p"], []).append((r["i"], r["text"]))
    texts = [t for (_, t) in max(by_p.values(), key=len)]
    assert len(texts) >= 12, "fixture: need 12 same-prefix docs"

    N = 2
    n_batches = 6  # 3N
    root2 = os.path.dirname(corpus.root)
    src_b = TxTable(os.path.join(root2, "docs_nopolicy"), retain_history=True)
    corp_b = TxTable(os.path.join(root2, "scored_nopolicy"))
    ckpt_b = os.path.join(root2, "ck_nopolicy")

    max_live = 0
    for b in range(n_batches):
        batch = _docs(
            spark,
            [(b * 2 + j, texts[b * 2 + j], "web") for j in range(2)],
        )
        (source.append if source.exists() else source.init)(batch)
        q = corpus_prep_stream(
            spark, source, corpus, ckpt,
            threshold_logit=-0.35,
            compact_every_n_commits=N,
        )
        q.awaitTermination(300)
        max_live = max(max_live, len(corpus._live_files()))
        (src_b.append if src_b.exists() else src_b.init)(batch)
        qb = corpus_prep_stream(spark, src_b, corp_b, ckpt_b, threshold_logit=-0.35)
        qb.awaitTermination(300)

    # bounded: merged file + at most N uncompacted appends (an append
    # may write a couple of files depending on task layout), ever
    assert max_live <= 2 * N + 1, max_live
    # the twin without the policy really does grow O(batches)
    assert len(corp_b._live_files()) >= n_batches
    assert len(corp_b._live_files()) > max_live
    # the policy actually fired, as compact_small commits
    ops = [e["op"] for e in corpus.history()]
    assert ops.count("compact_small") >= 2, ops
    # and rows are unchanged vs both the twin and the batch recompute
    pol = sorted(tuple(r) for r in corpus.read(spark).drop("fp_pfx").collect())
    twin = sorted(tuple(r) for r in corp_b.read(spark).drop("fp_pfx").collect())
    assert pol == twin
    all_docs = _docs(
        spark, [(i, texts[i], "web") for i in range(n_batches * 2)]
    )
    want = sorted(tuple(r) for r in prep_batch(all_docs).collect())
    assert pol == want


def test_log_retention_bounds_log_files(spark, corpus_env):
    """Round 9: with cleanup_log_keep_versions=N the corpus table's
    LOG listing stays bounded under continuous batches (checkpoint +
    trailing window), while results stay exactly the batch recompute
    -- the log-side twin of the compaction policy."""
    source, corpus, ckpt = corpus_env
    n_batches = 8
    keep = 2
    # checkpoint often so the retention window always has a cutoff
    corpus.checkpoint_every = 2
    for b in range(n_batches):
        batch = _docs(
            spark,
            [(b * 2 + j,
              GOOD + f" distinct tail {b * 2 + j} of the long story",
              "web") for j in range(2)],
        )
        (source.append if source.exists() else source.init)(batch)
        q = corpus_prep_stream(
            spark, source, corpus, ckpt,
            threshold_logit=-0.35,
            cleanup_log_keep_versions=keep,
        )
        q.awaitTermination(300)
        # the handle the SINK builds is fresh per batch; ours carries
        # the aggressive checkpoint cadence for the next loop turn
        corpus = TxTable(corpus.root, checkpoint_every=2)
    log_dir = os.path.join(corpus.root, "_txlog")
    entries = [
        n for n in os.listdir(log_dir)
        if n.endswith(".json") and not n.startswith(".")
    ]
    # bounded: at most keep + checkpoint cadence entries survive
    assert len(entries) <= keep + 2, sorted(entries)
    # and the table still reads exactly the batch recompute
    all_docs = _docs(
        spark,
        [(i, GOOD + f" distinct tail {i} of the long story", "web")
         for i in range(n_batches * 2)],
    )
    got = sorted(tuple(r) for r in corpus.read(spark).drop("fp_pfx").collect())
    want = sorted(tuple(r) for r in prep_batch(all_docs).collect())
    assert got == want
