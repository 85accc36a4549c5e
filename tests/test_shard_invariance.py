from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from splade_spark.bm25 import bm25_weights, quantization_scale
from splade_spark.fixtures import queries_df
from splade_spark.index.build import build_index, load_postings
from splade_spark.query.wand import retrieve
from splade_spark.stats import corpus_stats
from splade_spark.tokenize import query_term_freqs, term_freqs


def test_results_invariant_to_shard_count(spark, tiny_documents, tmp_path):
    """The document-sharded layout is a physical choice only: top-k results
    (ranks AND scores) must be identical for any num_shards, including the
    degenerate single-shard index."""
    tf = term_freqs(tiny_documents).cache()
    n, avgdl = corpus_stats(tf)
    w = bm25_weights(tf, n, avgdl).cache()
    scale = quantization_scale(w)
    qt = query_term_freqs(queries_df(spark)).cache()

    results = {}
    for shards in [1, 5, 32]:
        path = str(tmp_path / f"idx_{shards}")
        build_index(
            w.select("doc_id", "term_id", "weight"), path, scale, num_shards=shards
        )
        res = retrieve(load_postings(spark, path), qt, scale, k=15)
        results[shards] = sorted(
            (r.query_id, r.rank, r.doc_id, round(r.score, 9)) for r in res.collect()
        )
    assert results[1] == results[5] == results[32]


def test_head_term_skew_split_bound(spark, tiny_documents, tmp_path):
    """Skew handling by construction: the largest per-(shard, term) posting
    group is bounded by ceil(df/num_shards) — a head term present in every
    document still splits evenly across shards."""
    import math

    tf = term_freqs(tiny_documents).cache()
    n, avgdl = corpus_stats(tf)
    w = bm25_weights(tf, n, avgdl)
    scale = quantization_scale(w)
    shards = 8
    path = str(tmp_path / "skew_idx")
    build_index(w.select("doc_id", "term_id", "weight"), path, scale, num_shards=shards)
    postings = load_postings(spark, path)
    group_sizes = postings.groupBy("shard_id", "term_id").agg(
        F.sum("n").alias("g")
    )
    dfs = tf.groupBy("term_id").agg(F.count("*").alias("df"))
    # modulo sharding balances head terms (the skew risk) tightly: no
    # (shard, head-term) group may exceed 2x the even split. Tail terms
    # (df < shards*4) are tiny by definition and exempt.
    worst = (
        group_sizes.join(dfs, "term_id")
        .filter(F.col("df") >= shards * 4)
        .withColumn("bound", 2 * F.ceil(F.col("df") / shards))
        .filter(F.col("g") > F.col("bound"))
        .count()
    )
    assert worst == 0
    # and the head term (df == n_docs) really is split across every shard
    head = dfs.orderBy(F.col("df").desc()).first()
    assert head["df"] == 100  # fixture head terms appear in all docs
    spread = group_sizes.filter(F.col("term_id") == head["term_id"]).count()
    assert spread == shards


def test_block_size_invariance(spark, tiny_documents, tmp_path):
    """Block size is a physical layout knob — results must not change."""
    tf = term_freqs(tiny_documents)
    n, avgdl = corpus_stats(tf)
    w = bm25_weights(tf, n, avgdl).cache()
    scale = quantization_scale(w)
    qt = query_term_freqs(queries_df(spark)).cache()
    results = {}
    for bs in [8, 128]:
        path = str(tmp_path / f"idx_bs{bs}")
        build_index(
            w.select("doc_id", "term_id", "weight"),
            path,
            scale,
            num_shards=4,
            block_size=bs,
        )
        res = retrieve(load_postings(spark, path), qt, scale, k=15)
        results[bs] = sorted(
            (r.query_id, r.rank, r.doc_id, round(r.score, 9)) for r in res.collect()
        )
    assert results[8] == results[128]
