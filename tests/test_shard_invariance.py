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
