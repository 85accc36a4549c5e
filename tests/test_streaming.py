from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from splade_spark.bm25 import bm25_topk, bm25_weights, quantization_scale, quantize
from splade_spark.fixtures import queries_df, transcripts
from splade_spark.index.merge import merge_indexes
from splade_spark.query.wand import retrieve
from splade_spark.stats import corpus_stats
from splade_spark.streaming.incremental import (
    FrozenStats,
    list_segments,
    load_all_postings,
    start_incremental_indexer,
)
from splade_spark.tokenize import query_term_freqs, term_freqs


def test_incremental_indexing_end_to_end(spark, tmp_path):
    """Transcript files land in a directory → streaming indexer builds
    docID-disjoint segments → querying the segment union is exact, and a
    tiered merge of the segments equals querying the union."""
    land = str(tmp_path / "landing")
    base = str(tmp_path / "incr")
    all_t = transcripts(spark, 120, partitions=4).cache()

    # freeze stats over the full corpus (what a base build would have seen)
    from splade_spark.documents import build_documents

    docs_all = build_documents(all_t).cache()
    tf_all = term_freqs(docs_all).cache()
    n, avgdl = corpus_stats(tf_all)
    w_all = bm25_weights(tf_all, n, avgdl)
    scale = quantization_scale(w_all)
    df_path = str(tmp_path / "frozen_df")
    tf_all.groupBy("term_id").agg(F.count("*").alias("df")).write.parquet(df_path)
    stats = FrozenStats(n, avgdl, scale, df_path)

    # first wave of files, then run the AvailableNow stream
    all_t.filter(F.col("conv_id") < "conv-00000060").write.mode("overwrite").parquet(
        land
    )
    q = start_incremental_indexer(spark, land, base, stats, num_shards=4)
    q.awaitTermination(120)
    segs1 = list_segments(base)
    assert len(segs1) >= 1

    # second wave → new segment(s), doc ids continue above the watermark
    all_t.filter(F.col("conv_id") >= "conv-00000060").write.mode("append").parquet(
        land
    )
    q2 = start_incremental_indexer(spark, land, base, stats, num_shards=4)
    q2.awaitTermination(120)
    segs2 = list_segments(base)
    assert len(segs2) > len(segs1)

    postings = load_all_postings(spark, base).cache()
    # all 120 conversations indexed exactly once
    from splade_spark.index.build import index_dist_from_postings

    total_docs = (
        spark.read.parquet(*[s + "_docmap" for s in segs2]).select("doc_id").distinct()
    )
    assert total_docs.count() == 120

    # engine over segment union == oracle with the same frozen stats over
    # the same docs (doc ids may be permuted vs the batch build, so compare
    # by conv_id)
    qt = query_term_freqs(queries_df(spark)).cache()
    engine = retrieve(postings, qt, scale, k=10).cache()
    docmap = spark.read.parquet(*[s + "_docmap" for s in segs2])
    engine_ext = engine.join(docmap, "doc_id").select(
        "query_id", "conv_id", F.round("score", 6).alias("score")
    )

    # oracle: recompute weights per segment-doc mapping — same frozen stats
    seg_docs = spark.read.parquet(*[s + "_docmap" for s in segs2])
    docs_renum = docs_all.drop("doc_id").join(seg_docs, "conv_id")
    tf_renum = term_freqs(docs_renum)
    w_renum = quantize(bm25_weights(tf_renum, n, avgdl), scale)
    oracle = bm25_topk(w_renum, qt, k=10, scale=scale).join(docmap, "doc_id").select(
        "query_id", "conv_id", F.round("score", 6).alias("score")
    )
    assert sorted(map(tuple, engine_ext.collect())) == sorted(
        map(tuple, oracle.collect())
    )

    # tiered merge of all segments == querying the union
    merged = str(tmp_path / "merged")
    merge_indexes(spark, segs2, merged)
    res_m = retrieve(spark.read.parquet(merged), qt, scale, k=10)
    assert sorted(map(tuple, res_m.collect())) == sorted(map(tuple, engine.collect()))
