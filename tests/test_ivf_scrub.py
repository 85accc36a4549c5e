from __future__ import annotations

import pandas as pd
import pytest

from splade_spark.pipeline.similarity import brute_cosine_topk, ivf_cosine_topk
from splade_spark.tokenize import scrub_terms, term_freqs


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


def test_ivf_exact_when_probing_all(spark, emb):
    q = emb.orderBy("vec_id").limit(3).toPandas()
    qv = pd.DataFrame(
        {"query_id": [f"v{r.vec_id}" for r in q.itertuples()],
         "embedding": q["embedding"].tolist()}
    )
    exact = brute_cosine_topk(emb, qv, k=5).collect()
    ivf_all = ivf_cosine_topk(emb, qv, k=5, n_centroids=8, nprobe=8).collect()
    assert sorted((r.query_id, r.rank, r.vec_id) for r in exact) == sorted(
        (r.query_id, r.rank, r.vec_id) for r in ivf_all
    )


def test_ivf_partial_probe_recall(spark, emb):
    q = emb.orderBy("vec_id").limit(3).toPandas()
    qv = pd.DataFrame(
        {"query_id": [f"v{r.vec_id}" for r in q.itertuples()],
         "embedding": q["embedding"].tolist()}
    )
    approx = ivf_cosine_topk(emb, qv, k=5, n_centroids=8, nprobe=3).collect()
    # self-match always survives: the query vector routes to its own cell
    for qid in qv["query_id"]:
        ids = [r.vec_id for r in approx if r.query_id == qid]
        assert int(qid[1:]) in ids
    exact = brute_cosine_topk(emb, qv, k=5).collect()
    e = {(r.query_id, r.vec_id) for r in exact}
    a = {(r.query_id, r.vec_id) for r in approx}
    assert len(e & a) >= len(e) // 2


def test_scrub_terms(spark):
    docs = spark.createDataFrame(
        [(1, "the cat and the mat"), (2, "and or not")], "doc_id long, text string"
    )
    tf = term_freqs(docs)
    out = scrub_terms(tf, ["the", "and", "or", "not"])
    kept = {r.term for r in out.collect()}
    assert kept == {"cat", "mat"}
