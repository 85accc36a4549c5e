from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from splade_spark.pipeline.similarity import (
    brute_cosine_topk,
    cosine_near_dup_pairs,
    cosine_topk_sql,
    hyperplane_signatures,
    lsh_cosine_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def qvecs(emb):
    pdf = emb.orderBy("vec_id").limit(3).toPandas()
    return pd.DataFrame(
        {"query_id": [f"v{r.vec_id}" for r in pdf.itertuples()],
         "embedding": pdf["embedding"].tolist()}
    )


def test_brute_topk_matches_numpy(emb, qvecs):
    got = brute_cosine_topk(emb, qvecs, k=5).collect()
    pdf = emb.toPandas()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = pdf["vec_id"].to_numpy()
    q = np.array(qvecs["embedding"].tolist(), dtype=np.float64)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = mat @ q.T
    for qi, qid in enumerate(qvecs["query_id"]):
        order = np.lexsort((ids, -sims[:, qi]))[:5]
        expected = list(zip(ids[order].tolist(), np.round(sims[order, qi], 9)))
        mine = sorted(
            [(r.vec_id, round(r.cosine, 9)) for r in got if r.query_id == qid],
            key=lambda t: (-t[1], t[0]),
        )
        assert mine == expected
        # self-similarity rank 1 with cosine 1.0
        assert mine[0][0] == int(qid[1:]) and mine[0][1] == 1.0


def test_sql_variant_matches_kernel(emb, qvecs, spark):
    sql_queries = spark.createDataFrame(qvecs)
    a = brute_cosine_topk(emb, qvecs, k=5).collect()
    b = cosine_topk_sql(emb, sql_queries, k=5).collect()
    ka = sorted((r.query_id, r.rank, r.vec_id, round(r.cosine, 9)) for r in a)
    kb = sorted((r.query_id, r.rank, r.vec_id, round(r.cosine, 9)) for r in b)
    assert ka == kb


def test_lsh_topk_recall(emb, qvecs):
    exact = brute_cosine_topk(emb, qvecs, k=5).collect()
    approx = lsh_cosine_topk(emb, qvecs, k=5, nbits=8).collect()
    # self-match must always survive (identical vector → identical bucket)
    for qid in qvecs["query_id"]:
        a_ids = [r.vec_id for r in approx if r.query_id == qid]
        assert int(qid[1:]) in a_ids
    # recall sanity: at least half the exact top-5 found
    e_set = {(r.query_id, r.vec_id) for r in exact}
    a_set = {(r.query_id, r.vec_id) for r in approx}
    assert len(e_set & a_set) >= len(e_set) // 2


def test_signatures_deterministic(emb):
    s1 = {r.vec_id: r.bucket for r in hyperplane_signatures(emb, nbits=12).collect()}
    s2 = {r.vec_id: r.bucket for r in hyperplane_signatures(emb, nbits=12).collect()}
    assert s1 == s2


def test_near_dup_pairs(spark):
    rng = np.random.default_rng(0)
    base = rng.standard_normal(16)
    rows = [
        (0, base.tolist()),
        (1, (base * 2.0).tolist()),            # cosine 1.0 with 0
        (2, (base + rng.standard_normal(16) * 0.01).tolist()),  # near dup
        (3, rng.standard_normal(16).tolist()),  # unrelated
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = cosine_near_dup_pairs(df, tau=0.99, nbits=8, dim=16)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got
    assert not any(3 in p for p in got)


def test_near_dup_bucket_cap_degenerate_corpus(spark):
    """Skew guard: a corpus whose embeddings all collapse into ONE LSH
    bucket (identical vectors — no hyperplane can split them) must not go
    quadratic. With max_bucket_size set, oversized buckets switch to
    star linking against the min-id representative: candidate count is
    linear (n-1 pairs), and every member still gets its duplicate edge."""
    n = 200
    vec = np.random.default_rng(1).standard_normal(16).tolist()
    rows = [(i, vec) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = cosine_near_dup_pairs(
        df, tau=0.99, nbits=8, dim=16, max_bucket_size=20
    ).collect()
    # linear, not quadratic: exactly n-1 representative edges
    assert len(pairs) == n - 1
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, i) for i in range(1, n)}
    assert all(abs(r.cosine - 1.0) < 1e-9 for r in pairs)


def test_harness_capped_entry_exercises_both_branches(spark):
    """The emb_near_dup_capped harness query claims BOTH code paths run at
    sf0.01 (buckets straddle max_bucket_size=30 under its exact params).
    Pin that claim: if a fixture regeneration ever collapses the bucket
    distribution to one side, the oracle would still match (both sides
    take the same branch) but the harness entry would silently stop
    covering the split — fail here instead."""
    emb01 = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    sizes = (
        hyperplane_signatures(emb01, nbits=4, dim=64)
        .groupBy("bucket").count().select("count").toPandas()["count"]
    )
    assert (sizes <= 30).any() and (sizes > 30).any()


def test_near_dup_bucket_cap_preserves_small_bucket_semantics(spark):
    """Buckets under the cap keep exact all-pairs semantics: with a cap
    larger than any bucket, results are identical to the uncapped path."""
    rng = np.random.default_rng(2)
    base = rng.standard_normal(16)
    rows = [(i, (base + rng.standard_normal(16) * 0.005).tolist()) for i in range(8)]
    rows += [(100 + i, rng.standard_normal(16).tolist()) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    uncapped = {
        (r.id_a, r.id_b, round(r.cosine, 9))
        for r in cosine_near_dup_pairs(df, tau=0.99, nbits=8, dim=16).collect()
    }
    capped = {
        (r.id_a, r.id_b, round(r.cosine, 9))
        for r in cosine_near_dup_pairs(
            df, tau=0.99, nbits=8, dim=16, max_bucket_size=1000
        ).collect()
    }
    assert uncapped == capped and len(uncapped) > 0


def test_kmeans_early_exit_identical():
    """The stable-assignment early exit returns exactly the centroids the
    fixed-iteration loop produced (an unchanged assignment recomputes the
    same centroids, so later rounds are no-ops) — and on a well-separated
    sample it converges in fewer than the 8 fixed rounds."""
    import numpy as np

    from splade_spark.pipeline.similarity import _kmeans, _normalize

    rng = np.random.default_rng(3)
    centers = _normalize(rng.standard_normal((4, 16)))
    pts = np.repeat(centers, 50, axis=0) + 0.01 * rng.standard_normal((200, 16))
    pts = _normalize(pts)

    got = _kmeans(pts, 4, iters=8)

    # reference: the pre-round-6 fixed-iteration loop
    ref_rng = np.random.default_rng(42)
    idx = ref_rng.choice(len(pts), size=4, replace=False)
    cent = pts[idx].copy()
    for _ in range(8):
        assign = (pts @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = pts[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    assert np.array_equal(got, cent)
