from __future__ import annotations

import math

import pytest

from splade_spark.evaluation.metrics import evaluate, mrr_at_k, ndcg_at_k, recall_at_k


@pytest.fixture(scope="module")
def run_and_qrels(spark):
    # q1: relevant docs 1 (rel=2), 3 (rel=1); run ranks: 2→1, 1→2, 3→3
    # q2: relevant doc 9; run misses it entirely
    # q3: relevant doc 5; q3 absent from run
    run = spark.createDataFrame(
        [
            ("q1", "2", 9.0, 1),
            ("q1", "1", 8.0, 2),
            ("q1", "3", 7.0, 3),
            ("q2", "4", 5.0, 1),
            ("q2", "6", 4.0, 2),
        ],
        "query_id string, doc_id string, score double, rank int",
    )
    qrels = spark.createDataFrame(
        [("q1", "1", 2), ("q1", "3", 1), ("q2", "9", 1), ("q3", "5", 1), ("q1", "7", 0)],
        "query_id string, doc_id string, rel int",
    )
    return run, qrels


def test_mrr(run_and_qrels):
    run, qrels = run_and_qrels
    # q1: first relevant at rank 2 → 0.5; q2: 0; q3: 0 → mean = 1/6
    assert abs(mrr_at_k(run, qrels, 10) - (0.5 / 3)) < 1e-12
    # at k=1 nothing relevant in rank 1 → 0
    assert mrr_at_k(run, qrels, 1) == 0.0


def test_recall(run_and_qrels):
    run, qrels = run_and_qrels
    # q1: 2/2 found; q2: 0/1; q3: 0/1 → mean = 1/3
    assert abs(recall_at_k(run, qrels, 10) - (1.0 / 3)) < 1e-12
    # k=2: q1 finds doc1 only → 0.5/3
    assert abs(recall_at_k(run, qrels, 2) - (0.5 / 3)) < 1e-12


def test_ndcg(run_and_qrels):
    run, qrels = run_and_qrels
    # q1 dcg = 2/log2(3) + 1/log2(4); idcg = 2/log2(2) + 1/log2(3)
    dcg = 2 / math.log2(3) + 1 / math.log2(4)
    idcg = 2 / math.log2(2) + 1 / math.log2(3)
    expected = (dcg / idcg + 0.0 + 0.0) / 3
    assert abs(ndcg_at_k(run, qrels, 10) - expected) < 1e-12


def test_r_cap(run_and_qrels):
    from splade_spark.evaluation.metrics import r_cap_at_k

    run, qrels = run_and_qrels
    # k=10: caps are min(10, npos) = npos → identical to recall
    assert abs(r_cap_at_k(run, qrels, 10) - (1.0 / 3)) < 1e-12
    # k=1: q1 cap=min(1,2)=1, top-1 is doc 2 (not relevant) → 0;
    # q2 cap=1 miss → 0; q3 absent → 0
    assert r_cap_at_k(run, qrels, 1) == 0.0
    # k=2: q1 cap=2, finds doc1 → 1/2; others 0 → mean 1/6
    assert abs(r_cap_at_k(run, qrels, 2) - (0.5 / 3)) < 1e-12


def test_r_cap_caps_denominator(spark):
    """A query with more relevant docs than k can still reach 1.0 — the
    defining difference from plain recall@k."""
    from splade_spark.evaluation.metrics import r_cap_at_k, recall_at_k

    run = spark.createDataFrame(
        [("q", str(i), 10.0 - i, i) for i in range(1, 3)],
        "query_id string, doc_id string, score double, rank int",
    )
    qrels = spark.createDataFrame(
        [("q", str(i), 1) for i in range(1, 6)],
        "query_id string, doc_id string, rel int",
    )
    assert abs(r_cap_at_k(run, qrels, 2) - 1.0) < 1e-12
    assert abs(recall_at_k(run, qrels, 2) - 0.4) < 1e-12


def test_evaluate_bundle(run_and_qrels):
    run, qrels = run_and_qrels
    out = evaluate(run, qrels, ks=(10,))
    assert set(out) == {"mrr_10", "recall_10", "ndcg_10", "r_cap_10"}


def test_pytrec_eval_cross_check(run_and_qrels):
    pytrec_eval = pytest.importorskip("pytrec_eval")
    run, qrels = run_and_qrels
    run_d: dict = {}
    for r in run.collect():
        run_d.setdefault(r.query_id, {})[r.doc_id] = r.score
    qrel_d: dict = {}
    for r in qrels.collect():
        qrel_d.setdefault(r.query_id, {})[r.doc_id] = r.rel
    ev = pytrec_eval.RelevanceEvaluator(qrel_d, {"recip_rank", "recall_10"})
    res = ev.evaluate(run_d)
    mean_rr = sum(v["recip_rank"] for v in res.values()) / len(qrel_d)
    assert abs(mrr_at_k(run, qrels, 1000) - mean_rr) < 1e-9
