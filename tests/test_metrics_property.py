"""Property cross-check of the DataFrame metrics against an independent
dict-based implementation of the trec_eval conventions.

pytrec_eval (the reference's scorer, splade/utils/metrics.py:16-43) is not
installable in this image, so the second implementation below follows the
published trec_eval definitions directly — recip_rank, recall@k, ndcg with
linear gain — and serves as the independent referee: same inputs, two
implementations, exact agreement required. test_metrics.py keeps the
importorskip'd pytrec_eval test for environments that have the C extension.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from splade_spark.evaluation.metrics import (
    mrr_at_k,
    ndcg_at_k,
    r_cap_at_k,
    recall_at_k,
)


# --- independent reference implementation (pure dicts, no Spark) ----------


def _ranked_docs(run: dict[str, dict[str, float]], k: int) -> dict[str, list[str]]:
    """trec_eval ordering: score desc, then doc_id asc for ties."""
    return {
        q: [d for d, _ in sorted(ds.items(), key=lambda kv: (-kv[1], kv[0]))][:k]
        for q, ds in run.items()
    }


def ref_mrr(run, qrels, k):
    pos = {q: {d for d, r in ds.items() if r >= 1} for q, ds in qrels.items()}
    qs = [q for q in pos if pos[q]]
    ranked = _ranked_docs(run, k)
    total = 0.0
    for q in qs:
        for i, d in enumerate(ranked.get(q, []), start=1):
            if d in pos[q]:
                total += 1.0 / i
                break
    return total / max(1, len(qs))


def ref_recall(run, qrels, k, cap=False):
    pos = {q: {d for d, r in ds.items() if r >= 1} for q, ds in qrels.items()}
    qs = [q for q in pos if pos[q]]
    ranked = _ranked_docs(run, k)
    total = 0.0
    for q in qs:
        hits = len(set(ranked.get(q, [])) & pos[q])
        denom = min(k, len(pos[q])) if cap else len(pos[q])
        total += hits / denom
    return total / max(1, len(qs))


def ref_ndcg(run, qrels, k):
    pos = {q: {d: r for d, r in ds.items() if r >= 1} for q, ds in qrels.items()}
    qs = [q for q in pos if pos[q]]
    ranked = _ranked_docs(run, k)
    total = 0.0
    for q in qs:
        rels = qrels[q]
        dcg = sum(
            rels.get(d, 0) / math.log2(i + 1)
            for i, d in enumerate(ranked.get(q, []), start=1)
        )
        ideal = sorted(pos[q].items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        idcg = sum(r / math.log2(i + 1) for i, (_, r) in enumerate(ideal, start=1))
        total += dcg / idcg if idcg > 0 else 0.0
    return total / max(1, len(qs))


# --- strategies -------------------------------------------------------------

_doc_ids = st.integers(min_value=0, max_value=14).map(str)


@st.composite
def run_and_qrels(draw):
    n_q = draw(st.integers(min_value=1, max_value=4))
    run, qrels = {}, {}
    for qi in range(n_q):
        q = f"q{qi}"
        docs = draw(st.lists(_doc_ids, min_size=0, max_size=8, unique=True))
        # distinct scores: trec_eval tie order (score desc, doc asc) is
        # matched by both impls, but float-identical scores across the
        # Spark/py boundary are the only honest tie source
        scores = draw(
            st.lists(
                st.integers(min_value=0, max_value=30),
                min_size=len(docs), max_size=len(docs),
            )
        )
        run[q] = {d: float(s) for d, s in zip(docs, scores)}
        rel_docs = draw(st.lists(_doc_ids, min_size=0, max_size=5, unique=True))
        rels = draw(
            st.lists(
                st.integers(min_value=0, max_value=3),
                min_size=len(rel_docs), max_size=len(rel_docs),
            )
        )
        qd = {d: r for d, r in zip(rel_docs, rels)}
        if qd:
            qrels[q] = qd
    if not any(r >= 1 for ds in qrels.values() for r in ds.values()):
        qrels.setdefault("q0", {})["0"] = 1
    return run, qrels


def _to_dfs(spark, run, qrels):
    run_rows = [
        (q, d, s) for q, ds in run.items() for d, s in ds.items()
    ]
    qrel_rows = [
        (q, d, r) for q, ds in qrels.items() for d, r in ds.items()
    ]
    run_df = spark.createDataFrame(
        run_rows or [("qx", "dx", 0.0)],
        "query_id string, doc_id string, score double",
    )
    qrel_df = spark.createDataFrame(
        qrel_rows, "query_id string, doc_id string, rel int"
    )
    return run_df, qrel_df


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=run_and_qrels(), k=st.sampled_from([1, 3, 10]))
def test_metrics_match_reference_impl(spark, data, k):
    run, qrels = data
    run_df, qrel_df = _to_dfs(spark, run, qrels)
    assert abs(mrr_at_k(run_df, qrel_df, k) - ref_mrr(run, qrels, k)) < 1e-9
    assert abs(recall_at_k(run_df, qrel_df, k) - ref_recall(run, qrels, k)) < 1e-9
    assert (
        abs(r_cap_at_k(run_df, qrel_df, k) - ref_recall(run, qrels, k, cap=True))
        < 1e-9
    )
    assert abs(ndcg_at_k(run_df, qrel_df, k) - ref_ndcg(run, qrels, k)) < 1e-9
