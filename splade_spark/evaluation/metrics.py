"""Retrieval evaluation — MRR@k / recall@k / NDCG@k in DataFrame ops.

Reference computes these with pytrec_eval over {qid: {did: score}} dicts
(splade/utils/metrics.py:16-52, splade/evaluation/eval.py:7-23): mrr_10
truncates each run to 10 by score desc (metrics.py:7-13); recall is
|retrieved∩relevant|/|relevant|; ndcg uses linear gain (trec_eval
convention). Queries absent from the run score 0 for MRR/recall (pytrec_eval
averages over qrels queries).

All metrics are joins + windows + one avg — no Python in the loop, scales to
millions of queries (group keys are query_id; no skew risk since runs are
top-k-bounded per query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ranked(run: DataFrame) -> DataFrame:
    """Ensure a dense rank column under (score desc, doc_id asc)."""
    if "rank" in run.columns:
        return run
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return run.withColumn("rank", F.row_number().over(w))


def _positives(qrels: DataFrame) -> DataFrame:
    return qrels.filter(F.col("rel") >= 1)


def mrr_at_k(run: DataFrame, qrels: DataFrame, k: int = 10) -> float:
    """Mean reciprocal rank of the first relevant doc within top-k."""
    pos = _positives(qrels)
    ranked = _ranked(run).filter(F.col("rank") <= k)
    firsts = (
        ranked.join(pos, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg((1.0 / F.min("rank")).alias("rr"))
    )
    all_q = pos.select("query_id").distinct()
    per_q = all_q.join(firsts, "query_id", "left").select(
        F.coalesce("rr", F.lit(0.0)).alias("rr")
    )
    row = per_q.agg(F.avg("rr")).collect()[0]
    return float(row[0] or 0.0)


def recall_at_k(run: DataFrame, qrels: DataFrame, k: int = 100) -> float:
    pos = _positives(qrels)
    ranked = _ranked(run).filter(F.col("rank") <= k)
    hits = (
        ranked.join(pos, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("hits"))
    )
    denom = pos.groupBy("query_id").agg(F.count("*").alias("npos"))
    per_q = denom.join(hits, "query_id", "left").select(
        (F.coalesce("hits", F.lit(0)) / F.col("npos")).alias("recall")
    )
    row = per_q.agg(F.avg("recall")).collect()[0]
    return float(row[0] or 0.0)


def r_cap_at_k(run: DataFrame, qrels: DataFrame, k: int = 100) -> float:
    """Capped recall — BEIR's R_cap@k (reference splade/beir_eval.py:89-95,
    EvaluateRetrieval.evaluate_custom metric='r_cap'):
    |top-k ∩ relevant| / min(k, |relevant|) per query, averaged. The cap
    makes queries with more relevant docs than k reachable at 1.0.
    Averaged over qrels-positive queries (queries missing from the run
    score 0), consistent with mrr/recall here."""
    pos = _positives(qrels)
    ranked = _ranked(run).filter(F.col("rank") <= k)
    hits = (
        ranked.join(pos, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("hits"))
    )
    denom = pos.groupBy("query_id").agg(
        F.least(F.count("*"), F.lit(k)).alias("cap")
    )
    per_q = denom.join(hits, "query_id", "left").select(
        (F.coalesce("hits", F.lit(0)) / F.col("cap")).alias("r_cap")
    )
    row = per_q.agg(F.avg("r_cap")).collect()[0]
    return float(row[0] or 0.0)


def ndcg_at_k(run: DataFrame, qrels: DataFrame, k: int = 10) -> float:
    """NDCG@k with linear gain rel/log2(rank+1) (trec_eval ndcg)."""
    ranked = _ranked(run).filter(F.col("rank") <= k)
    dcg = (
        ranked.join(qrels, ["query_id", "doc_id"])
        .withColumn("g", F.col("rel") / F.log2(F.col("rank") + 1.0))
        .groupBy("query_id")
        .agg(F.sum("g").alias("dcg"))
    )
    ideal_w = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("doc_id").asc()
    )
    idcg = (
        _positives(qrels)
        .withColumn("irank", F.row_number().over(ideal_w))
        .filter(F.col("irank") <= k)
        .withColumn("g", F.col("rel") / F.log2(F.col("irank") + 1.0))
        .groupBy("query_id")
        .agg(F.sum("g").alias("idcg"))
    )
    per_q = idcg.join(dcg, "query_id", "left").select(
        (F.coalesce("dcg", F.lit(0.0)) / F.col("idcg")).alias("ndcg")
    )
    row = per_q.agg(F.avg("ndcg")).collect()[0]
    return float(row[0] or 0.0)


def evaluate(run: DataFrame, qrels: DataFrame, ks=(10, 100)) -> dict[str, float]:
    """Reference protocol bundle (splade/evaluate.py:12-42)."""
    out: dict[str, float] = {}
    for k in ks:
        out[f"mrr_{k}"] = mrr_at_k(run, qrels, k)
        out[f"recall_{k}"] = recall_at_k(run, qrels, k)
        out[f"ndcg_{k}"] = ndcg_at_k(run, qrels, k)
        out[f"r_cap_{k}"] = r_cap_at_k(run, qrels, k)
    return out
