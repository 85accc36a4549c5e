"""Static index pruning — lossy compression passes over the weights table.

Reference analogues (offline passes over the HDF5 index):
- value pruning: drop postings with weight <= v
  (pruning/prune_doc_index.py:12-14, threshold v*100 on quantized impacts)
- per-doc top-k ("size") pruning: keep each doc's size_to_prune
  highest-weight terms (pruning/prune_doc_index.py:17-19)
- quantile pruning: per-term weight quantile as threshold
  (pruning/prune_quantile.py:42-43,14-16)

All run on the long-format (doc_id, term_id, weight) table *before* block
encoding, so the pruned index rebuilds through the normal build path. Each
is a single filter / window / groupBy-join — Catalyst handles pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prune_by_value(weights: DataFrame, v: float) -> DataFrame:
    """Keep postings with weight > v."""
    return weights.filter(F.col("weight") > v)


def prune_doc_topk(weights: DataFrame, k: int) -> DataFrame:
    """Keep each document's k highest-weight terms (ties: term_id asc)."""
    w = Window.partitionBy("doc_id").orderBy(
        F.col("weight").desc(), F.col("term_id").asc()
    )
    return (
        weights.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def prune_quantile(weights: DataFrame, q: float, exact: bool = True) -> DataFrame:
    """Per-term quantile threshold: keep weight > quantile_q(term weights).

    exact=True uses `percentile` (exact, needed for rank-identity tests);
    False uses `percentile_approx` (sketch-based, the 100 TB path — one
    pass, bounded memory per term)."""
    fn = "percentile" if exact else "percentile_approx"
    th = weights.groupBy("term_id").agg(
        F.expr(f"{fn}(weight, {q})").alias("_th")
    )
    return (
        weights.join(th, "term_id")
        .filter(F.col("weight") > F.col("_th"))
        .drop("_th")
    )
