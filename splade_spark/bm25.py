"""Exact BM25 oracle — pure DataFrame ops.

This is the engine's correctness reference: the same semantics as the
reference's exact numba TAAT kernel (scores[doc] += q_w * d_w over all
postings of all query terms, splade/tasks/transformer_evaluator.py:92-111)
followed by top-k selection (argpartition, :83-90), expressed as
broadcast-join + groupBy-sum + window row_number. The compressed block-max
WAND engine (splade_spark.query.wand) must be rank-identical to this under
the total order (score desc, doc_id asc) — the reference's argpartition is
unstable on ties, so we fix the order explicitly (SURVEY.md §2.5).

Plan shape at scale: query side is tiny → broadcast hash join against the
(doc, term) table; groupBy(query, doc) sum has map-side combine; the window
top-k per query is a partial TopK (Spark pushes a per-partition limit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import BM25_K1, BM25_B
from .stats import idf_col


def bm25_weights(
    term_freqs: DataFrame,
    n_docs: int,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
    df_table: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, term, term_id, weight): the per-(doc,term) BM25 impact.

    weight = idf(term) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
    This is the graft analogue of the reference's learned impact scores
    (SURVEY.md §2.4 A1); df comes from a groupBy + window-free join.

    df_table: optional frozen (term_id, df) statistics — incremental
    segment builds must score against base-corpus document frequencies,
    not the micro-batch's own (terms unseen in the base get df=0).
    """
    if df_table is not None:
        df_tbl = term_freqs.select("term_id").distinct().join(
            df_table.select("term_id", "df"), "term_id", "left"
        ).select("term_id", F.coalesce("df", F.lit(0)).alias("df"))
    else:
        df_tbl = term_freqs.groupBy("term_id").agg(F.count("*").alias("df"))
    tf = F.col("tf").cast("double")
    norm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * F.col("doc_len") / avgdl))
    return (
        term_freqs.join(df_tbl, "term_id")
        .withColumn("weight", idf_col(F.col("df"), n_docs) * norm)
        .select("doc_id", "term", "term_id", "weight")
    )


def quantization_scale(weights: DataFrame, bits: int = 8) -> float:
    """Global u8/u16 scale: levels / max weight (PISA-style --scorer
    quantized, efficient_splade_pisa/README.md:35-36)."""
    wmax = weights.agg(F.max("weight")).collect()[0][0]
    if not wmax:
        return 1.0
    return float((2**bits - 1) / wmax)


def quantize(weights: DataFrame, scale: float) -> DataFrame:
    """Quantize the weight column to the *integer* impact domain
    (weight ← round(weight·scale), still double-typed but integer-valued).

    Scoring then happens on exact integers (doubles hold integers exactly
    to 2^53), and ``bm25_topk(..., scale=scale)`` divides the final sum —
    so the oracle and the compressed engine produce bit-identical scores
    regardless of float summation order. This mirrors PISA's
    `--scorer quantized` (efficient_splade_pisa/README.md:35-36).

    bround (HALF_EVEN) — NOT F.round (HALF_UP) — so this path shares one
    rounding mode with the index encoder's np.rint (codec.quantize_weights),
    keeping the engine==oracle invariant exact even for weight*scale
    products landing exactly on .5."""
    return weights.withColumn("weight", F.bround(F.col("weight") * scale))


def bm25_topk(
    weights: DataFrame,
    query_terms: DataFrame,
    k: int = 10,
    threshold: float = 0.0,
    scale: float | None = None,
) -> DataFrame:
    """(query_id, doc_id, score, rank): exact top-k BM25.

    query_terms: (query_id, term_id, qtf) — broadcast (tens of rows/query).
    threshold mirrors the reference's post-score filter
    (splade/tasks/transformer_evaluator.py:109-111; conf threshold key).
    scale: if the weights were integer-quantized via ``quantize``, pass the
    same scale — scores are divided back into the BM25 domain after the
    exact integer sum.
    """
    scored = (
        weights.join(F.broadcast(query_terms), "term_id")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("qtf") * F.col("weight")).alias("score"))
    )
    if scale:
        scored = scored.withColumn("score", F.col("score") / F.lit(float(scale)))
    # reference semantics: strictly-greater filter, applied even at 0
    # (torch.nonzero(scores > threshold), transformer_evaluator.py:109-111)
    scored = scored.filter(F.col("score") > threshold)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
