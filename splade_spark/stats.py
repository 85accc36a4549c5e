"""Corpus / index statistics.

Reference analogues: index_dist.json (posting lengths,
splade/indexing/inverted_index.py:90-94), index_stats.json (mean L0,
splade/tasks/transformer_evaluator.py:63-65), FLOPS estimate
(splade/flops.py:16-28,56-60).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_stats(term_freqs: DataFrame) -> tuple[int, float]:
    """(N docs, avgdl). One small two-agg job over distinct docs.

    Shape note: this shuffles the (doc_id, doc_len) projection of the term
    table — postings-cardinality rows — to recover two scalars. When the
    upstream documents DataFrame is at hand, prefer
    ``corpus_stats_from_docs``: same two scalars, map-only scan, no
    shuffle (the difference between a two-scalar job and an exabyte-scale
    exchange at 10^12 docs)."""
    row = (
        term_freqs.groupBy("doc_id")
        .agg(F.first("doc_len").alias("dl"))
        .agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))
        .collect()[0]
    )
    return int(row["n"]), float(row["avgdl"] or 0.0)


def corpus_stats_from_docs(
    documents: DataFrame, text_col: str = "text"
) -> tuple[int, float]:
    """(N docs, avgdl) straight from the documents table — no shuffle.

    Bit-identical to ``corpus_stats(term_freqs(documents))``: docs that
    tokenize to zero tokens produce no term rows, so both paths exclude
    them, and Spark's avg over an int column sums in exact int64 before
    one double divide — no float-summation-order dependence. The plan is
    a map-only tokenize+size projection with a partial-aggregated global
    agg (one single-row exchange) instead of a full shuffle of the term
    table's (doc_id, doc_len) projection."""
    from .tokenize import tokens_col

    row = (
        documents.select(F.size(tokens_col(F.col(text_col))).alias("dl"))
        .filter(F.col("dl") > 0)
        .agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))
        .collect()[0]
    )
    return int(row["n"]), float(row["avgdl"] or 0.0)


def doc_freqs(term_freqs: DataFrame) -> DataFrame:
    """(term, term_id, df): document frequency per term (exact)."""
    return term_freqs.groupBy("term", "term_id").agg(F.count("*").alias("df"))


def idf_col(df_col, n_docs: int):
    """BM25 idf = ln(1 + (N - df + 0.5)/(df + 0.5))."""
    return F.log(1.0 + (F.lit(float(n_docs)) - df_col + 0.5) / (df_col + 0.5))


def idf_value(df: int, n_docs: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def index_dist(term_freqs: DataFrame) -> DataFrame:
    """Posting-list length per term — the Zipf-skew evidence the build
    stage uses for head-term splitting (reference: index_dist.json +
    splade/utils/index_figure.py:21-29)."""
    return term_freqs.groupBy("term_id").agg(F.count("*").alias("posting_len"))


def l0_stats(term_freqs: DataFrame) -> DataFrame:
    """Mean number of non-zero terms per doc (reference: mean L0,
    splade/losses/regularization.py:10-15)."""
    return (
        term_freqs.groupBy("doc_id")
        .agg(F.count("*").alias("l0"))
        .agg(F.avg("l0").alias("mean_l0"), F.count("*").alias("n_docs"))
    )


def flops(doc_terms: DataFrame, query_terms: DataFrame) -> float:
    """FLOPS = Σ_t p_d(t)·p_q(t) with p = activation probability
    (reference: splade/flops.py:16-28,56-60). Full outer join on term_id —
    missing side contributes 0, so inner join suffices for the sum."""
    n_d = doc_terms.select("doc_id").distinct().count()
    n_q = query_terms.select("query_id").distinct().count()
    if n_d == 0 or n_q == 0:
        return 0.0
    pd_ = doc_terms.groupBy("term_id").agg((F.count("*") / n_d).alias("p_d"))
    pq_ = query_terms.groupBy("term_id").agg((F.count("*") / n_q).alias("p_q"))
    row = (
        pd_.join(pq_, "term_id")
        .agg(F.sum(F.col("p_d") * F.col("p_q")).alias("flops"))
        .collect()[0]
    )
    return float(row["flops"] or 0.0)
