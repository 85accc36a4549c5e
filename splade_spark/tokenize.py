"""Deterministic tokenizer + term-frequency extraction.

Replaces the reference's neural encoder (text → sparse term weights,
splade/models/transformer_rep.py:145-151): here the sparse representation is
lowercase [a-z0-9]+ tokens with BM25 weighting. Pure JVM-side Spark SQL —
lower / split / explode / groupBy — no Python in the hot path (whole-stage
codegen end to end). The (doc, term) count aggregation is the analogue of
the reference's splade_max pooling (reference agg over sequence positions;
ours: tf over token positions).

term_id is xxhash64(term): stable, shuffle-free (no global dictionary
build), collision probability ~n²/2^64 — negligible even at 10^9 distinct
terms. The stats table retains the term string for debugging/export.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens_col(text: Column) -> Column:
    """array<string> of lowercase alnum tokens; empties filtered."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != F.lit("")
    )


def tokenize(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Add tokens array + doc_len (token count)."""
    return documents.withColumn("tokens", tokens_col(F.col(text_col))).withColumn(
        "doc_len", F.size("tokens")
    )


def term_freqs(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term, term_id, tf, doc_len) — long-format sparse vectors.

    Reference analogue: torch.nonzero sparsification into COO triples
    (splade/tasks/transformer_evaluator.py:45-47). explode + groupBy has
    map-side partial aggregation, so the shuffle carries (doc, term)
    partial counts, not raw token rows.
    """
    toks = tokenize(documents)
    exploded = toks.select(id_col, "doc_len", F.explode("tokens").alias("term"))
    return (
        exploded.groupBy(id_col, "doc_len", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("term_id", F.xxhash64("term"))
    )


def scrub_terms(term_rows: DataFrame, sentinel_terms: list[str]) -> DataFrame:
    """P9 special-token scrub: drop sentinel/stopword terms from a term-row
    table (reference zeroes PAD/CLS/SEP/MASK dims,
    splade/utils/utils.py:92-104). JVM-side anti-filter on term string."""
    from pyspark.sql import functions as F

    return term_rows.filter(~F.col("term").isin(sentinel_terms))


def query_term_freqs(queries: DataFrame) -> DataFrame:
    """(query_id, term, term_id, qtf) — query-side sparse vectors.

    Duplicate query terms accumulate multiplicity (qtf), mirroring how the
    reference's query rep accumulates weight on repeated activations.
    """
    toks = tokenize(queries)
    return (
        toks.select("query_id", F.explode("tokens").alias("term"))
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("qtf"))
        .withColumn("term_id", F.xxhash64("term"))
    )
