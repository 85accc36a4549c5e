"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.01 and compare against oracle_sql() in DuckDB — row counts,
column names, and exact values (order-insensitive)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # collapse float noise one decimal past the queries' own rounding
        return round(v, 7)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 7)
    except ImportError:
        pass
    return v


def _normalize(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    qfn = entrymod.queries()[name]
    got = qfn(spark, SF_DIR).toPandas()
    exp = duck.execute(entrymod.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: {len(got)} rows vs oracle {len(exp)}"
    g, e = _normalize(got), _normalize(exp)
    mism = [i for i, (a, b) in enumerate(zip(g, e)) if a != b]
    assert not mism, f"{name}: first mismatch {g[mism[0]]} vs {e[mism[0]]}"


def test_all_queries_have_callable():
    qs = entrymod.queries()
    assert set(entrymod.oracle_sql()) <= set(qs)
    assert len(qs) >= 20


def test_rows_only_queries_run(spark):
    qs = entrymod.queries()
    # round 2: every harness query carries a DuckDB oracle — keep this
    # loop as the guard that a future rows-only entry at least executes
    assert set(qs) == set(entrymod.oracle_sql()), (
        "all harness queries are expected to be oracle-checked"
    )
    for name in set(qs) - set(entrymod.oracle_sql()):
        df = qs[name](spark, SF_DIR)
        assert df.count() >= 0 and len(df.columns) > 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_engine_rank_identical_at_sf001(spark, tmp_path):
    """Driver-scale rank-identity: the compressed-index + WAND engine equals
    the quantized DataFrame oracle on the sf0.01 documents corpus."""
    from pyspark.sql import functions as F

    from splade_spark.bm25 import bm25_topk, bm25_weights, quantization_scale, quantize
    from splade_spark.index.build import build_index, load_postings
    from splade_spark.query.wand import retrieve
    from splade_spark.stats import corpus_stats
    from splade_spark.tokenize import term_freqs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    tf = term_freqs(docs).cache()
    n, avgdl = corpus_stats(tf)
    w = bm25_weights(tf, n, avgdl).withColumn("term_id", F.xxhash64("term")).cache()
    scale = quantization_scale(w)
    path = str(tmp_path / "idx")
    build_index(w.select("doc_id", "term_id", "weight"), path, scale, num_shards=8)
    qt = spark.createDataFrame(
        entrymod._query_terms(), "query_id string, term string, qtf int"
    ).withColumn("term_id", F.xxhash64("term"))
    engine = retrieve(load_postings(spark, path), qt, scale, k=50)
    oracle = bm25_topk(quantize(w, scale), qt, k=50, scale=scale)
    e = sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 9)) for r in engine.collect()
    )
    o = sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 9)) for r in oracle.collect()
    )
    assert e == o
