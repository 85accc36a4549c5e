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
    for name in set(qs) - set(entrymod.oracle_sql()):
        df = qs[name](spark, SF_DIR)
        assert df.count() >= 0 and len(df.columns) > 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
