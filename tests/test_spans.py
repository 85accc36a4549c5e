"""Window-gram span operators: duplicated-span stats, Gopher repetition
signals, benchmark decontamination. Hand-computed fixtures + mode
equivalence + DuckDB replay is in tests/test_entry.py via the harness."""

import pytest
from pyspark.sql import functions as F

from splade_spark.pipeline.spans import (
    decontaminate,
    duplicate_span_stats,
    probe_grams,
    repetition_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # doc 0 and 1 share the 3-gram "a b c"; doc 0 repeats "x x"
        (0, "a b c x x x"),
        (1, "a b c d e"),
        (2, "q r s t u"),
        (3, "too short"),  # < 3 tokens -> no 3-gram windows
        (4, ""),  # no tokens at all
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_duplicate_span_stats_hand_computed(docs):
    out = {
        r["doc_id"]: r
        for r in duplicate_span_stats(docs, n=3, hash_mode="raw").collect()
    }
    # doc 0 windows: "a b c","b c x","c x x","x x x" -> only "a b c" is
    # cross-doc (also in doc 1)
    assert out[0]["n_windows"] == 4 and out[0]["n_dup_windows"] == 1
    assert out[0]["dup_window_fraction"] == pytest.approx(0.25)
    # doc 1 windows: "a b c","b c d","c d e" -> 1 duplicated
    assert out[1]["n_windows"] == 3 and out[1]["n_dup_windows"] == 1
    assert out[2]["n_dup_windows"] == 0
    # docs with <n tokens have no windows and do not appear
    assert 3 not in out and 4 not in out


def test_duplicate_span_stats_hash_mode_equivalence(docs):
    raw = duplicate_span_stats(docs, n=3, hash_mode="raw")
    hashed = duplicate_span_stats(docs, n=3, hash_mode="xxhash64")
    cols = ["doc_id", "n_windows", "n_dup_windows"]
    assert sorted(map(tuple, raw.select(cols).collect())) == sorted(
        map(tuple, hashed.select(cols).collect())
    )


def test_duplicate_span_stats_bad_mode(docs):
    with pytest.raises(ValueError):
        duplicate_span_stats(docs, hash_mode="md5")


def test_repetition_stats_hand_computed(docs):
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    # doc 0 tokens a b c x x x -> token_chars 6; 2-grams: "a b","b c",
    # "c x","x x","x x" -> top gram "x x" cnt 2, chars 2*2=4
    assert out[0]["token_chars"] == 6
    assert out[0]["top_gram_chars"] == 4
    assert out[0]["top_gram_frac"] == pytest.approx(4 / 6)
    # 3-grams of doc 0 are all distinct -> no duplicated 3-grams
    assert out[0]["dup_gram_chars"] == 0
    # tie in doc 2 ("q r","r s","s t","t u" all cnt 1): lexicographically
    # smallest wins -> "q r", chars 2
    assert out[2]["top_gram_chars"] == 2
    # every doc appears, even empty ones, with integral zero defaults
    assert out[4]["token_chars"] == 0
    assert out[4]["top_gram_frac"] == 0.0 and out[4]["dup_gram_frac"] == 0.0


def test_repetition_dup_gram_counts_all_occurrences(spark):
    df = spark.createDataFrame(
        [(0, "a b c a b c a b c")], ["doc_id", "text"]
    )
    row = repetition_stats(df, dup_n=3).collect()[0]
    # 3-gram occurrences: abc,bca,cab,abc,bca,cab,abc -> "a b c" x3 (9
    # chars), "b c a" x2 (6), "c a b" x2 (6) -> 21 duplicated-gram chars
    assert row["dup_gram_chars"] == 21
    assert row["token_chars"] == 9
    # top 2-gram "a b" cnt 3 -> 6 chars
    assert row["top_gram_chars"] == 6


def test_decontaminate(docs, spark):
    bench = spark.createDataFrame([(100, "b c d e f")], ["doc_id", "text"])
    probes = probe_grams(bench, n=3)
    out = {r["doc_id"]: r for r in decontaminate(docs, probes, n=3).collect()}
    # probe 3-grams: "b c d","c d e","d e f"; doc 1 contains the first two
    assert out[1]["n_probe_hits"] == 2 and out[1]["contaminated"]
    assert out[0]["n_probe_hits"] == 0 and not out[0]["contaminated"]
    # every doc appears, including window-less ones
    assert set(out) == {0, 1, 2, 3, 4}
    assert not out[3]["contaminated"] and not out[4]["contaminated"]


def test_decontaminate_counts_distinct_probe_grams(spark):
    # the same probe gram occurring twice in a doc counts once
    df = spark.createDataFrame([(0, "a b c z a b c")], ["doc_id", "text"])
    bench = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    out = decontaminate(df, probe_grams(bench, n=3), n=3).collect()[0]
    assert out["n_probe_hits"] == 1
