from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from splade_spark.pipeline.dedup import (
    dedup_exact,
    doc_shingles,
    exact_duplicates,
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
    simhash_signatures,
)
from splade_spark.tokenize import term_freqs


@pytest.fixture(scope="module")
def dup_corpus(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, "The  QUICK brown fox jumps over the lazy dog near the river bank today"),  # ws/case dup
        (3, base.replace("today", "tomorrow")),  # near dup (1 word)
        (4, "completely different text about spark dataframes and shuffles here now"),
        (5, base.replace("quick", "slow").replace("today", "yesterday")),  # near-ish
        (6, "completely different text about spark dataframes and shuffles here now"),  # dup of 4
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(dup_corpus):
    dups = {r.doc_id: r.canonical_id for r in exact_duplicates(dup_corpus).collect()}
    assert dups[1] == 0 and dups[6] == 4 and dups[3] == 3
    # case/whitespace normalization: doc 2 has different case → lower() folds it
    assert dups[2] == 0
    kept = sorted(r.doc_id for r in dedup_exact(dup_corpus).collect())
    assert kept == [0, 3, 4, 5]


def test_ngram_jaccard_pairs(spark, dup_corpus):
    import duckdb

    pairs = ngram_jaccard_pairs(dup_corpus, n=3, tau=0.5)
    got = {(r.doc_a, r.doc_b): round(r.jaccard, 9) for r in pairs.collect()}
    # exact dups have jaccard 1.0
    assert got[(0, 1)] == 1.0 and got[(4, 6)] == 1.0 and got[(0, 2)] == 1.0
    assert (0, 3) in got and got[(0, 3)] < 1.0

    # DuckDB cross-check of the full operator
    pdf = dup_corpus.toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    sql = """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 x -> x <> '') AS ts FROM docs
    ),
    sh AS (
      SELECT DISTINCT doc_id,
        array_to_string(ts[i:i+2], ' ') AS shingle
      FROM toks, unnest(range(1, len(ts) - 1)) AS t(i)
      WHERE len(ts) >= 3
    ),
    sz AS (SELECT doc_id, count(*) sz FROM sh GROUP BY 1),
    common AS (
      SELECT a.doc_id doc_a, b.doc_id doc_b, count(*) c
      FROM sh a JOIN sh b USING (shingle) WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, c::DOUBLE / (sa.sz + sb.sz - c) AS jaccard
    FROM common JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
    WHERE c::DOUBLE / (sa.sz + sb.sz - c) >= 0.5
    """
    exp = {(r[0], r[1]): round(r[2], 9) for r in con.execute(sql).fetchall()}
    assert got == exp


def test_minhash_lsh_finds_dups(dup_corpus):
    sigs = minhash_signatures(dup_corpus, n=3, num_hashes=64).cache()
    assert sigs.count() == 7
    sig_len = sigs.select(F.size("sig")).first()[0]
    assert sig_len == 64
    # identical docs → identical signatures
    s = {r.doc_id: tuple(r.sig) for r in sigs.collect()}
    assert s[0] == s[1] == s[2] and s[4] == s[6]
    cands = minhash_lsh_candidates(sigs, bands=16)
    cset = {(r.doc_a, r.doc_b) for r in cands.collect()}
    assert (0, 1) in cset and (4, 6) in cset
    verified = minhash_dedup_pairs(dup_corpus, n=3, tau=0.5)
    vset = {(r.doc_a, r.doc_b) for r in verified.collect()}
    assert (0, 1) in vset and (0, 2) in vset and (4, 6) in vset
    # verified pairs ⊆ exact jaccard pairs
    exact = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(dup_corpus, n=3, tau=0.5).collect()
    }
    assert vset <= exact


def test_simhash(spark, dup_corpus):
    tf = term_freqs(dup_corpus)
    sigs = simhash_signatures(tf).cache()
    s = {r.doc_id: r.simhash for r in sigs.collect()}
    assert s[0] == s[1] == s[2]  # same token multiset → same simhash
    assert s[4] == s[6]
    pairs = simhash_near_dup_pairs(sigs, max_hamming=10)
    pset = {(r.doc_a, r.doc_b): r.hamming for r in pairs.collect()}
    assert pset[(0, 1)] == 0 and pset[(4, 6)] == 0
    # near-dup doc 3 within a few bits of doc 0
    assert (0, 3) in pset


def test_dedup_cache_registry_unpersists_clean(spark, dup_corpus):
    """The shingle/signature caches must be releasable: with a registry,
    consuming the result then unpersisting leaves no pinned cache entries
    beyond what existed before the call (the curation-loop contract)."""
    jsc = spark.sparkContext._jsc
    spark.catalog.clearCache()
    # re-pin the fixture cache dropped by clearCache so later tests keep it
    dup_corpus.cache().count()
    before = jsc.getPersistentRDDs().size()
    reg: list = []
    try:
        ngram_jaccard_pairs(dup_corpus, n=3, tau=0.5, cache_registry=reg).collect()
        minhash_dedup_pairs(dup_corpus, n=3, tau=0.5, cache_registry=reg).collect()
        # jaccard: shingles + df-filtered join input; minhash: sigs +
        # candidate pairs + shingles
        assert len(reg) == 5
        assert jsc.getPersistentRDDs().size() > before
    finally:
        for c in reg:
            c.unpersist(blocking=True)
    assert jsc.getPersistentRDDs().size() == before


def test_simhash_bucket_cap_semantics(spark, dup_corpus):
    """Cap semantics mirror cosine_near_dup_pairs: when no bucket exceeds
    the cap the result is exactly the uncapped (pigeonhole-complete) set;
    on a degenerate one-hot-bucket corpus the capped path returns the
    star edges (rep, member) linearly instead of all O(n^2) pairs."""
    tf = term_freqs(dup_corpus)
    sigs = simhash_signatures(tf).cache()
    uncapped = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_near_dup_pairs(sigs, max_hamming=10).collect()
    }
    # generous cap: no bucket exceeds it -> identical result
    same = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_near_dup_pairs(
            sigs, max_hamming=10, max_bucket_size=10_000
        ).collect()
    }
    assert same == uncapped
    # tight cap: output is a subset, and every capped-bucket member still
    # links to the bucket representative (star edges survive)
    capped = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_near_dup_pairs(
            sigs, max_hamming=10, max_bucket_size=2
        ).collect()
    }
    assert set(capped) <= set(uncapped)
    assert all(uncapped[k] == v for k, v in capped.items())
    # identical-signature group {0,1,2}: rep 0 keeps both members
    assert (0, 1) in capped and (0, 2) in capped


def test_simhash_cap_degenerate_hot_bucket(spark):
    """All-identical docs: one bucket of n in every band. Uncapped is
    O(n^2) pairs; capped is exactly the n-1 star edges with hamming 0."""
    n = 40
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(n)],
        "doc_id long, text string",
    )
    sigs = simhash_signatures(term_freqs(docs))
    capped = simhash_near_dup_pairs(sigs, max_hamming=3, max_bucket_size=5)
    rows = capped.collect()
    assert len(rows) == n - 1
    assert all(r.doc_a == 0 and r.hamming == 0 for r in rows)
    assert {r.doc_b for r in rows} == set(range(1, n))
