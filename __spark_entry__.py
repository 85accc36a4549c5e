"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship BM25 top-k over sf0.001 documents.
queries()     — one entry per implemented operator from SURVEY.md §2 (plus
                the training-data pipeline ops), each (spark, sf_dir) → DF.
oracle_sql()  — DuckDB-ANSI equivalents on the pre-registered views.

Column names and types are aligned pairwise (aggregates aliased identically,
ranks cast to bigint, float columns rounded on both sides).
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

BM25_K1, BM25_B = 1.2, 0.75

# fixed query set over the documents-table vocabulary; q1 has an OOV term,
# q5 a duplicate term (qtf=2)
QUERY_SET: list[tuple[str, str]] = [
    ("q1", "spark join performance"),
    ("q2", "table scan filter"),
    ("q3", "window agg stream"),
    ("q4", "customer order big value"),
    ("q5", "hash hash merge"),
]


def _tok(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _query_terms() -> list[tuple[str, str, int]]:
    out = []
    for qid, text in QUERY_SET:
        counts: dict[str, int] = {}
        for t in _tok(text):
            counts[t] = counts.get(t, 0) + 1
        out.extend((qid, t, c) for t, c in counts.items())
    return out


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------- entry ---


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-10 retrieval over sf0.001 documents."""
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


# -------------------------------------------------------------- queries ---


def q_term_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from splade_spark.tokenize import term_freqs

    return term_freqs(_docs(spark, sf_dir)).select(
        "doc_id", "term", "tf", F.col("doc_len").cast("long").alias("doc_len")
    )


def q_doc_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from splade_spark.stats import doc_freqs
    from splade_spark.tokenize import term_freqs

    return doc_freqs(term_freqs(_docs(spark, sf_dir))).select("term", "df")


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from splade_spark.tokenize import term_freqs

    tf = term_freqs(_docs(spark, sf_dir))
    return (
        tf.groupBy("doc_id")
        .agg(F.first("doc_len").alias("dl"))
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("dl"), 6).alias("avgdl"),
        )
    )


def q_bm25_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from splade_spark.bm25 import bm25_weights
    from splade_spark.stats import corpus_stats
    from splade_spark.tokenize import term_freqs

    tf = term_freqs(_docs(spark, sf_dir))
    n, avgdl = corpus_stats(tf)
    return bm25_weights(tf, n, avgdl).select(
        "doc_id", "term", F.round("weight", 6).alias("weight")
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from splade_spark.bm25 import bm25_topk, bm25_weights
    from splade_spark.stats import corpus_stats
    from splade_spark.tokenize import term_freqs

    tf = term_freqs(_docs(spark, sf_dir))
    n, avgdl = corpus_stats(tf)
    w = bm25_weights(tf, n, avgdl)
    qt = spark.createDataFrame(
        _query_terms(), "query_id string, term string, qtf int"
    ).withColumn("term_id", F.xxhash64("term"))
    top = bm25_topk(w.withColumn("term_id", F.xxhash64("term")), qt, k=10)
    return top.select(
        "query_id",
        "doc_id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_bm25_topk_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 threshold filter through the scoring path (threshold=1.0)."""
    from splade_spark.bm25 import bm25_topk, bm25_weights
    from splade_spark.stats import corpus_stats
    from splade_spark.tokenize import term_freqs

    tf = term_freqs(_docs(spark, sf_dir))
    n, avgdl = corpus_stats(tf)
    w = bm25_weights(tf, n, avgdl)
    qt = spark.createDataFrame(
        _query_terms(), "query_id string, term string, qtf int"
    ).withColumn("term_id", F.xxhash64("term"))
    top = bm25_topk(
        w.withColumn("term_id", F.xxhash64("term")), qt, k=10, threshold=1.0
    )
    return top.select(
        "query_id",
        "doc_id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_l0_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: mean number of distinct terms (non-zeros) per document."""
    from splade_spark.stats import l0_stats
    from splade_spark.tokenize import term_freqs

    return l0_stats(term_freqs(_docs(spark, sf_dir))).select(
        F.round("mean_l0", 6).alias("mean_l0"), "n_docs"
    )


def q_flops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/J6: FLOPS = sum_t p_d(t)*p_q(t) between documents and the fixed
    query set (activation-probability dot product)."""
    from splade_spark.tokenize import term_freqs

    tf = term_freqs(_docs(spark, sf_dir))
    n_d = tf.select("doc_id").distinct().count()
    qt = spark.createDataFrame(_query_terms(), "query_id string, term string, qtf int")
    n_q = qt.select("query_id").distinct().count()
    p_d = tf.groupBy("term").agg((F.count("*") / n_d).alias("p_d"))
    p_q = qt.select("query_id", "term").distinct().groupBy("term").agg(
        (F.count("*") / n_q).alias("p_q")
    )
    return (
        p_d.join(p_q, "term")
        .agg(F.round(F.sum(F.col("p_d") * F.col("p_q")), 9).alias("flops"))
    )


def q_posting_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-length histogram (reference: index_dist.json)."""
    from splade_spark.stats import doc_freqs
    from splade_spark.tokenize import term_freqs

    return (
        doc_freqs(term_freqs(_docs(spark, sf_dir)))
        .groupBy(F.col("df").alias("posting_len"))
        .agg(F.count("*").alias("n_terms"))
    )


def q_window_topk_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 window top-k: 3 longest docs per source."""
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        _docs(spark, sf_dir)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("source", "doc_id", "n_chars", "rank")
    )


def q_doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 per-doc top-k terms by tf (docs 0..49)."""
    from splade_spark.tokenize import term_freqs

    tf = term_freqs(_docs(spark, sf_dir)).filter(F.col("doc_id") < 50)
    w = Window.partitionBy("doc_id").orderBy(F.col("tf").desc(), F.col("term").asc())
    return (
        tf.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("doc_id", "term", "tf", "rank")
    )


def q_value_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 value pruning effect: per-term surviving postings at tf >= 2."""
    from splade_spark.tokenize import term_freqs

    tf = term_freqs(_docs(spark, sf_dir))
    return (
        tf.filter(F.col("tf") >= 2)
        .groupBy("term")
        .agg(F.count("*").alias("df_kept"))
    )


def q_quantile_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 quantile pruning: per-term median tf + survivors above it."""
    from splade_spark.tokenize import term_freqs

    tf = term_freqs(_docs(spark, sf_dir))
    th = tf.groupBy("term").agg(
        F.round(F.expr("percentile(tf, 0.5)"), 6).alias("median_tf")
    )
    kept = (
        tf.join(th, "term")
        .filter(F.col("tf") > F.col("median_tf"))
        .groupBy("term")
        .agg(F.count("*").alias("kept"))
    )
    return th.join(kept, "term", "left").select(
        "term", "median_tf", F.coalesce("kept", F.lit(0)).alias("kept")
    )


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from splade_spark.pipeline.dedup import exact_duplicates

    return exact_duplicates(_docs(spark, sf_dir)).select("doc_id", "canonical_id")


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from splade_spark.pipeline.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf_dir), n=3, tau=0.5).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
    )


def q_minhash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH verified near-dups, SQL-oracle-checked end to end: the
    polyhash base hash and raw-string band buckets make every stage
    (signatures → banded candidates → signature-estimate prefilter →
    exact-Jaccard verify) reproducible in DuckDB; the (a,b) hash
    coefficients are injected into the oracle as literals."""
    from splade_spark.pipeline.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(
        _docs(spark, sf_dir), n=3, tau=0.5,
        base_hash="polyhash", hash_buckets=False,
    ).select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))


def q_simhash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dups, SQL-oracle-checked: term projections come from
    the shared polyhash (fingerprint_col ≡ the oracle's list_reduce), the
    signature is an exact integer ±tf bit vote, and the engine's banded
    candidate join is pigeonhole-complete for hamming ≤ 3 — so the oracle
    can be brute-force all-pairs bit_count(xor) and must agree exactly."""
    from splade_spark.pipeline.dedup import simhash_near_dup_pairs, simhash_signatures
    from splade_spark.pipeline.textstats import fingerprint_col
    from splade_spark.tokenize import term_freqs

    tf = term_freqs(_docs(spark, sf_dir)).withColumn(
        "h", fingerprint_col(F.col("term"))
    )
    sigs = simhash_signatures(tf, hash_col="h")
    return simhash_near_dup_pairs(sigs, max_hamming=3).select(
        "doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming")
    )


def q_simhash_dups_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-guarded SimHash path: the polyhash term projection is
    < 2^56, so the bands covering the always-unset high bits are fully
    degenerate on this corpus (two 500-doc buckets) — exactly the hot-
    bucket shape the cap exists for. max_bucket_size=50 sends those bands
    (and band 1's 176/110-doc buckets) down the star-linking branch while
    the diverse band 0 keeps exact all-pairs; the DuckDB oracle replays
    the split literally (bucket sizes, min-id representative, union,
    distinct, hamming filter), so BOTH branches are value-checked against
    an independent engine."""
    from splade_spark.pipeline.dedup import simhash_near_dup_pairs, simhash_signatures
    from splade_spark.pipeline.textstats import fingerprint_col
    from splade_spark.tokenize import term_freqs

    tf = term_freqs(_docs(spark, sf_dir)).withColumn(
        "h", fingerprint_col(F.col("term"))
    )
    sigs = simhash_signatures(tf, hash_col="h")
    return simhash_near_dup_pairs(
        sigs, max_hamming=3, max_bucket_size=50
    ).select("doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming"))


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from splade_spark.pipeline.textstats import token_counts

    return token_counts(_docs(spark, sf_dir)).select(
        "doc_id",
        F.col("n_tokens_ws").cast("long").alias("n_tokens_ws"),
        F.col("n_tokens_bpe").cast("long").alias("n_tokens_bpe"),
    )


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from splade_spark.pipeline.textstats import quality_features

    qf = quality_features(_docs(spark, sf_dir))
    return qf.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("unique_ratio", 6).alias("unique_ratio"),
        F.round("quality_score", 6).alias("quality_score"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from splade_spark.pipeline.textstats import lang_id

    return lang_id(_docs(spark, sf_dir)).select("doc_id", "lang_pred")


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from splade_spark.pipeline.textstats import fingerprints

    return fingerprints(_docs(spark, sf_dir)).select("doc_id", "fingerprint")


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication signal (Lee et al. dedup): per doc, the
    fraction of its 5-token windows whose gram occurs in >=2 distinct
    docs. hash_mode='raw' so every stage is value-replayable in SQL (the
    production default xxhash64 is equivalence-tested in pytest)."""
    from splade_spark.pipeline.spans import duplicate_span_stats

    return duplicate_span_stats(
        _docs(spark, sf_dir), n=5, min_docs=2, hash_mode="raw"
    ).select(
        "doc_id",
        "n_windows",
        "n_dup_windows",
        F.round("dup_window_fraction", 6).alias("dup_window_fraction"),
    )


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-doc repetition: top-2-gram and duplicated-
    3-gram character fractions, integer numerators + one final division
    so the hash is partition-order-proof."""
    from splade_spark.pipeline.spans import repetition_stats

    return repetition_stats(_docs(spark, sf_dir)).select(
        "doc_id",
        "token_chars",
        "top_gram_chars",
        F.round("top_gram_frac", 6).alias("top_gram_frac"),
        "dup_gram_chars",
        F.round("dup_gram_frac", 6).alias("dup_gram_frac"),
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: probe 5-grams from the doc_id%7==0
    slice ("the benchmark"), flag the remaining corpus docs containing
    any probe gram via a broadcast semi-join. The sf corpus's duplicate
    pairs straddle the %7 split, so both hit and miss branches carry
    rows."""
    from splade_spark.pipeline.spans import decontaminate, probe_grams

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    return decontaminate(corpus, probe_grams(bench, n=5), n=5).select(
        "doc_id",
        F.col("n_probe_hits").cast("long").alias("n_probe_hits"),
        "contaminated",
    )


def q_emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for probe vectors vec_id < 3 — sequential
    fold dot product so the float math matches the SQL oracle bit-for-bit."""
    emb = _emb(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    dot = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = emb.crossJoin(F.broadcast(probes)).withColumn(
        "cosine",
        dot(F.col("embedding"), F.col("qvec"))
        / (
            F.sqrt(dot(F.col("embedding"), F.col("embedding")))
            * F.sqrt(dot(F.col("qvec"), F.col("qvec")))
        ),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("qid", "vec_id", F.round("cosine", 4).alias("cosine"), "rank")
    )


def q_emb_label_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean L2 norm of embeddings (array agg exercise)."""
    emb = _emb(spark, sf_dir)
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("embedding"),
            lambda p, q: p.cast("double") * q.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        emb.withColumn("norm", F.sqrt(dot))
        .groupBy("label")
        .agg(F.count("*").alias("n"), F.round(F.avg("norm"), 6).alias("avg_norm"))
    )


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed event aggregation (ts-column handling)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


def q_revenue_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + window over the star schema (J2/A-pattern parity)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    rev = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("revenue").desc(), F.col("c_custkey").asc()
    )
    return (
        rev.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("n_name", "c_custkey", "revenue", "rank")
    )


def q_lineitem_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate groupBy over the fact table (TPC-H Q1 shape) —
    exercises map-side partial aggregation over the largest driver table."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a new session starts after >30 min of user
    inactivity (lag + conditional cumsum over an event-time window) —
    per-user session counts and mean session length."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # timestampdiff(MICROSECOND) keeps sub-second precision — the previous
    # unix_timestamp() truncated to whole seconds while the oracle's epoch()
    # keeps microseconds, which can flip a session boundary for gaps in
    # (1800, 1801) s. Calendar arithmetic on TIMESTAMP_NTZ is also
    # timezone-independent (no NTZ→LTZ cast in the comparison).
    gaps = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_session",
        (
            F.col("prev_ts").isNull()
            | (
                F.expr("timestampdiff(MICROSECOND, prev_ts, ts)")
                > 1800 * 1_000_000
            )
        ).cast("int"),
    )
    sess = gaps.withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events")
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.round(F.avg("n_events"), 6).alias("avg_events_per_session"),
        F.sum("n_events").alias("n_events_total"),
    )


def _engine_query_terms(spark: SparkSession) -> DataFrame:
    """Fixture query terms with the engine's xxhash64 term ids."""
    return spark.createDataFrame(
        _query_terms(), "query_id string, term string, qtf int"
    ).withColumn("term_id", F.xxhash64("term"))


def _engine_fixture(spark: SparkSession, sf_dir: str):
    """Shared corpus prep for the engine harness entries: BM25 weights with
    xxhash64 term ids, the frozen quantization scale, and the fixture query
    terms. The engine entries that share the integer-domain oracle all go
    through here — a change to the term-id derivation or scale policy can
    then never desynchronize one entry from the common oracle."""
    from splade_spark.bm25 import bm25_weights, quantization_scale
    from splade_spark.stats import corpus_stats
    from splade_spark.tokenize import term_freqs

    tf = term_freqs(_docs(spark, sf_dir))
    n, avgdl = corpus_stats(tf)
    w = bm25_weights(tf, n, avgdl).withColumn("term_id", F.xxhash64("term"))
    scale = quantization_scale(w)
    return w, scale, _engine_query_terms(spark)


def _engine_project(res: DataFrame) -> DataFrame:
    """The engine entries' common output shape (rounded score, long rank) —
    must stay column-identical to the shared DuckDB oracle."""
    return res.select(
        "query_id",
        "doc_id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_engine_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full compressed-index + block-max-WAND engine path.

    SQL-oracle-checkable because the engine scores in the exact integer
    quantized domain: scale = 255/max(weight), per-posting impact
    round_even(weight*scale) (np.rint == bround == DuckDB round_even,
    all HALF_EVEN), integer sum, divide by scale at the end."""
    import tempfile

    from splade_spark.index.build import build_index, load_postings
    from splade_spark.query.wand import retrieve

    w, scale, qt = _engine_fixture(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="splade_idx_") + "/idx"
    build_index(w.select("doc_id", "term_id", "weight"), path, scale, num_shards=8)
    return _engine_project(
        retrieve(load_postings(spark, path), qt, scale, k=10, num_shards=8)
    )


def q_engine_bm25_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The warm-serving engine path: postings pre-shuffled by shard_id
    once (prepare_serving — the term filter preserves the partitioning, so
    a batch is ONE Spark stage) and the global top-k merged driver-side
    (merge='driver', ≤ k×num_shards tiny rows). Shares engine_bm25_topk's
    integer-domain DuckDB oracle verbatim — both merge orders are
    (score_int desc, doc_id asc) over identical shard-local scores."""
    import tempfile

    from splade_spark.index.build import build_index, load_postings
    from splade_spark.query.wand import prepare_serving, retrieve

    w, scale, qt = _engine_fixture(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="splade_idx_srv_") + "/idx"
    build_index(w.select("doc_id", "term_id", "weight"), path, scale, num_shards=8)
    serving = prepare_serving(load_postings(spark, path), 8)
    return _engine_project(
        retrieve(
            serving, qt, scale, k=10, num_shards=8,
            merge="driver", prepartitioned=True,
        )
    )


def q_engine_merged_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end tiered-merge parity: the corpus splits into two
    docID-contiguous segments, each built into its own sharded index with
    the SAME global stats + quantization scale, folded on disk by the
    log-structured streaming re-encode merge (index/merge.py), then queried
    through the compressed block-max-WAND kernel. Merging is
    result-preserving by construction, so this shares engine_bm25_topk's
    integer-domain DuckDB oracle verbatim — a green hash here proves the
    merge path (decode → concat → re-encode → query) end to end against an
    independent engine."""
    import os
    import tempfile

    from splade_spark.index.build import build_index, load_postings
    from splade_spark.index.merge import merge_indexes
    from splade_spark.query.wand import retrieve

    w, scale, qt = _engine_fixture(spark, sf_dir)
    mm = w.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")).collect()[0]
    thr = (mm["lo"] + mm["hi"]) // 2  # contiguous ranges — merge rejects overlap
    root = tempfile.mkdtemp(prefix="splade_mrg_")
    pa, pb, pm = (os.path.join(root, x) for x in ("segA", "segB", "merged"))
    wsel = w.select("doc_id", "term_id", "weight")
    build_index(wsel.filter(F.col("doc_id") <= thr), pa, scale, num_shards=8)
    build_index(wsel.filter(F.col("doc_id") > thr), pb, scale, num_shards=8)
    merge_indexes(spark, [pa, pb], pm)
    return _engine_project(
        retrieve(load_postings(spark, pm), qt, scale, k=10, num_shards=8)
    )


def q_engine_incremental_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The §2.9 incremental path end to end, SQL-oracle-checked: a base
    index is built over the docID-lower half with its own stats, the upper
    half lands as files and streams through the AvailableNow incremental
    indexer (readStream → foreachBatch → posting segment, frozen base df/
    N/avgdl per the segment-build policy, doc ids allocated above the
    persisted watermark), and top-k runs over the base ∪ segment union.

    Oracle-checkable because everything is deterministic: internal ids
    order exactly like original doc_ids (base = lower contiguous range in
    conv_id order, segment ids above the watermark in conv_id order), so
    the (score desc, internal id asc) tie-break equals (score desc,
    original doc_id asc), and segment weights use base df (0 for unseen
    terms) with impacts clipped at 255 under the FROZEN base scale — all
    replayed in DuckDB."""
    import os
    import tempfile

    from splade_spark.bm25 import bm25_weights, quantization_scale
    from splade_spark.documents import build_documents
    from splade_spark.index.build import build_index
    from splade_spark.query.wand import retrieve
    from splade_spark.stats import corpus_stats
    from splade_spark.streaming.incremental import (
        FrozenStats,
        load_all_postings,
        set_doc_watermark,
        start_incremental_indexer,
    )
    from splade_spark.tokenize import term_freqs

    docs = _docs(spark, sf_dir)
    mm = docs.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")).collect()[0]
    thr = (mm["lo"] + mm["hi"]) // 2
    # transcripts shape: one turn per conversation; zero-padded conv_id so
    # lexicographic conv order == numeric doc_id order
    tr = docs.select(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text").alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.lit("2026-01-01 00:00:00").cast("timestamp").alias("ts"),
        F.col("doc_id").alias("_orig"),
    )
    base_tr = tr.filter(F.col("_orig") <= thr).drop("_orig")
    upd_tr = tr.filter(F.col("_orig") > thr).drop("_orig")

    base_docs = build_documents(base_tr)
    base_tf = term_freqs(base_docs).cache()
    n_base, avgdl_base = corpus_stats(base_tf)
    base_w = bm25_weights(base_tf, n_base, avgdl_base)
    scale = quantization_scale(base_w)

    root = tempfile.mkdtemp(prefix="splade_incr_")
    base_idx = os.path.join(root, "base_idx")
    build_index(
        base_w.select("doc_id", "term_id", "weight"), base_idx, scale, num_shards=8
    )
    df_path = os.path.join(root, "base_df")
    base_tf.groupBy("term_id").agg(F.count("*").alias("df")).write.parquet(df_path)
    base_dm = os.path.join(root, "docmap_base")
    base_docs.select("doc_id", "conv_id").write.parquet(base_dm)
    n_base_docs = base_docs.count()
    base_tf.unpersist()

    landing = os.path.join(root, "landing")
    upd_tr.coalesce(1).write.parquet(landing)  # one file → one epoch
    seg_root = os.path.join(root, "segs")
    set_doc_watermark(seg_root, n_base_docs)
    stream = start_incremental_indexer(
        spark,
        landing,
        seg_root,
        FrozenStats(n_base, avgdl_base, scale, df_path),
        num_shards=8,
    )
    if not stream.awaitTermination(300):
        # proceeding with a partial/empty segment set would surface as a
        # baffling oracle mismatch instead of a clear timeout
        stream.stop()
        raise RuntimeError("incremental indexer did not finish within 300 s")

    postings = load_all_postings(spark, seg_root, base_index=base_idx)
    qt = _engine_query_terms(spark)
    res = retrieve(postings, qt, scale, k=10, num_shards=8)
    from splade_spark.streaming.incremental import list_segments

    dm = spark.read.parquet(
        base_dm, *[s + "_docmap" for s in list_segments(seg_root)]
    ).select("doc_id", "conv_id")
    return res.join(dm, "doc_id").select(
        "query_id",
        F.col("conv_id").cast("long").alias("doc_id"),
        F.round("score", 6).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_emb_near_dup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-guarded near-dup path: buckets over max_bucket_size=30
    switch to linear star-linking against the bucket's min-id
    representative (the sf0.01 corpus has 16 buckets sized 16-48 under
    these planes, so BOTH code paths run). The DuckDB oracle replays the
    split exactly: all-pairs for buckets ≤ 30, (rep, member) edges
    otherwise, same exact-cosine verify and tau."""
    from splade_spark.pipeline.similarity import cosine_near_dup_pairs

    emb = _emb(spark, sf_dir)
    pairs = cosine_near_dup_pairs(
        emb, tau=0.35, nbits=4, dim=64, max_bucket_size=30
    )
    return pairs.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via hyperplane LSH + exact rerank, SQL-oracle-checked:
    the seeded hyperplanes are injected into the DuckDB oracle as DOUBLE[]
    literals, which replays sign-bit signatures, the 1-bit-flip multiprobe,
    and the exact cosine rerank (4-decimal rounding absorbs BLAS-vs-
    sequential float summation order)."""
    from splade_spark.pipeline.similarity import lsh_cosine_topk

    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 3).toPandas()
    import pandas as pd

    qv = pd.DataFrame(
        {"query_id": [f"v{i}" for i in q["vec_id"]], "embedding": q["embedding"].tolist()}
    )
    res = lsh_cosine_topk(emb, qv, k=5, nbits=10)
    return res.select(
        "query_id",
        "vec_id",
        F.round("cosine", 4).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN in its exact configuration (nprobe = n_centroids probes
    every cell → candidates = whole corpus), so the SQL oracle is plain
    brute-force cosine top-k; the approximate nprobe<cells path is
    recall-tested in pytest. Queries differ from emb_cosine_topk's
    (vec_id 3..5)."""
    from splade_spark.pipeline.similarity import ivf_cosine_topk

    emb = _emb(spark, sf_dir)
    q = emb.filter((F.col("vec_id") >= 3) & (F.col("vec_id") < 6)).toPandas()
    import pandas as pd

    qv = pd.DataFrame(
        {"query_id": [f"v{i}" for i in q["vec_id"]], "embedding": q["embedding"].tolist()}
    )
    res = ivf_cosine_topk(emb, qv, k=5, n_centroids=8, nprobe=8)
    return res.select(
        "query_id",
        "vec_id",
        F.round("cosine", 4).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_ann_lsh_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN through the PERSISTED LSH index (pipeline/ann_index.py): build
    writes parquet hive-partitioned by bucket in one Arrow pass, the query
    side computes its probe set driver-side and scans only the probed
    partitions (directory-level pruning). Result-identical to the per-call
    path at the same (nbits, seed, 1-bit multiprobe), so the DuckDB oracle
    replays the same seeded-hyperplane signatures + bit-flip probes + exact
    rerank — a green hash proves the build→meta→probe→prune→rerank
    round-trip against an independent engine. Queries vec_id 6..8 (distinct
    from ann_lsh_topk's 0..2)."""
    import tempfile

    from splade_spark.pipeline.ann_index import build_lsh_index, lsh_topk_from_index

    emb = _emb(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="splade_ann_lsh_") + "/idx"
    build_lsh_index(emb, path, nbits=10, dim=64)
    q = emb.filter((F.col("vec_id") >= 6) & (F.col("vec_id") < 9)).toPandas()
    import pandas as pd

    qv = pd.DataFrame(
        {"query_id": [f"v{i}" for i in q["vec_id"]], "embedding": q["embedding"].tolist()}
    )
    res = lsh_topk_from_index(spark, path, qv, k=5, multiprobe_bits=1)
    return res.select(
        "query_id",
        "vec_id",
        F.round("cosine", 4).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_ann_lsh_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN through a GROWN LSH index: build on the even-id half, append the
    odd-id half (append re-derives the seeded planes from the index meta,
    so appended rows land in exactly the buckets a full rebuild would
    produce), then query the grown index. The DuckDB oracle replays the
    same signatures + per-query 1-bit multiprobe + exact rerank over the
    FULL table — a green hash proves build(A) + append(B) ≡ build(A ∪ B)
    against an independent engine, not just against our own rebuild
    (pytest test_lsh_append_equals_rebuild). Queries vec_id 12..14
    (distinct from ann_lsh_served's 6..8)."""
    import tempfile

    from splade_spark.pipeline.ann_index import (
        append_lsh_index, build_lsh_index, lsh_topk_from_index,
    )

    emb = _emb(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="splade_ann_app_") + "/idx"
    build_lsh_index(emb.filter(F.col("vec_id") % 2 == 0), path, nbits=10, dim=64)
    append_lsh_index(emb.filter(F.col("vec_id") % 2 == 1), path)
    q = emb.filter((F.col("vec_id") >= 12) & (F.col("vec_id") < 15)).toPandas()
    import pandas as pd

    qv = pd.DataFrame(
        {"query_id": [f"v{i}" for i in q["vec_id"]], "embedding": q["embedding"].tolist()}
    )
    res = lsh_topk_from_index(spark, path, qv, k=5, multiprobe_bits=1)
    return res.select(
        "query_id",
        "vec_id",
        F.round("cosine", 4).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_ann_ivf_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN through the PERSISTED IVF index: the trained centroid matrix
    lives in the index meta (it IS the model), vectors are parquet
    partitioned by cell, and the query probes its nprobe nearest cells via
    partition pruning. Run at nprobe = n_centroids (every cell probed →
    candidates = whole corpus) so the SQL oracle is plain brute-force
    cosine top-k; the approximate path is recall-tested in pytest. Queries
    vec_id 9..11 (distinct from ann_ivf_topk's 3..5)."""
    import tempfile

    from splade_spark.pipeline.ann_index import build_ivf_index, ivf_topk_from_index

    emb = _emb(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="splade_ann_ivf_") + "/idx"
    build_ivf_index(emb, path, n_centroids=8, sample_size=1_000_000)
    q = emb.filter((F.col("vec_id") >= 9) & (F.col("vec_id") < 12)).toPandas()
    import pandas as pd

    qv = pd.DataFrame(
        {"query_id": [f"v{i}" for i in q["vec_id"]], "embedding": q["embedding"].tolist()}
    )
    res = ivf_topk_from_index(spark, path, qv, k=5, nprobe=8)
    return res.select(
        "query_id",
        "vec_id",
        F.round("cosine", 4).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_ann_ivf_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN through a GROWN IVF index: build on the even-id half (k-means
    centroids trained on that half only, stored in the index meta), append
    the odd-id half — append routes new vectors through the FROZEN
    quantizer, never retrains — then query the grown index at nprobe =
    n_centroids, so every cell is probed and the candidate set is the full
    appended corpus. The DuckDB oracle is plain brute-force cosine top-k
    over the whole table: a green hash proves build(A) + append(B) serves
    exactly A ∪ B (no appended vector lost or misrouted into an unprobed
    cell) against an independent engine, complementing pytest's
    append-equals-rebuild routing invariant. Queries vec_id 15..17
    (distinct from every other ANN entry's)."""
    import tempfile

    from splade_spark.pipeline.ann_index import (
        append_ivf_index, build_ivf_index, ivf_topk_from_index,
    )

    emb = _emb(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="splade_ann_ivf_app_") + "/idx"
    build_ivf_index(
        emb.filter(F.col("vec_id") % 2 == 0), path,
        n_centroids=8, sample_size=1_000_000,
    )
    append_ivf_index(emb.filter(F.col("vec_id") % 2 == 1), path)
    q = emb.filter((F.col("vec_id") >= 15) & (F.col("vec_id") < 18)).toPandas()
    import pandas as pd

    qv = pd.DataFrame(
        {"query_id": [f"v{i}" for i in q["vec_id"]], "embedding": q["embedding"].tolist()}
    )
    res = ivf_topk_from_index(spark, path, qv, k=5, nprobe=8)
    return res.select(
        "query_id",
        "vec_id",
        F.round("cosine", 4).alias("cosine"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full evaluation-metric bundle (MRR@k / recall@k / NDCG@k /
    R_cap@k — reference splade/utils/metrics.py:16-52, beir_eval.py:89-95)
    through the REAL public API (`evaluation.metrics.evaluate`), DuckDB
    -oracle-checked end to end. Inputs are derived deterministically from
    the documents table: a 10-query run (query = doc_id mod 10, pseudo
    -score (doc_id*37) mod 101, top-20 under the engine's total order
    score desc / doc_id asc) and graded qrels (docs with doc_id ≡ 0 mod 7,
    rel = 1 + doc_id mod 2). The oracle replays run construction, ranking,
    the top-k joins, linear-gain DCG/IDCG and the positive-query averaging
    conventions (queries absent from the run score 0) literally in SQL —
    a green hash proves the metric semantics against an independent
    engine, complementing the pytest golden + hypothesis property tests."""
    from splade_spark.evaluation.metrics import evaluate

    docs = _docs(spark, sf_dir).select("doc_id")
    qid = F.concat(F.lit("q"), (F.col("doc_id") % 10).cast("string"))
    run = docs.select(
        qid.alias("query_id"),
        "doc_id",
        ((F.col("doc_id") * 37) % 101).cast("double").alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    run = (
        run.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .drop("rank")  # evaluate() re-ranks internally — exercise that path
    )
    qrels = docs.filter(F.col("doc_id") % 7 == 0).select(
        qid.alias("query_id"),
        "doc_id",
        (F.lit(1) + (F.col("doc_id") % 2)).alias("rel"),
    )
    m = evaluate(run, qrels, ks=(5, 10))
    rows = [(name, float(round(v, 6))) for name, v in sorted(m.items())]
    return spark.createDataFrame(rows, "metric string, value double")


def q_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs via hyperplane-LSH buckets + exact
    JVM-side cosine verify, SQL-oracle-checked with the planes injected as
    literals (the synthetic embeddings are well-separated — max pairwise
    cosine ~0.51 — so tau is set low to yield a non-trivial pair set; the
    bucket-candidate semantics are what the oracle checks)."""
    from splade_spark.pipeline.similarity import cosine_near_dup_pairs

    emb = _emb(spark, sf_dir)
    # dim passed through → no one-row inference job per call
    pairs = cosine_near_dup_pairs(emb, tau=0.35, nbits=4, dim=64)
    return pairs.select(
        "id_a", "id_b", F.round("cosine", 4).alias("cosine")
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column plumbing, oracle-checked on everything
    deterministic: assets derive from the documents table (payload =
    utf-8 bytes of text, kind by doc_id mod 3, typed width/height meta),
    then the real Spark stages run — Arrow feature-extract over binary
    payloads (stub decode; its PRNG values aren't SQL-expressible, so the
    checked output is the feature dimensionality), video frame sampling
    (count per asset), and resize planning. DuckDB replays payload
    lengths, frame counts and target dims exactly."""
    from splade_spark.pipeline.multimodal import (
        extract_features,
        resize_meta,
        sample_frames,
    )

    docs = _docs(spark, sf_dir)
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(
            F.lit("width"), (F.col("n_chars") % 497 + 16).cast("string"),
            F.lit("height"), (F.col("n_chars") % 331 + 16).cast("string"),
            F.lit("codec"), F.lit("raw"),
        ).alias("meta"),
    )
    feats = extract_features(assets).select(
        "asset_id", F.size("feature").cast("long").alias("feature_dim")
    )
    frames = sample_frames(assets).groupBy("asset_id").agg(
        F.count("*").alias("n_frames")
    )
    rs = resize_meta(assets)
    return (
        rs.join(feats, "asset_id")
        .join(frames, "asset_id", "left")
        .select(
            "asset_id",
            "kind",
            F.length("payload").cast("long").alias("payload_len"),
            "feature_dim",
            F.coalesce("n_frames", F.lit(0)).cast("long").alias("n_frames"),
            F.col("target_width").cast("long").alias("target_width"),
            F.col("target_height").cast("long").alias("target_height"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "term_freqs": q_term_freqs,
        "doc_freqs": q_doc_freqs,
        "corpus_stats": q_corpus_stats,
        "bm25_weights": q_bm25_weights,
        "bm25_topk": q_bm25_topk,
        "bm25_topk_threshold": q_bm25_topk_threshold,
        "l0_stats": q_l0_stats,
        "flops": q_flops,
        "posting_dist": q_posting_dist,
        "window_topk_chars": q_window_topk_chars,
        "doc_top_terms": q_doc_top_terms,
        "value_prune": q_value_prune,
        "quantile_prune": q_quantile_prune,
        "exact_dedup": q_exact_dedup,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_dups": q_minhash_dups,
        "simhash_dups": q_simhash_dups,
        "simhash_dups_capped": q_simhash_dups_capped,
        "token_counts": q_token_counts,
        "quality": q_quality,
        "lang_id": q_lang_id,
        "fingerprints": q_fingerprints,
        "dup_spans": q_dup_spans,
        "repetition_stats": q_repetition_stats,
        "decontaminate": q_decontaminate,
        "emb_cosine_topk": q_emb_cosine_topk,
        "emb_label_norms": q_emb_label_norms,
        "events_hourly": q_events_hourly,
        "events_sessions": q_events_sessions,
        "lineitem_pricing": q_lineitem_pricing,
        "revenue_top5": q_revenue_top5,
        "engine_bm25_topk": q_engine_bm25_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_lsh_served": q_ann_lsh_served,
        "ann_lsh_appended": q_ann_lsh_appended,
        "ann_ivf_served": q_ann_ivf_served,
        "ann_ivf_appended": q_ann_ivf_appended,
        "eval_metrics": q_eval_metrics,
        "emb_near_dup": q_emb_near_dup,
        "emb_near_dup_capped": q_emb_near_dup_capped,
        "engine_bm25_serving": q_engine_bm25_serving,
        "engine_merged_topk": q_engine_merged_topk,
        "engine_incremental_topk": q_engine_incremental_topk,
        "multimodal_features": q_multimodal_features,
    }


# ---------------------------------------------------------------- oracle ---

_TOKS = """
  toks AS (
    SELECT doc_id, t.term
    FROM documents, unnest(list_filter(
      string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')) AS t(term)
  )
"""

_TF = _TOKS + """,
  tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
  dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1)
"""

_BM25_W = _TF + """,
  stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
  dfs AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
  w AS (
    SELECT tf.doc_id, tf.term,
      ln(1 + (n - df + 0.5)/(df + 0.5))
        * (tf::DOUBLE * (1.2 + 1))
        / (tf::DOUBLE + 1.2 * (1 - 0.75 + 0.75 * dl::DOUBLE / avgdl)) AS weight
    FROM tf JOIN dl USING (doc_id) JOIN dfs USING (term) CROSS JOIN stats
  )
"""


def _wins_cte(n: int, source: str = "documents") -> str:
    """Token n-gram window CTE (`wins`: doc_id, gram) — the SQL mirror of
    pipeline.dedup.shingles_col / pipeline.spans._doc_grams: lowercase
    [^a-z0-9]+ split, empties filtered, space-joined n-token windows, one
    row per occurrence."""
    return f"""
  toks_arr AS (
    SELECT doc_id, list_filter(
      string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
    FROM {source}
  ),
  wins AS (
    SELECT doc_id, array_to_string(t[i:i+{n - 1}], ' ') AS gram
    FROM toks_arr, LATERAL (SELECT unnest(range(1, len(t) - {n} + 2)) AS i) r(i)
    WHERE len(t) >= {n}
  )
"""


def _qt_values() -> str:
    rows = ", ".join(
        f"('{qid}', '{term}', {qtf})" for qid, term, qtf in _query_terms()
    )
    return f"(VALUES {rows}) AS qt(query_id, term, qtf)"


def oracle_sql() -> dict[str, str]:
    fp_mod = (1 << 56) - 5
    m31 = (1 << 31) - 1
    from splade_spark.pipeline.dedup import _hash_coeffs

    mh_a, mh_b = _hash_coeffs(64, seed=42)
    mh_coeffs = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(zip(mh_a, mh_b))
    )

    # seeded LSH hyperplanes (dim 64 x nbits 10), injected as literals —
    # repr() gives shortest-round-trip doubles, so DuckDB parses the exact
    # same float64 the engine broadcasts
    import numpy as _np

    from splade_spark.pipeline.similarity import SEED as _LSH_SEED

    def _plane_values(nbits: int) -> str:
        pl = _np.random.default_rng(_LSH_SEED).standard_normal((64, nbits))
        return ", ".join(
            "({}, [{}]::DOUBLE[])".format(
                j, ", ".join(repr(float(x)) for x in pl[:, j])
            )
            for j in range(nbits)
        )

    lsh_planes = _plane_values(10)
    lsh_flips = ", ".join(["(0)"] + [f"({1 << i})" for i in range(10)])
    nd_planes = _plane_values(4)  # emb_near_dup uses nbits=4

    def _lsh_per_query_sql(q_lo: int, q_hi: int) -> str:
        """Seeded-plane LSH ANN with PER-QUERY probes (the served default):
        each query keeps its own bucket + 1-bit flips and scores ONLY its
        own candidates — served-batch work is Σ_q |cands_q|, which this SQL
        replays literally (probes carries qid; cand joins on it). Shared by
        ann_lsh_served (fresh build) and ann_lsh_appended (build + append):
        the append path must produce the identical bucket assignment, so
        both oracles are this same full-table replay."""
        return f"""
            WITH planes(j, pv) AS (VALUES {lsh_planes}),
            e AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ),
            bits AS (
              SELECT vec_id, j, list_dot_product(v, pv) AS dot
              FROM e CROSS JOIN planes
            ),
            sigs AS (
              SELECT vec_id,
                sum(CASE WHEN dot > 0 THEN (1::BIGINT << j)
                         ELSE 0 END)::BIGINT AS bucket
              FROM bits GROUP BY 1
            ),
            flips(f) AS (VALUES {lsh_flips}),
            probes AS (
              SELECT vec_id AS qid, xor(bucket, f) AS pb
              FROM sigs, flips WHERE vec_id >= {q_lo} AND vec_id < {q_hi}
            ),
            cand AS (  -- (qid, candidate): a vector lives in ONE bucket,
                       -- and per-query flip targets are distinct → no dup
              SELECT p.qid, s.vec_id FROM sigs s
              JOIN probes p ON s.bucket = p.pb
            ),
            q AS (SELECT vec_id AS qid, v AS qv FROM e
                  WHERE vec_id >= {q_lo} AND vec_id < {q_hi}),
            scored AS (
              SELECT q.qid, e.vec_id,
                list_dot_product(e.v, q.qv)
                  / (sqrt(list_dot_product(e.v, e.v))
                     * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
              FROM cand JOIN e ON e.vec_id = cand.vec_id
              JOIN q ON q.qid = cand.qid
            )
            SELECT query_id, vec_id, round(cosine, 4) AS cosine, rank FROM (
              SELECT 'v' || qid::VARCHAR AS query_id, vec_id, cosine,
                row_number() OVER (PARTITION BY qid
                                   ORDER BY cosine DESC, vec_id) AS rank
              FROM scored
            ) WHERE rank <= 5
        """
    stop_en = "['the','a','of','and','to','in','is','it','that','for']"
    lang_scores = []
    for lang, words in {
        "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
        "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "por"],
        "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "nicht"],
        "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
    }.items():
        arr = "[" + ",".join(f"'{w}'" for w in words) + "]"
        lang_scores.append(
            f"SELECT doc_id, '{lang}' AS l, "
            f"len(list_filter(ts, t -> list_contains({arr}, t)))::DOUBLE"
            f" / greatest(len(ts), 1) AS s FROM toks_l"
        )
    lang_union = " UNION ALL ".join(lang_scores)

    d = {
        "term_freqs": f"""
            WITH {_TF}
            SELECT tf.doc_id, tf.term, tf.tf, dl.dl AS doc_len
            FROM tf JOIN dl USING (doc_id)
        """,
        "doc_freqs": f"""
            WITH {_TF}
            SELECT term, count(*) AS df FROM tf GROUP BY 1
        """,
        "corpus_stats": f"""
            WITH {_TF}
            SELECT count(*) AS n_docs, round(avg(dl), 6) AS avgdl FROM dl
        """,
        "bm25_weights": f"""
            WITH {_BM25_W}
            SELECT doc_id, term, round(weight, 6) AS weight FROM w
        """,
        "bm25_topk": f"""
            WITH {_BM25_W},
            s AS (
              SELECT query_id, doc_id, sum(qtf * weight) AS score
              FROM w JOIN {_qt_values()} USING (term)
              GROUP BY 1, 2
            ),
            r AS (
              SELECT query_id, doc_id, score,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS rank
              FROM s WHERE score > 0
            )
            SELECT query_id, doc_id, round(score, 6) AS score, rank
            FROM r WHERE rank <= 10
        """,
        "bm25_topk_threshold": f"""
            WITH {_BM25_W},
            s AS (
              SELECT query_id, doc_id, sum(qtf * weight) AS score
              FROM w JOIN {_qt_values()} USING (term)
              GROUP BY 1, 2
            ),
            r AS (
              SELECT query_id, doc_id, score,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS rank
              FROM s WHERE score > 1.0
            )
            SELECT query_id, doc_id, round(score, 6) AS score, rank
            FROM r WHERE rank <= 10
        """,
        "l0_stats": f"""
            WITH {_TF},
            l0 AS (SELECT doc_id, count(*) AS l0 FROM tf GROUP BY 1)
            SELECT round(avg(l0), 6) AS mean_l0, count(*) AS n_docs FROM l0
        """,
        "flops": f"""
            WITH {_TF},
            nd AS (SELECT count(DISTINCT doc_id) AS n_d FROM tf),
            qt AS (SELECT DISTINCT query_id, term FROM {_qt_values()}),
            nq AS (SELECT count(DISTINCT query_id) AS n_q FROM qt),
            pd AS (SELECT term, count(*)::DOUBLE / (SELECT n_d FROM nd) AS p_d
                   FROM tf GROUP BY 1),
            pq AS (SELECT term, count(*)::DOUBLE / (SELECT n_q FROM nq) AS p_q
                   FROM qt GROUP BY 1)
            SELECT round(sum(p_d * p_q), 9) AS flops FROM pd JOIN pq USING (term)
        """,
        "posting_dist": f"""
            WITH {_TF},
            dfs AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
            SELECT df AS posting_len, count(*) AS n_terms FROM dfs GROUP BY 1
        """,
        "window_topk_chars": """
            SELECT source, doc_id, n_chars, rank FROM (
              SELECT source, doc_id, n_chars,
                row_number() OVER (PARTITION BY source
                                   ORDER BY n_chars DESC, doc_id) AS rank
              FROM documents
            ) WHERE rank <= 3
        """,
        "doc_top_terms": f"""
            WITH {_TF}
            SELECT doc_id, term, tf, rank FROM (
              SELECT doc_id, term, tf,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY tf DESC, term) AS rank
              FROM tf WHERE doc_id < 50
            ) WHERE rank <= 5
        """,
        "value_prune": f"""
            WITH {_TF}
            SELECT term, count(*) AS df_kept FROM tf WHERE tf >= 2 GROUP BY 1
        """,
        "quantile_prune": f"""
            WITH {_TF},
            th AS (SELECT term, round(quantile_cont(tf::DOUBLE, 0.5), 6)
                            AS median_tf FROM tf GROUP BY 1),
            kept AS (
              SELECT tf.term, count(*) AS kept
              FROM tf JOIN th USING (term) WHERE tf > median_tf GROUP BY 1
            )
            SELECT th.term, th.median_tf, coalesce(kept.kept, 0) AS kept
            FROM th LEFT JOIN kept ON th.term = kept.term
        """,
        "exact_dedup": """
            WITH norm AS (
              SELECT doc_id,
                trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS n
              FROM documents
            ),
            canon AS (SELECT n, min(doc_id) AS canonical_id FROM norm GROUP BY 1)
            SELECT doc_id, canonical_id FROM norm JOIN canon USING (n)
        """,
        "ngram_jaccard": """
            WITH t AS (
              SELECT doc_id, list_filter(string_split_regex(lower(text),
                '[^a-z0-9]+'), x -> x <> '') AS ts FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS shingle
              FROM t, unnest(range(1, len(ts) - 1)) AS u(i)
              WHERE len(ts) >= 3
            ),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            common AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
              round(c::DOUBLE / (sa.sz + sb.sz - c), 6) AS jaccard
            FROM common
            JOIN sz sa ON sa.doc_id = doc_a
            JOIN sz sb ON sb.doc_id = doc_b
            WHERE c::DOUBLE / (sa.sz + sb.sz - c) >= 0.5
        """,
        "minhash_dups": f"""
            WITH t AS (
              SELECT doc_id, list_filter(string_split_regex(lower(text),
                '[^a-z0-9]+'), x -> x <> '') AS ts FROM documents
            ),
            sh AS (
              SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS shingle
              FROM t, unnest(range(1, len(ts) - 1)) AS u(i)
              WHERE len(ts) >= 3
            ),
            hb AS (  -- shared polyhash folded into the Mersenne prime
              SELECT doc_id,
                list_reduce(
                  list_prepend(0::BIGINT,
                    list_transform(string_split(shingle, ''),
                                   c -> ord(c)::BIGINT)),
                  (acc, c) -> (acc * 31 + c) % {fp_mod}
                ) % {m31} AS h
              FROM sh
            ),
            coeffs(i, a, b) AS (VALUES {mh_coeffs}),
            sigs AS (  -- a*h+b < 2^62: exact in BIGINT
              SELECT doc_id, i, min((a * h + b) % {m31}) AS mh
              FROM hb CROSS JOIN coeffs
              GROUP BY 1, 2
            ),
            banded AS (  -- 16 bands x 4 rows, raw comma-joined bucket key
              SELECT doc_id, i // 4 AS band,
                string_agg(mh::VARCHAR, ',' ORDER BY i) AS bucket
              FROM sigs GROUP BY doc_id, i // 4
            ),
            cand AS (
              SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM banded a JOIN banded b USING (band, bucket)
              WHERE a.doc_id < b.doc_id
            ),
            est AS (  -- signature-estimate prefilter (tau - 0.2)
              SELECT c.doc_a, c.doc_b
              FROM cand c
              JOIN sigs sa ON sa.doc_id = c.doc_a
              JOIN sigs sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
              GROUP BY 1, 2
              HAVING sum(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) / 64.0
                     >= 0.3
            ),
            sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY 1),
            common AS (  -- exact-Jaccard verify on the surviving pairs
              SELECT e.doc_a, e.doc_b, count(*) AS c
              FROM est e
              JOIN sh a ON a.doc_id = e.doc_a
              JOIN sh b ON b.doc_id = e.doc_b AND b.shingle = a.shingle
              GROUP BY 1, 2
            )
            SELECT doc_a, doc_b,
              round(c::DOUBLE / (sa.sz + sb.sz - c), 6) AS jaccard
            FROM common
            JOIN sz sa ON sa.doc_id = doc_a
            JOIN sz sb ON sb.doc_id = doc_b
            WHERE c::DOUBLE / (sa.sz + sb.sz - c) >= 0.5
        """,
        "simhash_dups": f"""
            WITH {_TF},
            th AS (
              SELECT doc_id, tf,
                list_reduce(
                  list_prepend(0::BIGINT,
                    list_transform(string_split(term, ''),
                                   c -> ord(c)::BIGINT)),
                  (acc, c) -> (acc * 31 + c) % {fp_mod}
                ) AS h
              FROM tf
            ),
            -- hash < 2^56, so bits 56..63 are never set (votes are all -tf)
            bits AS (
              SELECT doc_id, i,
                sum(CASE WHEN ((h >> i) & 1) = 1 THEN tf ELSE -tf END) AS acc
              FROM th, unnest(range(0, 56)) AS r(i)
              GROUP BY 1, 2
            ),
            sig AS (
              SELECT doc_id,
                sum(CASE WHEN acc > 0 THEN (1::BIGINT << i)
                         ELSE 0 END)::BIGINT AS simhash
              FROM bits GROUP BY 1
            )
            -- brute-force all-pairs: the engine's banded join is
            -- pigeonhole-complete for hamming <= 3, so the sets must match
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        """,
        "simhash_dups_capped": f"""
            WITH {_TF},
            th AS (
              SELECT doc_id, tf,
                list_reduce(
                  list_prepend(0::BIGINT,
                    list_transform(string_split(term, ''),
                                   c -> ord(c)::BIGINT)),
                  (acc, c) -> (acc * 31 + c) % {fp_mod}
                ) AS h
              FROM tf
            ),
            bits AS (
              SELECT doc_id, i,
                sum(CASE WHEN ((h >> i) & 1) = 1 THEN tf ELSE -tf END) AS acc
              FROM th, unnest(range(0, 56)) AS r(i)
              GROUP BY 1, 2
            ),
            sig AS (
              SELECT doc_id,
                sum(CASE WHEN acc > 0 THEN (1::BIGINT << i)
                         ELSE 0 END)::BIGINT AS simhash
              FROM bits GROUP BY 1
            ),
            -- max_hamming=3 -> four 16-bit bands at offsets 0/16/32/48
            banded AS (
              SELECT doc_id, simhash, band, (simhash >> off) & 65535 AS v
              FROM sig, (VALUES (0, 0), (1, 16), (2, 32), (3, 48))
                AS bo(band, off)
            ),
            stats AS (
              SELECT band, v, count(*) AS bsize, min(doc_id) AS rep
              FROM banded GROUP BY 1, 2
            ),
            bb AS (
              SELECT banded.doc_id, banded.band, banded.v, s.bsize, s.rep
              FROM banded JOIN stats s USING (band, v)
            ),
            small_pairs AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
              FROM bb a JOIN bb b
                ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id
              WHERE a.bsize <= 50
            ),
            big_pairs AS (  -- star edges: min-id rep -> member
              SELECT rep AS doc_a, doc_id AS doc_b
              FROM bb WHERE bsize > 50 AND doc_id <> rep
            ),
            cand AS (
              SELECT DISTINCT doc_a, doc_b FROM (
                SELECT * FROM small_pairs UNION ALL SELECT * FROM big_pairs
              )
            )
            SELECT c.doc_a, c.doc_b,
              bit_count(xor(sa.simhash, sb.simhash))::BIGINT AS hamming
            FROM cand c
            JOIN sig sa ON sa.doc_id = c.doc_a
            JOIN sig sb ON sb.doc_id = c.doc_b
            WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 3
        """,
        "token_counts": """
            SELECT doc_id,
              CASE WHEN trim(text) = '' THEN 0
                   ELSE len(string_split_regex(trim(text), '\\s+')) END
                AS n_tokens_ws,
              len(regexp_extract_all(lower(text), '([a-z0-9]+|[^a-z0-9\\s])', 1))
                AS n_tokens_bpe
            FROM documents
        """,
        "quality": f"""
            WITH t AS (
              SELECT doc_id, text,
                list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                            x -> x <> '') AS ts
              FROM documents
            )
            SELECT doc_id,
              len(ts) AS n_words,
              round(CASE WHEN length(text) > 0
                THEN 1.0 - length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
                          ::DOUBLE / length(text) ELSE 1.0 END, 6) AS punct_ratio,
              round(CASE WHEN len(ts) > 0
                THEN len(list_filter(ts, x -> list_contains({stop_en}, x)))::DOUBLE
                     / len(ts) ELSE 0.0 END, 6) AS stopword_ratio,
              round(CASE WHEN len(ts) > 0
                THEN len(list_distinct(ts))::DOUBLE / len(ts) ELSE 0.0 END, 6)
                AS unique_ratio,
              round(
                least(len(ts) / 50.0, 1.0) * 0.4
                + (1.0 - least((CASE WHEN length(text) > 0
                    THEN 1.0 - length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
                         ::DOUBLE / length(text) ELSE 1.0 END) * 2, 1.0)) * 0.3
                + (CASE WHEN len(ts) > 0
                    THEN len(list_distinct(ts))::DOUBLE / len(ts) ELSE 0.0 END) * 0.3
              , 6) AS quality_score
            FROM t
        """,
        "lang_id": f"""
            WITH toks_l AS (
              SELECT doc_id, list_filter(string_split_regex(lower(text),
                '[^a-z0-9]+'), x -> x <> '') AS ts FROM documents
            ),
            scores AS ({lang_union}),
            best AS (
              SELECT doc_id, l, s,
                row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, l DESC)
                  AS rn
              FROM scores
            )
            SELECT doc_id, CASE WHEN s > 0 THEN l ELSE 'und' END AS lang_pred
            FROM best WHERE rn = 1
        """,
        "fingerprints": f"""
            SELECT doc_id,
              list_reduce(
                list_prepend(0::BIGINT,
                  list_transform(string_split(text, ''), c -> ord(c)::BIGINT)),
                (acc, c) -> (acc * 31 + c) % {fp_mod}
              ) AS fingerprint
            FROM documents
        """,
        "dup_spans": f"""
            WITH {_wins_cte(5)},
            g AS (
              SELECT gram FROM (
                SELECT gram, count(DISTINCT doc_id) AS nd FROM wins GROUP BY 1
              ) WHERE nd >= 2
            )
            SELECT w.doc_id,
              count(*)::BIGINT AS n_windows,
              sum(CASE WHEN g.gram IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                AS n_dup_windows,
              round(sum(CASE WHEN g.gram IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
                    / count(*), 6) AS dup_window_fraction
            FROM wins w LEFT JOIN g USING (gram)
            GROUP BY 1
        """,
        "repetition_stats": """
            WITH toks_arr AS (
              SELECT doc_id, list_filter(
                string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
              FROM documents
            ),
            base AS (
              SELECT doc_id, coalesce(
                list_sum(list_transform(t, x -> length(x))), 0)::BIGINT
                AS token_chars
              FROM toks_arr
            ),
            w2 AS (
              SELECT doc_id, array_to_string(t[i:i+1], ' ') AS gram
              FROM toks_arr,
                   LATERAL (SELECT unnest(range(1, len(t))) AS i) r(i)
              WHERE len(t) >= 2
            ),
            c2 AS (SELECT doc_id, gram, count(*) AS cnt FROM w2 GROUP BY 1, 2),
            top AS (
              SELECT doc_id, (cnt * (length(gram) - 1))::BIGINT AS top_gram_chars
              FROM (SELECT *, row_number() OVER (
                      PARTITION BY doc_id ORDER BY cnt DESC, gram ASC) AS rn
                    FROM c2)
              WHERE rn = 1
            ),
            w3 AS (
              SELECT doc_id, array_to_string(t[i:i+2], ' ') AS gram
              FROM toks_arr,
                   LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i) r(i)
              WHERE len(t) >= 3
            ),
            c3 AS (SELECT doc_id, gram, count(*) AS cnt FROM w3 GROUP BY 1, 2),
            dup AS (
              SELECT doc_id, sum(cnt * (length(gram) - 2))::BIGINT
                AS dup_gram_chars
              FROM c3 WHERE cnt >= 2 GROUP BY 1
            )
            SELECT b.doc_id, b.token_chars,
              coalesce(top_gram_chars, 0)::BIGINT AS top_gram_chars,
              round(coalesce(top_gram_chars, 0)::DOUBLE
                / (CASE WHEN token_chars > 0 THEN token_chars ELSE 1 END), 6)
                AS top_gram_frac,
              coalesce(dup_gram_chars, 0)::BIGINT AS dup_gram_chars,
              round(coalesce(dup_gram_chars, 0)::DOUBLE
                / (CASE WHEN token_chars > 0 THEN token_chars ELSE 1 END), 6)
                AS dup_gram_frac
            FROM base b LEFT JOIN top USING (doc_id) LEFT JOIN dup USING (doc_id)
        """,
        "decontaminate": f"""
            WITH {_wins_cte(5)},
            probe AS (SELECT DISTINCT gram FROM wins WHERE doc_id % 7 = 0),
            dg AS (SELECT DISTINCT doc_id, gram FROM wins WHERE doc_id % 7 <> 0),
            hits AS (
              SELECT doc_id, count(*) AS nh
              FROM dg JOIN probe USING (gram) GROUP BY 1
            )
            SELECT d.doc_id,
              coalesce(nh, 0)::BIGINT AS n_probe_hits,
              coalesce(nh, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits USING (doc_id)
            WHERE d.doc_id % 7 <> 0
        """,
        "emb_cosine_topk": """
            WITH probes AS (
              SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
              FROM embeddings WHERE vec_id < 3
            ),
            scored AS (
              SELECT p.qid, e.vec_id,
                list_dot_product(e.embedding::DOUBLE[], p.qvec)
                  / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                           e.embedding::DOUBLE[]))
                     * sqrt(list_dot_product(p.qvec, p.qvec))) AS cosine
              FROM embeddings e CROSS JOIN probes p
            )
            SELECT qid, vec_id, round(cosine, 4) AS cosine, rank FROM (
              SELECT qid, vec_id, cosine,
                row_number() OVER (PARTITION BY qid
                                   ORDER BY cosine DESC, vec_id) AS rank
              FROM scored
            ) WHERE rank <= 5
        """,
        "emb_label_norms": """
            SELECT label, count(*) AS n,
              round(avg(sqrt(list_dot_product(embedding::DOUBLE[],
                                              embedding::DOUBLE[]))), 6)
                AS avg_norm
            FROM embeddings GROUP BY 1
        """,
        "events_hourly": """
            SELECT event_type, date_trunc('hour', ts) AS hour,
              count(*) AS n, round(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "lineitem_pricing": """
            SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 2) AS sum_qty,
              round(sum(l_extendedprice), 2) AS sum_base_price,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
              round(avg(l_quantity), 6) AS avg_qty,
              round(avg(l_discount), 6) AS avg_disc,
              count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY 1, 2
        """,
        "events_sessions": """
            WITH gaps AS (
              SELECT user_id, event_id, ts,
                lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  AS prev_ts
              FROM events
            ),
            flagged AS (
              SELECT user_id, event_id, ts,
                CASE WHEN prev_ts IS NULL
                       OR epoch(ts) - epoch(prev_ts) > 1800
                     THEN 1 ELSE 0 END AS new_session
              FROM gaps
            ),
            sess AS (
              SELECT user_id,
                sum(new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_id
              FROM flagged
            ),
            per_session AS (
              SELECT user_id, session_id, count(*) AS n_events
              FROM sess GROUP BY 1, 2
            )
            SELECT user_id, count(*) AS n_sessions,
              round(avg(n_events), 6) AS avg_events_per_session,
              sum(n_events)::BIGINT AS n_events_total
            FROM per_session GROUP BY 1
        """,
        "ann_lsh_topk": f"""
            WITH planes(j, pv) AS (VALUES {lsh_planes}),
            e AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ),
            bits AS (
              SELECT vec_id, j, list_dot_product(v, pv) AS dot
              FROM e CROSS JOIN planes
            ),
            sigs AS (
              SELECT vec_id,
                sum(CASE WHEN dot > 0 THEN (1::BIGINT << j)
                         ELSE 0 END)::BIGINT AS bucket
              FROM bits GROUP BY 1
            ),
            flips(f) AS (VALUES {lsh_flips}),
            probes AS (  -- query buckets + all 1-bit flips (multiprobe)
              SELECT DISTINCT xor(bucket, f) AS pb
              FROM sigs, flips WHERE vec_id < 3
            ),
            cand AS (
              SELECT vec_id FROM sigs
              WHERE bucket IN (SELECT pb FROM probes)
            ),
            q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 3),
            scored AS (
              SELECT q.qid, e.vec_id,
                list_dot_product(e.v, q.qv)
                  / (sqrt(list_dot_product(e.v, e.v))
                     * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
              FROM e JOIN cand USING (vec_id) CROSS JOIN q
            )
            SELECT query_id, vec_id, round(cosine, 4) AS cosine, rank FROM (
              SELECT 'v' || qid::VARCHAR AS query_id, vec_id, cosine,
                row_number() OVER (PARTITION BY qid
                                   ORDER BY cosine DESC, vec_id) AS rank
              FROM scored
            ) WHERE rank <= 5
        """,
        "ann_ivf_topk": """
            WITH probes AS (
              SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
              FROM embeddings WHERE vec_id >= 3 AND vec_id < 6
            ),
            scored AS (
              SELECT p.qid, e.vec_id,
                list_dot_product(e.embedding::DOUBLE[], p.qvec)
                  / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                           e.embedding::DOUBLE[]))
                     * sqrt(list_dot_product(p.qvec, p.qvec))) AS cosine
              FROM embeddings e CROSS JOIN probes p
            )
            -- nprobe = n_centroids probes every IVF cell, so the engine's
            -- candidate set is the whole corpus: plain brute-force top-k
            SELECT query_id, vec_id, round(cosine, 4) AS cosine, rank FROM (
              SELECT 'v' || qid::VARCHAR AS query_id, vec_id, cosine,
                row_number() OVER (PARTITION BY qid
                                   ORDER BY cosine DESC, vec_id) AS rank
              FROM scored
            ) WHERE rank <= 5
        """,
        "ann_lsh_served": _lsh_per_query_sql(6, 9),
        "ann_lsh_appended": _lsh_per_query_sql(12, 15),
        "ann_ivf_served": """
            WITH probes AS (
              SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
              FROM embeddings WHERE vec_id >= 9 AND vec_id < 12
            ),
            scored AS (
              SELECT p.qid, e.vec_id,
                list_dot_product(e.embedding::DOUBLE[], p.qvec)
                  / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                           e.embedding::DOUBLE[]))
                     * sqrt(list_dot_product(p.qvec, p.qvec))) AS cosine
              FROM embeddings e CROSS JOIN probes p
            )
            -- nprobe = n_centroids probes every IVF cell, so the served
            -- candidate set is the whole corpus: plain brute-force top-k
            SELECT query_id, vec_id, round(cosine, 4) AS cosine, rank FROM (
              SELECT 'v' || qid::VARCHAR AS query_id, vec_id, cosine,
                row_number() OVER (PARTITION BY qid
                                   ORDER BY cosine DESC, vec_id) AS rank
              FROM scored
            ) WHERE rank <= 5
        """,
        "ann_ivf_appended": """
            WITH probes AS (
              SELECT vec_id AS qid, embedding::DOUBLE[] AS qvec
              FROM embeddings WHERE vec_id >= 15 AND vec_id < 18
            ),
            scored AS (
              SELECT p.qid, e.vec_id,
                list_dot_product(e.embedding::DOUBLE[], p.qvec)
                  / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                           e.embedding::DOUBLE[]))
                     * sqrt(list_dot_product(p.qvec, p.qvec))) AS cosine
              FROM embeddings e CROSS JOIN probes p
            )
            -- the engine serves build(even ids) + append(odd ids) at
            -- nprobe = n_centroids: candidates = the full appended corpus,
            -- so the oracle is brute-force top-k over the WHOLE table —
            -- any lost/misrouted appended vector breaks the hash
            SELECT query_id, vec_id, round(cosine, 4) AS cosine, rank FROM (
              SELECT 'v' || qid::VARCHAR AS query_id, vec_id, cosine,
                row_number() OVER (PARTITION BY qid
                                   ORDER BY cosine DESC, vec_id) AS rank
              FROM scored
            ) WHERE rank <= 5
        """,
        "eval_metrics": """
            WITH d AS (SELECT doc_id FROM documents),
            run0 AS (
              SELECT 'q' || (doc_id % 10)::VARCHAR AS query_id, doc_id,
                     ((doc_id * 37) % 101)::DOUBLE AS score
              FROM d
            ),
            runr AS (
              SELECT query_id, doc_id, score,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS rnk
              FROM run0
            ),
            run AS (SELECT * FROM runr WHERE rnk <= 20),
            qrels AS (
              SELECT 'q' || (doc_id % 10)::VARCHAR AS query_id, doc_id,
                     (1 + (doc_id % 2))::BIGINT AS rel
              FROM d WHERE doc_id % 7 = 0
            ),
            posq AS (SELECT DISTINCT query_id FROM qrels),
            npos AS (SELECT query_id, count(*) AS npos FROM qrels GROUP BY 1),
            h5 AS (
              SELECT r.query_id, count(*) AS hits, 1.0/min(r.rnk) AS rr,
                     sum(q.rel / log2(r.rnk + 1.0)) AS dcg
              FROM run r JOIN qrels q
                ON r.query_id = q.query_id AND r.doc_id = q.doc_id
              WHERE r.rnk <= 5 GROUP BY 1
            ),
            i5 AS (
              SELECT query_id, sum(rel / log2(irank + 1.0)) AS idcg FROM (
                SELECT query_id, rel,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY rel DESC, doc_id) AS irank
                FROM qrels
              ) WHERE irank <= 5 GROUP BY 1
            ),
            h10 AS (
              SELECT r.query_id, count(*) AS hits, 1.0/min(r.rnk) AS rr,
                     sum(q.rel / log2(r.rnk + 1.0)) AS dcg
              FROM run r JOIN qrels q
                ON r.query_id = q.query_id AND r.doc_id = q.doc_id
              WHERE r.rnk <= 10 GROUP BY 1
            ),
            i10 AS (
              SELECT query_id, sum(rel / log2(irank + 1.0)) AS idcg FROM (
                SELECT query_id, rel,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY rel DESC, doc_id) AS irank
                FROM qrels
              ) WHERE irank <= 10 GROUP BY 1
            ),
            m5 AS (
              SELECT avg(coalesce(h.rr, 0)) AS mrr,
                     avg(coalesce(h.hits, 0)::DOUBLE / n.npos) AS recall,
                     avg(coalesce(h.dcg, 0) / i.idcg) AS ndcg,
                     avg(coalesce(h.hits, 0)::DOUBLE / least(n.npos, 5))
                       AS r_cap
              FROM posq p JOIN npos n USING (query_id)
              JOIN i5 i USING (query_id) LEFT JOIN h5 h USING (query_id)
            ),
            m10 AS (
              SELECT avg(coalesce(h.rr, 0)) AS mrr,
                     avg(coalesce(h.hits, 0)::DOUBLE / n.npos) AS recall,
                     avg(coalesce(h.dcg, 0) / i.idcg) AS ndcg,
                     avg(coalesce(h.hits, 0)::DOUBLE / least(n.npos, 10))
                       AS r_cap
              FROM posq p JOIN npos n USING (query_id)
              JOIN i10 i USING (query_id) LEFT JOIN h10 h USING (query_id)
            )
            SELECT metric, value FROM (
              SELECT 'mrr_5' AS metric, round(mrr, 6) AS value FROM m5
              UNION ALL SELECT 'recall_5', round(recall, 6) FROM m5
              UNION ALL SELECT 'ndcg_5', round(ndcg, 6) FROM m5
              UNION ALL SELECT 'r_cap_5', round(r_cap, 6) FROM m5
              UNION ALL SELECT 'mrr_10', round(mrr, 6) FROM m10
              UNION ALL SELECT 'recall_10', round(recall, 6) FROM m10
              UNION ALL SELECT 'ndcg_10', round(ndcg, 6) FROM m10
              UNION ALL SELECT 'r_cap_10', round(r_cap, 6) FROM m10
            ) ORDER BY metric
        """,
        "emb_near_dup": f"""
            WITH planes(j, pv) AS (VALUES {nd_planes}),
            e AS (
              SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
            ),
            bits AS (
              SELECT vec_id, j, list_dot_product(v, pv) AS dot
              FROM e CROSS JOIN planes
            ),
            sigs AS (
              SELECT vec_id,
                sum(CASE WHEN dot > 0 THEN (1::BIGINT << j)
                         ELSE 0 END)::BIGINT AS bucket
              FROM bits GROUP BY 1
            ),
            pairs AS (
              SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM sigs a JOIN sigs b
                ON a.bucket = b.bucket AND a.vec_id < b.vec_id
            ),
            verified AS (
              SELECT p.id_a, p.id_b,
                list_dot_product(ea.v, eb.v)
                  / (sqrt(list_dot_product(ea.v, ea.v))
                     * sqrt(list_dot_product(eb.v, eb.v))) AS cos
              FROM pairs p
              JOIN e ea ON ea.vec_id = p.id_a
              JOIN e eb ON eb.vec_id = p.id_b
            )
            SELECT id_a, id_b, round(cos, 4) AS cosine
            FROM verified WHERE cos >= 0.35
        """,
        "engine_bm25_topk": f"""
            WITH {_BM25_W},
            sc AS (SELECT 255.0 / max(weight) AS scale FROM w),
            qz AS (
              SELECT doc_id, term,
                CAST(round_even(weight * (SELECT scale FROM sc), 0) AS BIGINT)
                  AS qw
              FROM w
            ),
            s AS (
              SELECT query_id, doc_id, sum(qtf * qw) AS si
              FROM qz JOIN {_qt_values()} USING (term)
              GROUP BY 1, 2
            ),
            r AS (
              SELECT query_id, doc_id, si,
                row_number() OVER (PARTITION BY query_id
                                   ORDER BY si DESC, doc_id) AS rank
              FROM s WHERE si > 0
            )
            SELECT query_id, doc_id,
              round(si / (SELECT scale FROM sc), 6) AS score, rank
            FROM r WHERE rank <= 10
        """,
        "multimodal_features": """
            WITH a AS (
              SELECT doc_id AS asset_id,
                (['image', 'audio', 'video'])[(doc_id % 3) + 1] AS kind,
                octet_length(encode(text)) AS payload_len,
                (n_chars % 497 + 16)::DOUBLE AS w,
                (n_chars % 331 + 16)::DOUBLE AS h
              FROM documents
            )
            SELECT asset_id, kind, payload_len::BIGINT AS payload_len,
              32::BIGINT AS feature_dim,
              (CASE WHEN kind = 'video'
                    THEN least(8, greatest(1, payload_len // 64))
                    ELSE 0 END)::BIGINT AS n_frames,
              CAST(round(w * least(256.0 / w, 256.0 / h, 1.0))
                   AS BIGINT) AS target_width,
              CAST(round(h * least(256.0 / w, 256.0 / h, 1.0))
                   AS BIGINT) AS target_height
            FROM a
        """,
        "revenue_top5": """
            WITH rev AS (
              SELECT n.n_name, c.c_custkey,
                round(sum(o.o_totalprice), 2) AS revenue
              FROM orders o
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey
              GROUP BY 1, 2
            )
            SELECT n_name, c_custkey, revenue, rank FROM (
              SELECT n_name, c_custkey, revenue,
                row_number() OVER (PARTITION BY n_name
                                   ORDER BY revenue DESC, c_custkey) AS rank
              FROM rev
            ) WHERE rank <= 5
        """,
    }
    # warm-serving path: driver-side top-k merge over prepartitioned
    # postings is result-identical to the window path by construction, so
    # it shares the integer-domain engine oracle verbatim
    d["engine_bm25_serving"] = d["engine_bm25_topk"]
    # merging docID-disjoint segments is result-preserving (requantization
    # round-trips exactly), so the merged-index path shares it too — the
    # merge re-encode is what a green hash here additionally proves
    d["engine_merged_topk"] = d["engine_bm25_topk"]
    # incremental path: base = docID-lower half with its own stats; the
    # streamed upper half scores with FROZEN base df (0 for unseen terms) /
    # N / avgdl and base quantization scale, impacts clipped at 255.
    # Internal ids order like original doc_ids (see q_engine_incremental_
    # topk docstring) so the tie-break matches on original ids.
    d["engine_incremental_topk"] = f"""
        WITH {_TF},
        thr AS (SELECT (min(doc_id) + max(doc_id)) // 2 AS t FROM documents),
        bstats AS (
          SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl
          FROM dl WHERE doc_id <= (SELECT t FROM thr)
        ),
        bdfs AS (
          SELECT term, count(*)::DOUBLE AS df FROM tf
          WHERE doc_id <= (SELECT t FROM thr) GROUP BY 1
        ),
        w AS (
          SELECT tf.doc_id, tf.term,
            ln(1 + (n - coalesce(df, 0) + 0.5)/(coalesce(df, 0) + 0.5))
              * (tf::DOUBLE * (1.2 + 1))
              / (tf::DOUBLE + 1.2 * (1 - 0.75 + 0.75 * dl::DOUBLE / avgdl))
              AS weight
          FROM tf JOIN dl USING (doc_id)
          LEFT JOIN bdfs USING (term) CROSS JOIN bstats
        ),
        sc AS (
          SELECT 255.0 / max(weight) AS scale FROM w
          WHERE doc_id <= (SELECT t FROM thr)
        ),
        qz AS (
          SELECT doc_id, term,
            least(CAST(round_even(weight * (SELECT scale FROM sc), 0)
                       AS BIGINT), 255) AS qw
          FROM w
        ),
        s AS (
          SELECT query_id, doc_id, sum(qtf * qw) AS si
          FROM qz JOIN {_qt_values()} USING (term)
          GROUP BY 1, 2
        ),
        r AS (
          SELECT query_id, doc_id, si,
            row_number() OVER (PARTITION BY query_id
                               ORDER BY si DESC, doc_id) AS rank
          FROM s WHERE si > 0
        )
        SELECT query_id, doc_id,
          round(si / (SELECT scale FROM sc), 6) AS score, rank
        FROM r WHERE rank <= 10
    """
    d["emb_near_dup_capped"] = f"""
        WITH planes(j, pv) AS (VALUES {nd_planes}),
        e AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        bits AS (
          SELECT vec_id, j, list_dot_product(v, pv) AS dot
          FROM e CROSS JOIN planes
        ),
        sigs AS (
          SELECT vec_id,
            sum(CASE WHEN dot > 0 THEN (1::BIGINT << j)
                     ELSE 0 END)::BIGINT AS bucket
          FROM bits GROUP BY 1
        ),
        bstats AS (
          SELECT bucket, count(*) AS c, min(vec_id) AS rep
          FROM sigs GROUP BY 1
        ),
        pairs_small AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM sigs a
          JOIN sigs b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
          JOIN bstats st ON st.bucket = a.bucket
          WHERE st.c <= 30
        ),
        pairs_big AS (
          SELECT st.rep AS id_a, g.vec_id AS id_b
          FROM sigs g JOIN bstats st ON st.bucket = g.bucket
          WHERE st.c > 30 AND g.vec_id <> st.rep
        ),
        pairs AS (
          SELECT * FROM pairs_small UNION ALL SELECT * FROM pairs_big
        ),
        verified AS (
          SELECT p.id_a, p.id_b,
            list_dot_product(ea.v, eb.v)
              / (sqrt(list_dot_product(ea.v, ea.v))
                 * sqrt(list_dot_product(eb.v, eb.v))) AS cos
          FROM pairs p
          JOIN e ea ON ea.vec_id = p.id_a
          JOIN e eb ON eb.vec_id = p.id_b
        )
        SELECT DISTINCT id_a, id_b, round(cos, 4) AS cosine
        FROM verified WHERE cos >= 0.35
    """
    return d
