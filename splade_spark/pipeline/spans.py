"""Window-gram (token n-gram span) operators for corpus curation.

Three operators over the same shingle machinery as dedup.py, each a
standard large-scale training-data step the reference corpus tooling has
no analogue for (the reference has no curation layer at all; these extend
the pipeline family SURVEY.md groups with dedup/textstats):

- duplicate_span_stats: substring-level duplication signal (Lee et al.,
  "Deduplicating Training Data Makes Language Models Better") — for each
  document, the fraction of its token windows whose n-gram also occurs in
  other documents. A suffix array is the single-node tool for this; the
  distributed re-expression is shingle → count distinct docs per gram →
  join back, which is three shuffles with full map-side partial
  aggregation and no self-join (unlike pair-generation dedup, there is no
  quadratic blow-up and no df cap needed — a gram shared by 10^6 docs is
  one reduce key, not 10^12 pairs).
- repetition_stats: Gopher-style within-document repetition quality
  signals (Rae et al. 2021, §A1.1): fraction of characters in the most
  frequent 2-gram and in duplicated 3-grams. Per-document aggregation
  only — the shuffle key is (doc_id, gram), so partitions stay balanced
  no matter how pathological a single document is.
- decontaminate: benchmark-contamination flagging — mark documents that
  contain any probe n-gram from an evaluation set. The probe set is
  small by construction (a benchmark, not a corpus), so it is broadcast;
  the corpus side is a single scan + explode with no shuffle at all
  before the per-doc count.

All three are pure JVM Spark SQL (codegen'd higher-order functions, no
Python in the hot path) and are replayed 1:1 in the DuckDB oracle. All
ratio outputs are computed as ONE integer-over-integer division at the
end — never a float sum across rows — so results are bit-deterministic
under any partitioning / reduce order.

Scale notes (100 TB): duplicate_span_stats' gram key is xxhash64(gram) by
default so the shuffle carries 8-byte keys instead of ~50-byte strings
(hash_mode="raw" keeps the string for the value-level oracle, like
minhash's polyhash oracle mode). Collision odds at 10^12 distinct grams
are ~n²/2^65 ≈ 3% for one collision anywhere — acceptable for a
statistic; use raw mode where exactness matters more than shuffle width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tokenize import tokens_col
from .dedup import shingles_col


def _doc_grams(
    df: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, gram) — one row per window OCCURRENCE (not distinct)."""
    return df.select(
        id_col, F.explode(shingles_col(F.col(text_col), n)).alias("gram")
    )


def duplicate_span_stats(
    df: DataFrame,
    n: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Per-document duplicated-span statistics.

    A window (token n-gram occurrence) is *duplicated* when its gram
    occurs in >= min_docs distinct documents. Returns one row per document
    that has at least one window (documents shorter than n tokens have no
    windows and do not appear):

      (doc_id, n_windows, n_dup_windows, dup_window_fraction)

    dup_window_fraction = n_dup_windows / n_windows, computed as a single
    integer division (deterministic under any reduce order).

    Plan shape: explode → [hash] → distinct (doc, gram) → count docs per
    gram → filter → join back to occurrences → per-doc count. Three
    shuffles, all with partial aggregation; no self-join, so no df cap is
    needed — unlike pair-generating dedup this is linear in corpus size
    regardless of how hot a gram is.
    """
    wins = _doc_grams(df, n, id_col, text_col)
    if hash_mode == "xxhash64":
        wins = wins.select(id_col, F.xxhash64("gram").alias("g"))
    elif hash_mode == "raw":
        wins = wins.select(id_col, F.col("gram").alias("g"))
    else:
        raise ValueError(f"hash_mode must be 'xxhash64' or 'raw', got {hash_mode!r}")
    gram_docs = (
        wins.distinct()
        .groupBy("g")
        .agg(F.count("*").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("g", F.lit(1).alias("_dup"))
    )
    return (
        wins.join(gram_docs, "g", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_windows"),
            F.count("_dup").alias("n_dup_windows"),
        )
        .withColumn(
            "dup_window_fraction",
            F.col("n_dup_windows").cast("double") / F.col("n_windows"),
        )
    )


def _token_chars(text: Column) -> Column:
    """Total characters across tokens (separators excluded) — the
    denominator for repetition fractions. Integer."""
    return F.aggregate(
        tokens_col(text), F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )


def repetition_stats(
    df: DataFrame,
    top_n: int = 2,
    dup_n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style within-document repetition signals.

    For each document:
      top{top_n}gram_chars — characters covered by occurrences of the
        single most frequent top_n-gram (ties broken by lexicographically
        smallest gram), counting token characters only (no separators);
      dup{dup_n}gram_chars — characters covered by occurrences of all
        dup_n-grams that occur >= 2 times within the document;
      *_frac — each over total token characters, as ONE integer division.

    Documents with fewer than top_n/dup_n tokens get 0 for the respective
    numerator; documents with no tokens get 0.0 fractions. Output:

      (doc_id, token_chars, top_gram_chars, top_gram_frac,
       dup_gram_chars, dup_gram_frac)

    Everything is keyed by (doc_id, gram): partitions stay balanced even
    for a single pathological document, and the per-gram char arithmetic
    is integral (gram string length minus its n-1 separators = sum of its
    token lengths), so no float accumulates across rows.
    """
    base = df.select(id_col, _token_chars(F.col(text_col)).alias("token_chars"))

    top_counts = (
        _doc_grams(df, top_n, id_col, text_col)
        .groupBy(id_col, "gram")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cnt"), F.asc("gram"))
    top = (
        top_counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            id_col,
            (F.col("cnt") * (F.length("gram") - (top_n - 1))).alias("top_gram_chars"),
        )
    )

    dup = (
        _doc_grams(df, dup_n, id_col, text_col)
        .groupBy(id_col, "gram")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .groupBy(id_col)
        .agg(
            F.sum(F.col("cnt") * (F.length("gram") - (dup_n - 1))).alias(
                "dup_gram_chars"
            )
        )
    )

    out = (
        base.join(top, id_col, "left")
        .join(dup, id_col, "left")
        .fillna(0, subset=["top_gram_chars", "dup_gram_chars"])
    )
    denom = F.when(F.col("token_chars") > 0, F.col("token_chars")).otherwise(1)
    return out.select(
        id_col,
        "token_chars",
        "top_gram_chars",
        (F.col("top_gram_chars").cast("double") / denom).alias("top_gram_frac"),
        "dup_gram_chars",
        (F.col("dup_gram_chars").cast("double") / denom).alias("dup_gram_frac"),
    )


def probe_grams(
    bench_df: DataFrame, n: int = 5, text_col: str = "text"
) -> DataFrame:
    """Distinct token n-grams of an evaluation/benchmark set — the probe
    side of decontaminate(). Small by construction (benchmarks are KBs to
    MBs); callers broadcast it."""
    return (
        bench_df.select(F.explode(shingles_col(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def decontaminate(
    df: DataFrame,
    probes: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination flagging: per document, how many DISTINCT
    probe n-grams it contains and whether it is contaminated at all.

      (doc_id, n_probe_hits, contaminated)

    Every input document appears (zero hits included). The probe frame
    must have a `gram` column (see probe_grams) and is broadcast — the
    corpus side is scan + explode + broadcast-semi-join with no shuffle
    before the per-doc count, so cost is one pass over the corpus
    regardless of probe-set size up to broadcast limits (~100s of MB of
    grams; beyond that, drop the F.broadcast hint and let AQE pick)."""
    doc_grams = _doc_grams(df, n, id_col, text_col).distinct()
    hits = (
        doc_grams.join(F.broadcast(probes.select("gram").distinct()), "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_probe_hits"))
    )
    return (
        df.select(id_col)
        .join(hits, id_col, "left")
        .fillna(0, subset=["n_probe_hits"])
        .select(
            id_col,
            "n_probe_hits",
            (F.col("n_probe_hits") > 0).alias("contaminated"),
        )
    )
