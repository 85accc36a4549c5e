"""Text analysis for corpus curation: language ID, quality scoring, token
counting, document fingerprinting.

All pure Spark SQL expressions (codegen'd, no UDFs) so they run at scan
speed and are 1:1 expressible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tokenize import tokens_col

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "por"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "nicht"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
}


def token_count_whitespace(text: Column) -> Column:
    """Whitespace token count (empty string → 0)."""
    t = F.trim(text)
    return F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+")))


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish subword proxy: alnum runs + standalone punctuation marks,
    the regex approximation of a byte-pair tokenizer's pre-tokenizer."""
    return F.size(
        F.regexp_extract_all(F.lower(text), F.lit(r"([a-z0-9]+|[^a-z0-9\s])"), 1)
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn(
        "n_tokens_ws", token_count_whitespace(F.col(text_col))
    ).withColumn(
        "n_tokens_bpe",
        F.size(F.regexp_extract_all(F.lower(F.col(text_col)),
                                    F.lit(r"([a-z0-9]+|[^a-z0-9\s])"), 1)),
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / uniqueness features + a composite
    quality score in [0,1]. Deterministic double arithmetic."""
    toks = tokens_col(F.col(text_col))
    n_chars = F.length(F.col(text_col))
    n_alnum = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", ""))
    sw = F.array([F.lit(s) for s in LANG_STOPWORDS["en"]])
    out = (
        df.withColumn("n_chars_q", n_chars)
        .withColumn("n_words", F.size(toks))
        .withColumn(
            "punct_ratio",
            F.when(n_chars > 0, 1.0 - n_alnum / n_chars.cast("double")).otherwise(1.0),
        )
        .withColumn(
            "stopword_ratio",
            F.when(
                F.size(toks) > 0,
                F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
                / F.size(toks).cast("double"),
            ).otherwise(0.0),
        )
        .withColumn(
            "unique_ratio",
            F.when(
                F.size(toks) > 0,
                F.size(F.array_distinct(toks)) / F.size(toks).cast("double"),
            ).otherwise(0.0),
        )
        .withColumn(
            "mean_word_len",
            F.when(
                F.size(toks) > 0,
                F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
                / F.size(toks).cast("double"),
            ).otherwise(0.0),
        )
    )
    # composite: long enough, not punctuation soup, some lexical diversity
    score = (
        F.least(F.col("n_words") / 50.0, F.lit(1.0)) * 0.4
        + (1.0 - F.least(F.col("punct_ratio") * 2, F.lit(1.0))) * 0.3
        + F.col("unique_ratio") * 0.3
    )
    return out.withColumn("quality_score", score)


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: stopword-profile hit ratio per language;
    CJK-codepoint share short-circuits to 'zh'. Adds (lang_pred,
    lang_conf)."""
    toks = tokens_col(F.col(text_col))
    n = F.size(toks).cast("double")
    cjk = F.length(F.regexp_replace(F.col(text_col), r"[^一-鿿]", ""))
    scores = []
    for lang, words in LANG_STOPWORDS.items():
        arr = F.array([F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scores.append(F.struct((hits / F.greatest(n, F.lit(1.0))).alias("s"),
                               F.lit(lang).alias("l")))
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        "lang_pred",
        F.when(cjk * 2 >= F.length(F.col(text_col)), F.lit("zh")).otherwise(
            F.when(best["s"] > 0, best["l"]).otherwise(F.lit("und"))
        ),
    ).withColumn(
        "lang_conf",
        F.when(cjk * 2 >= F.length(F.col(text_col)), F.lit(1.0)).otherwise(best["s"]),
    )


# chosen so (FP_MOD-1)*FP_BASE + 0x10FFFF < 2^63: no int64 overflow under
# ANSI arithmetic in either Spark or DuckDB
FP_MOD = (1 << 56) - 5
FP_BASE = 31


def fingerprint_col(text: Column) -> Column:
    """Polynomial rolling hash over code points, mod 2^61-1 — a
    deterministic full-document fingerprint expressible in ANSI SQL
    (aggregate/list_reduce), unlike engine-specific hash builtins."""
    codes = F.transform(F.split(text, ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: F.pmod(acc * FP_BASE + c, F.lit(FP_MOD)),
    )


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds (fingerprint long, min_gram_fp long): full-text polyhash and the
    minimum 8-gram character polyhash (winnowing-style near-dup signal)."""
    toks = F.split(F.col(text_col), "")
    n = F.size(toks)
    gram = 8
    gram_fps = F.transform(
        F.sequence(F.lit(0), F.greatest(n - gram, F.lit(0))),
        lambda i: F.aggregate(
            F.transform(F.slice(toks, i + 1, gram), lambda c: F.ascii(c).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, c: F.pmod(acc * FP_BASE + c, F.lit(FP_MOD)),
        ),
    )
    return df.withColumn("fingerprint", fingerprint_col(F.col(text_col))).withColumn(
        "min_gram_fp", F.when(n >= gram, F.array_min(gram_fps)).otherwise(F.lit(None))
    )
