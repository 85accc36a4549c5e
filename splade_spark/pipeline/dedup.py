"""Deduplication operators for large-scale corpus curation.

Four families, each with a different cost/recall point at 100 TB:

- exact: hash-groupBy on normalized text — one shuffle, no false positives.
- n-gram Jaccard: exact set-overlap self-join on shingles — quadratic in
  per-shingle doc frequency, so hot shingles are dropped (df cap), the
  standard trick that keeps the join's skew bounded.
- MinHash + LSH: per-doc signatures banded into buckets; only bucket-mates
  are verified with exact Jaccard — near-linear candidate generation.
- SimHash: 64-bit weighted fingerprint, banded for Hamming-≤d candidates.

Signatures are computed JVM-side with higher-order functions where possible
(no Python for the shingle/minhash path); SimHash uses one Arrow grouped-map
over (doc, term_id, tf) rows (bit-unpacking in numpy).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tokenize import tokens_col

MERSENNE31 = (1 << 31) - 1


def normalized_text(col):
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, canonical_id): canonical = min id among docs with identical
    normalized text. Docs equal to their canonical are originals.

    Groups/joins on sha2-256 of the normalized text, not the text itself —
    the shuffle key drops from ~KB to 32 bytes per row, which at corpus
    scale is the difference between a feasible and an absurd shuffle (the
    text would otherwise cross the wire twice: groupBy + join-back).
    sha2-256 over xxhash64 because a 64-bit digest has ~n²/2^65 birthday
    collision odds (≈3% at 10⁹ docs — a silent false merge); 256 bits is
    collision-free for any realistic corpus."""
    norm = df.select(
        id_col, F.sha2(normalized_text(F.col(text_col)), 256).alias("_k")
    )
    canon = norm.groupBy("_k").agg(F.min(id_col).alias("canonical_id"))
    return norm.join(canon, "_k").select(id_col, "canonical_id")


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep one doc (min id) per normalized-text group."""
    dups = exact_duplicates(df, id_col, text_col)
    keep = dups.filter(F.col(id_col) == F.col("canonical_id")).select(id_col)
    return df.join(keep, id_col, "left_semi")


def shingles_col(text_col, n: int = 3):
    """array<string> of word n-grams (distinct not applied)."""
    toks = tokens_col(text_col)
    return F.when(F.size(toks) < n, F.array()).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )


def doc_shingles(df: DataFrame, n: int = 3, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) distinct pairs."""
    return (
        df.select(id_col, F.explode(shingles_col(F.col(text_col), n)).alias("shingle"))
        .distinct()
    )


def doc_shingle_keys(df: DataFrame, n: int = 3, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(doc_id, sh long) distinct pairs — 64-bit hashed word n-grams.

    The Jaccard pipeline only needs *equality* semantics on shingles (join
    keys, distinct counts), so the shingle string never has to exist: one
    JVM xxhash64 per word, then one xxhash64 over each window's n word
    hashes. Profiled on the fixture corpus, the slice+array_join string
    build in ``shingles_col`` was ~45% of the shingle stage (the same
    finding that motivated minhash's 'word' mode), and an 8-byte key
    roughly quarters every downstream shuffle row vs a ~25-byte shingle
    string (guide: shuffle keys, not payloads). Collision odds are
    ~k²/2^64 over distinct shingles — negligible at any realistic corpus.
    The word-hash array is materialized as a projected column first so
    each element hashes once (an inline expression would re-evaluate the
    transform per element_at).

    The exploded rows are repartitioned BY DOC before the distinct:
    HashPartitioning(doc_id) satisfies the (doc_id, sh) clustered
    distribution the dedup aggregation needs AND the doc_id distribution
    every downstream per-doc aggregation (sizes) needs, so one exchange
    serves both — measured 2.5× over letting distinct exchange on
    (doc_id, sh) and sizes re-exchange on doc_id. The trade (the doc
    exchange carries within-doc duplicate grams that map-side partial
    dedup would have collapsed) is bounded by document length and
    measured well worth it; keying by doc also cannot skew — a hot
    SHINGLE spreads across doc partitions, and a single doc is bounded."""
    wh = F.transform(tokens_col(F.col(text_col)), lambda w: F.xxhash64(w))
    tmp = df.select(id_col, wh.alias("_wh"))
    keys = F.when(
        F.size("_wh") < n, F.array().cast("array<bigint>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size("_wh") - n),
            lambda i: F.xxhash64(
                *[F.element_at(F.col("_wh"), i + j + 1) for j in range(n)]
            ),
        )
    )
    return (
        tmp.select(id_col, F.explode(keys).alias("sh"))
        .repartition(F.col(id_col))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    tau: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int = 10000,
    cache_registry: list | None = None,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs with n-gram Jaccard >= tau, a < b.

    Exact (given the df cap): |A∩B| from the shingle self-join,
    |A∪B| = |A|+|B|-|A∩B|. max_shingle_df drops ubiquitous shingles to
    bound join skew (at 100 TB this cap is what keeps the op feasible;
    shingles that common carry no dedup signal anyway).

    Shape: shingles travel as hashed 64-bit keys (doc_shingle_keys), the
    self-join input keeps only shingles with 2 <= df <= cap — a df-1
    shingle cannot produce an (a, b) pair, and on natural corpora most
    distinct shingles are df-1, so this drops the bulk of the join input
    with an identical result — and that filtered table is cached so the
    a/b sides of the self-join don't each recompute the freq join.

    cache_registry: the shingle table and the df-filtered join input are
    cached (each has multiple consumers in the returned plan); pass a
    list and the cached frames are appended so the caller can unpersist
    after consuming the result — a curation loop calling this per-corpus
    otherwise accumulates pinned cache entries per call (same contract as
    documents.assign_doc_ids).
    """
    sh = doc_shingle_keys(df, n, id_col, text_col).cache()
    if cache_registry is not None:
        cache_registry.append(sh)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    freq = sh.groupBy("sh").agg(F.count("*").alias("sdf"))
    sh_f = sh.join(
        freq.filter(
            (F.col("sdf") <= max_shingle_df) & (F.col("sdf") >= 2)
        ).select("sh"),
        "sh",
    ).cache()
    if cache_registry is not None:
        cache_registry.append(sh_f)
    a = sh_f.select(F.col(id_col).alias("doc_a"), "sh")
    b = sh_f.select(F.col(id_col).alias("doc_b"), "sh")
    common = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    out = (
        common.join(sizes.withColumnRenamed(id_col, "doc_a")
                    .withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed(id_col, "doc_b")
              .withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= tau)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def _hash_coeffs(num_hashes: int, seed: int = 42) -> tuple[list[int], list[int]]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE31, size=num_hashes).tolist()
    b = rng.integers(0, MERSENNE31, size=num_hashes).tolist()
    return a, b


def minhash_signatures(
    df: DataFrame,
    n: int = 3,
    num_hashes: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 42,
    base_hash: str = "word",
) -> DataFrame:
    """(doc_id, sig array<long>): MinHash over word n-gram shingles.

    base_hash modes (all yield valid MinHash families; signatures are NOT
    comparable across modes):

    - 'word' (default, fastest): ONE JVM xxhash64 per WORD, then the
      shingle base hash is a vectorized rolling combination of n
      consecutive word hashes in the Arrow kernel (odd seeded constants,
      wraparound uint64, mod p) — no shingle-string allocation at all.
      Profiled on 5 KB fixture docs: the shingle-string HOF
      (slice+array_join per position) was ~45% of the whole op and the
      per-doc Python loop another ~50%; this mode removes both (the
      min-reduce runs as chunked minimum.reduceat across the whole Arrow
      batch, memory-bounded).
    - 'xxhash64': shingle string → JVM xxhash64 (one hash per shingle;
      the pre-round-4 production mode, kept for signature stability).
    - 'polyhash': the shared rolling polynomial hash, SQL-reproducible —
      lets an external ANSI-SQL oracle replicate signatures bit-for-bit;
      costs ~|shingle| ops per shingle, oracle use only.

    The (a·h+b) mod p min-reduction is exact uint64 (a,h < 2^31 so
    a·h+b < 2^63)."""
    import numpy as np
    from collections.abc import Iterator

    a, b = _hash_coeffs(num_hashes, seed)
    spark = df.sparkSession
    bab = spark.sparkContext.broadcast(
        (np.array(a, dtype=np.uint64), np.array(b, dtype=np.uint64))
    )

    if base_hash == "word":
        toks = tokens_col(F.col(text_col))
        src = df.select(
            id_col,
            F.transform(toks, lambda w: F.xxhash64(w)).alias("word_hashes"),
        ).filter(F.size("word_hashes") >= n)
        # odd combine constants: seeded, distinct from the (a,b) family
        crng = np.random.default_rng(seed + 1)
        comb = (
            crng.integers(1, 1 << 62, size=n, dtype=np.uint64) << np.uint64(1)
        ) | np.uint64(1)
        bcomb = spark.sparkContext.broadcast(comb)

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            A, B = bab.value
            C = bcomb.value
            M = np.uint64(MERSENNE31)
            H = len(A)
            # slab size bounds the (H, slab) work matrix: 1<<17 shingles
            # x 64 hashes x 8 B ~= 67 MB per slab
            SLAB = 1 << 17
            for pdf in batches:
                col = pdf["word_hashes"]
                ndoc = len(col)
                if ndoc == 0:
                    continue
                lens = np.fromiter(
                    (len(h) for h in col), dtype=np.int64, count=ndoc
                )
                flat = np.concatenate(
                    [np.asarray(h, dtype=np.int64) for h in col]
                ).astype(np.uint64)
                total = len(flat)
                L = total - n + 1
                acc = np.zeros(L, dtype=np.uint64)
                for j in range(n):
                    acc += flat[j : j + L] * C[j]
                sh_all = acc % M
                # window starts crossing a doc boundary are invalid:
                # doc at [s, s+l) owns starts [s, s+l-n]
                starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
                ve = np.minimum(starts + lens - n + 1, L)
                dif = np.zeros(L + 1, dtype=np.int32)
                np.add.at(dif, starts, 1)
                np.add.at(dif, ve, -1)
                sh_valid = sh_all[np.cumsum(dif[:-1]) > 0]
                nsh = lens - n + 1  # >=1: JVM filter guarantees len>=n
                seg = np.concatenate(([0], np.cumsum(nsh)))
                sig_out = np.empty((ndoc, H), dtype=np.int64)
                i = 0
                while i < ndoc:
                    j = int(
                        np.searchsorted(seg, seg[i] + SLAB, side="left")
                    )
                    j = max(i + 1, min(j, ndoc))
                    sub = sh_valid[seg[i] : seg[j]]
                    m = (A[:, None] * sub[None, :] + B[:, None]) % M
                    red = np.minimum.reduceat(m, seg[i:j] - seg[i], axis=1)
                    sig_out[i:j] = red.T.astype(np.int64)
                    i = j
                yield pd.DataFrame(
                    {id_col: pdf[id_col], "sig": [r.tolist() for r in sig_out]}
                )

        return src.mapInPandas(kernel, schema=f"{id_col} long, sig array<long>")

    sh = shingles_col(F.col(text_col), n)
    if base_hash == "polyhash":
        from .textstats import fingerprint_col

        base = F.transform(
            sh, lambda s: F.pmod(fingerprint_col(s), F.lit(MERSENNE31))
        )
    else:
        base = F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(MERSENNE31)))
    src = df.select(id_col, base.alias("base_hashes")).filter(
        F.size("base_hashes") > 0
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        A, B = bab.value
        M = np.uint64(MERSENNE31)
        for pdf in batches:
            sigs = []
            for h in pdf["base_hashes"]:
                hh = np.asarray(h, dtype=np.uint64)
                m = (A[:, None] * hh[None, :] + B[:, None]) % M
                sigs.append(m.min(axis=1).astype(np.int64).tolist())
            yield pd.DataFrame({id_col: pdf[id_col], "sig": sigs})

    return src.mapInPandas(kernel, schema=f"{id_col} long, sig array<long>")


def minhash_lsh_candidates(
    signatures: DataFrame,
    bands: int = 16,
    id_col: str = "doc_id",
    hash_buckets: bool = True,
) -> DataFrame:
    """(doc_a, doc_b): pairs sharing at least one LSH band bucket.

    hash_buckets=True folds each band's value string through xxhash64 so
    the equi-join key is 8 bytes; False joins on the raw comma-joined
    string (wider keys, but exactly reproducible in ANSI SQL).

    (A banded-frame cache like simhash_near_dup_pairs' was measured here
    and rejected: the banded frame is a cheap projection of the already-
    cached signatures, and the cold/warm A/B was a wash — the cache only
    pays when the recomputed subtree is expensive.)"""
    sig_len = F.size("sig")
    rows_per_band = (sig_len / bands).cast("int")

    def _bucket(b):
        raw = F.array_join(
            F.transform(
                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                lambda x: x.cast("string"),
            ),
            ",",
        )
        return F.xxhash64(raw).cast("string") if hash_buckets else raw

    banded = signatures.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(b.alias("band"), _bucket(b).alias("bucket")),
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.select(F.col(id_col).alias("doc_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("doc_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    n: int = 3,
    tau: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    base_hash: str = "word",
    hash_buckets: bool = True,
    cache_registry: list | None = None,
) -> DataFrame:
    """LSH candidates verified with *exact* n-gram Jaccard.

    Output ⊆ ngram_jaccard_pairs output; LSH only bounds the candidate set
    (recall ≈ 1 - (1 - tau^(h/bands))^bands, tunable). With
    base_hash='polyhash' and hash_buckets=False every stage is
    ANSI-SQL-reproducible (the harness oracle re-runs the whole pipeline
    in DuckDB, injecting the (a,b) coefficients as literals).

    cache_registry: the signature and shingle tables are cached (each has
    multiple consumers in the returned plan); pass a list to receive the
    cached frames for unpersist-after-consume — see ngram_jaccard_pairs."""
    sigs = minhash_signatures(
        df, n, num_hashes, id_col, text_col, base_hash=base_hash
    ).cache()
    if cache_registry is not None:
        cache_registry.append(sigs)
    cands = minhash_lsh_candidates(sigs, bands, id_col, hash_buckets=hash_buckets)
    # cheap signature-level Jaccard estimate prunes most candidates before
    # the exact shingle-join verify (estimate is unbiased with sd
    # ~= sqrt(j(1-j)/num_hashes); the 0.2 slack keeps recall of true
    # >=tau pairs high while discarding the low-sim bulk)
    sig_a = sigs.select(F.col(id_col).alias("doc_a"), F.col("sig").alias("sig_a"))
    sig_b = sigs.select(F.col(id_col).alias("doc_b"), F.col("sig").alias("sig_b"))
    est = (
        cands.join(sig_a, "doc_a")
        .join(sig_b, "doc_b")
        .withColumn(
            "est_j",
            F.size(
                F.filter(
                    F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                    lambda e: e,
                )
            )
            / F.size("sig_a"),
        )
    )
    cands = est.filter(F.col("est_j") >= tau - 0.2).select("doc_a", "doc_b").cache()
    if cache_registry is not None:
        cache_registry.append(cands)
    # exact verify touches ONLY candidate docs: at corpus scale the verify
    # shingle pass must cost O(candidates), not a second full-corpus
    # shingle job (sizes are only consumed for candidate pairs anyway).
    # Shingles travel as hashed 64-bit keys (doc_shingle_keys): the verify
    # only needs equality/counts, and an 8-byte key shrinks the
    # (doc_b, shingle) join shuffle ~4x vs the shingle string.
    cand_ids = (
        cands.select(F.col("doc_a").alias(id_col))
        .union(cands.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    sh = doc_shingle_keys(
        df.join(cand_ids, id_col, "left_semi"), n, id_col, text_col
    ).cache()
    if cache_registry is not None:
        cache_registry.append(sh)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))
    # verify candidates with exact Jaccard: common shingles per pair
    a_sh = sh.withColumnRenamed(id_col, "doc_a")
    b_sh = sh.withColumnRenamed(id_col, "doc_b")
    common = (
        cands.join(a_sh, "doc_a")
        .join(b_sh, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(sizes.withColumnRenamed(id_col, "doc_a")
                    .withColumnRenamed("sz", "sz_a"), "doc_a")
        .join(sizes.withColumnRenamed(id_col, "doc_b")
              .withColumnRenamed("sz", "sz_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")),
        )
        .filter(F.col("jaccard") >= tau)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_signatures(
    term_freqs: DataFrame, id_col: str = "doc_id", hash_col: str = "term_id"
) -> DataFrame:
    """(doc_id, simhash long): 64-bit tf-weighted SimHash.

    Input: (doc_id, hash_col, tf) — hash_col is a 64-bit-ish hash of the
    term (xxhash64 by default; pass a polyhash column for SQL-oracle
    parity), its bits are the per-term random projection.

    Shape at scale: one repartition(doc) + sortWithinPartitions(doc), then
    a *streaming* mapInPandas — each Arrow batch computes all its complete
    docs' signatures in one vectorized pass (bit unpack → ±tf contribution
    → per-doc np.add.reduceat), carrying the trailing possibly-incomplete
    doc into the next batch. The previous groupBy(doc).applyInPandas built
    a pandas DataFrame *per document* — per-group overhead dominates at
    10⁹ docs. Accumulation is exact int64 (tf is integral), so signatures
    are deterministic and SQL-reproducible."""
    spark = term_freqs.sparkSession
    src = term_freqs.select(id_col, F.col(hash_col).alias("_h"), "tf")
    n_part = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
        spark.sparkContext.defaultParallelism,
    )
    arranged = src.repartition(n_part, id_col).sortWithinPartitions(id_col)

    def _compute(pdf: pd.DataFrame) -> pd.DataFrame:
        h = pdf["_h"].to_numpy(np.int64).view(np.uint64)
        tf = pdf["tf"].to_numpy(np.int64)
        doc = pdf[id_col].to_numpy()
        bits = (
            (h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        ).astype(np.int64)
        contrib = (2 * bits - 1) * tf[:, None]
        starts = np.flatnonzero(np.concatenate(([True], doc[1:] != doc[:-1])))
        acc = np.add.reduceat(contrib, starts, axis=0)
        pow2 = np.uint64(1) << np.arange(64, dtype=np.uint64)
        sig = ((acc > 0).astype(np.uint64) * pow2[None, :]).sum(axis=1)
        return pd.DataFrame(
            {id_col: doc[starts], "simhash": sig.view(np.int64)}
        )

    def kernel(batches):
        pending: pd.DataFrame | None = None
        for pdf in batches:
            if pending is not None and len(pending):
                pdf = pd.concat([pending, pdf], ignore_index=True)
                pending = None
            if len(pdf) == 0:
                continue
            d = pdf[id_col].to_numpy()
            not_tail = np.flatnonzero(d != d[-1])
            cut = int(not_tail[-1]) + 1 if len(not_tail) else 0
            pending = pdf.iloc[cut:]
            body = pdf.iloc[:cut]
            if len(body):
                yield _compute(body)
        if pending is not None and len(pending):
            yield _compute(pending)

    return arranged.mapInPandas(kernel, schema=f"{id_col} long, simhash long")


def simhash_band_specs(max_hamming: int) -> list[tuple[int, int, int]]:
    """(band, shift, width) triples partitioning the 64 signature bits into
    max_hamming+1 bands — the pigeonhole guarantee: any pair within
    max_hamming differing bits shares at least one *identical* band."""
    nbands = max_hamming + 1
    if nbands > 64:
        raise ValueError("max_hamming >= 64 makes every pair a candidate")
    base, rem = divmod(64, nbands)
    specs, off = [], 0
    for b in range(nbands):
        w = base + (1 if b < rem else 0)
        specs.append((b, off, w))
        off += w
    return specs


def simhash_near_dup_pairs(
    signatures: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """(doc_a, doc_b, hamming): pairs within max_hamming bits.

    Banding: max_hamming+1 bands partitioning the 64 bits — any pair with
    hamming ≤ max_hamming shares ≥1 exact band (pigeonhole), so candidate
    generation is complete and is a bucket equi-join. Large max_hamming
    means narrow bands (64/(d+1) bits) whose buckets collide heavily.

    max_bucket_size: skew guard for the within-bucket self-join (the
    cosine_near_dup_pairs guard, ported — similarity.py). Templated /
    boilerplate-heavy corpora produce CORRELATED simhash bits, so many
    docs share identical band values and a hot (band, v) bucket goes
    quadratic: measured on 40k templated fixture docs, the uncapped join
    was 3.2x superlinear vs 4k. Buckets over the cap switch to star
    linking against the bucket's min-id representative (linear in bucket
    size); pairs whose similarity lives ONLY in an oversized bucket and
    not with its representative are the accepted recall trade. None
    (default) keeps the exact pigeonhole-complete semantics.

    cache_registry: the banded frame is cached — both sides of the bucket
    self-join consume it, and without the cache the entire upstream
    signature pipeline (term aggregation + the Arrow signature kernel)
    executes twice, once per join side (no exchange reuse across the a/b
    subtrees). Pass a list to receive the cached frame for
    unpersist-after-consume (see ngram_jaccard_pairs)."""
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                (
                    F.col("simhash")
                    if w >= 64
                    else F.shiftright(F.col("simhash"), off).bitwiseAND(
                        F.lit((1 << w) - 1)
                    )
                ).alias("v"),
            )
            for b, off, w in simhash_band_specs(max_hamming)
        ]
    )
    banded = signatures.select(id_col, "simhash", F.explode(bands).alias("bb")).select(
        id_col, "simhash", F.col("bb.band").alias("band"), F.col("bb.v").alias("v")
    ).cache()
    if cache_registry is not None:
        cache_registry.append(banded)
    if max_bucket_size is not None:
        stats = banded.groupBy("band", "v").agg(
            F.count("*").alias("_bsize"), F.min(id_col).alias("_rep")
        )
        # (band, v) cardinality can approach n·bands on a diverse corpus —
        # no forced broadcast; AQE picks the strategy
        bb = banded.join(stats, ["band", "v"])
        small = bb.filter(F.col("_bsize") <= max_bucket_size)
        big = bb.filter(F.col("_bsize") > max_bucket_size)
        a = small.select(
            F.col(id_col).alias("doc_a"), F.col("simhash").alias("sig_a"),
            "band", "v",
        )
        b = small.select(
            F.col(id_col).alias("doc_b"), F.col("simhash").alias("sig_b"),
            "band", "v",
        )
        small_pairs = (
            a.join(b, ["band", "v"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "sig_a", "sig_b")
        )
        reps = big.filter(F.col(id_col) == F.col("_rep")).select(
            "band", "v",
            F.col(id_col).alias("doc_a"), F.col("simhash").alias("sig_a"),
        )
        # rep is the bucket min id, so doc_a < doc_b holds by construction
        big_pairs = (
            big.filter(F.col(id_col) != F.col("_rep"))
            .select(
                "band", "v",
                F.col(id_col).alias("doc_b"), F.col("simhash").alias("sig_b"),
            )
            .join(reps, ["band", "v"])
            .select("doc_a", "doc_b", "sig_a", "sig_b")
        )
        cand = small_pairs.unionByName(big_pairs)
    else:
        a = banded.select(
            F.col(id_col).alias("doc_a"), F.col("simhash").alias("sig_a"),
            "band", "v",
        )
        b = banded.select(
            F.col(id_col).alias("doc_b"), F.col("simhash").alias("sig_b"),
            "band", "v",
        )
        cand = (
            a.join(b, ["band", "v"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "sig_a", "sig_b")
        )
    return (
        cand.distinct()
        .withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
