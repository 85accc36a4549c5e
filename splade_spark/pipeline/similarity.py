"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline. Queries are broadcast as a
  numpy matrix; the corpus streams through a mapInPandas kernel doing one
  BLAS matmul per Arrow batch with a per-partition top-k, then a global
  window merge — same partial-topk shape as the retrieval engine.
- random-hyperplane LSH: the scale path. Sign-bit signatures bucket the
  corpus; queries probe their own bucket (+ multiprobe neighbors), exact
  rerank inside buckets. Candidate generation is an equi-join, so it
  shuffles once and never goes quadratic.
- cosine near-duplicate pairs: bucket-join + exact verify, for
  embedding-based dedup of training corpora.

A pure-SQL brute-force variant (explode + join + groupBy) is provided for
DuckDB oracle parity — same math, all built-ins.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEED = 42


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def seeded_vector_sample(
    embeddings: DataFrame,
    sample_size: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = SEED,
) -> pd.DataFrame:
    """Deterministic, partition-order-invariant driver-side training sample.

    Rows are ranked by a content hash of their id (xxhash64(id, seed)) and
    the ``sample_size`` smallest are taken. orderBy+limit compiles to
    TakeOrderedAndProject — per-partition partial top-k + driver merge, no
    full sort shuffle — so at 100 TB the cost is one (id, vec) scan.

    Why not ``df.sample(fraction, seed)``: Spark seeds its Bernoulli sampler
    per PARTITION INDEX, so the chosen rows change whenever the input is
    repartitioned or file-split differently — a quantizer trained on it is
    layout-dependent. The hash rank depends only on row content, so the
    sample (and any k-means trained on it) is identical across layouts.
    Returned sorted by id for a stable row order (k-means centroid init
    picks rows by position)."""
    h = F.xxhash64(F.col(id_col), F.lit(seed))
    pdf = (
        embeddings.select(id_col, vec_col)
        .orderBy(h.asc(), F.col(id_col).asc())
        .limit(sample_size)
        .toPandas()
    )
    return pdf.sort_values(id_col, ignore_index=True)


def brute_cosine_topk(
    embeddings: DataFrame,
    query_vectors: pd.DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k. query_vectors: pandas (query_id, embedding list).

    Per Arrow batch: one float64 matmul (corpus_batch × queries^T) +
    argpartition top-k; global merge by window. Total order
    (cosine desc, vec_id asc)."""
    spark = embeddings.sparkSession
    qids = query_vectors["query_id"].tolist()
    qmat = _normalize(np.array(query_vectors["embedding"].tolist(), dtype=np.float64))
    bq = spark.sparkContext.broadcast((qids, qmat))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, qmat_ = bq.value
        qarr = np.asarray(qids_, dtype=object)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            mat = _normalize(np.array(pdf[vec_col].tolist(), dtype=np.float64))
            sims = mat @ qmat_.T  # (batch, nq)
            kk = min(k, len(ids))
            top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
            # ONE output frame per Arrow batch (query-major), not one
            # pandas DataFrame per query — frame-construction overhead
            # dominated the rerank at large batch sizes
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qarr, kk),
                    id_col: ids[top].T.ravel(),
                    "cosine": np.take_along_axis(sims, top, axis=0).T.ravel(),
                }
            )

    local = embeddings.select(id_col, vec_col).mapInPandas(
        kernel, schema=f"query_id string, {id_col} long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def bucketed_cosine_topk(
    candidates: DataFrame,
    query_vectors: pd.DataFrame,
    query_probes: dict[str, list[int]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Exact cosine top-k where each query only scores candidates in its
    OWN probe buckets (``query_probes``: query_id → bucket/cell list).

    This is the served-batch scale path: a union-probe rerank costs
    |∪ candidates| × n_queries, so a 10k-query batch touching 10% of the
    buckets reranks every query against ~10% of the corpus; here the work
    is Σ_q |candidates_q| — each Arrow batch is grouped by its partition
    key and matmul'ed only against the queries probing that key. A vector
    lives in exactly one bucket (LSH) / cell (IVF), so no (query, vec)
    pair is produced twice and no dedup pass is needed."""
    spark = candidates.sparkSession
    qids = query_vectors["query_id"].tolist()
    qmat = _normalize(np.array(query_vectors["embedding"].tolist(), dtype=np.float64))
    b2q: dict[int, list[int]] = {}
    for qi, qid in enumerate(qids):
        for b in query_probes[qid]:
            b2q.setdefault(int(b), []).append(qi)
    bq = spark.sparkContext.broadcast(
        (qids, qmat, {b: np.asarray(v, dtype=np.int64) for b, v in b2q.items()})
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, qmat_, b2q_ = bq.value
        qarr = np.asarray(qids_, dtype=object)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # per-bucket matmuls, but ONE output frame per Arrow batch:
            # the previous per-(bucket, query) pd.DataFrame construction
            # was ~13k tiny frames for a 1000-query batch and dominated
            # the kernel (the matmuls themselves are micro-sized)
            out_q, out_i, out_c = [], [], []
            for b, grp in pdf.groupby(bucket_col, sort=False):
                qidx = b2q_.get(int(b))
                if qidx is None:
                    continue
                ids = grp[id_col].to_numpy()
                mat = _normalize(np.array(grp[vec_col].tolist(), dtype=np.float64))
                sims = mat @ qmat_[qidx].T  # (bucket_rows, n_probing_queries)
                kk = min(k, len(ids))
                top = np.argpartition(-sims, kk - 1, axis=0)[:kk]
                out_q.append(np.repeat(qidx, kk))
                out_i.append(ids[top].T.ravel())
                out_c.append(np.take_along_axis(sims, top, axis=0).T.ravel())
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": qarr[np.concatenate(out_q)],
                        id_col: np.concatenate(out_i),
                        "cosine": np.concatenate(out_c),
                    }
                )

    local = candidates.select(id_col, vec_col, bucket_col).mapInPandas(
        kernel, schema=f"query_id string, {id_col} long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def cosine_topk_sql(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pure-DataFrame exact cosine top-k (oracle-parity path).

    queries: (query_id, embedding). posexplode both sides → join on dim →
    sum of products / norms. Slower than the BLAS kernel but expressible
    1:1 in ANSI SQL for the DuckDB cross-check."""
    e = embeddings.select(
        F.col(id_col),
        F.posexplode(vec_col).alias("i", "x"),
    ).withColumn("x", F.col("x").cast("double"))
    q = queries.select(
        "query_id", F.posexplode(vec_col).alias("i", "y")
    ).withColumn("y", F.col("y").cast("double"))
    enorm = e.groupBy(id_col).agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nx"))
    qnorm = q.groupBy("query_id").agg(F.sqrt(F.sum(F.col("y") * F.col("y"))).alias("ny"))
    dots = (
        e.join(q, "i")
        .groupBy("query_id", id_col)
        .agg(F.sum(F.col("x") * F.col("y")).alias("dot"))
    )
    scored = (
        dots.join(enorm, id_col)
        .join(qnorm, "query_id")
        .withColumn("cosine", F.col("dot") / (F.col("nx") * F.col("ny")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def hyperplane_signatures(
    embeddings: DataFrame,
    nbits: int = 16,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = SEED,
) -> DataFrame:
    """(id, bucket long): sign-bit signature under seeded random hyperplanes."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, nbits))
    spark = embeddings.sparkSession
    bp = spark.sparkContext.broadcast(planes)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p = bp.value
        weights = (1 << np.arange(p.shape[1], dtype=np.uint64)).astype(np.uint64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            bits = (mat @ p) > 0
            bucket = (bits.astype(np.uint64) * weights).sum(axis=1).astype(np.int64)
            yield pd.DataFrame({id_col: pdf[id_col], "bucket": bucket})

    return embeddings.select(id_col, vec_col).mapInPandas(
        kernel, schema=f"{id_col} long, bucket long"
    )


def lsh_cosine_topk(
    embeddings: DataFrame,
    query_vectors: pd.DataFrame,
    k: int = 10,
    nbits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = SEED,
) -> DataFrame:
    """ANN: probe the query's LSH bucket and its 1-bit-flip neighbors,
    exact-rerank candidates. Approximate — recall depends on nbits."""
    dim = len(query_vectors["embedding"].iloc[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, nbits))
    qmat = np.array(query_vectors["embedding"].tolist(), dtype=np.float64)
    qbits = (qmat @ planes) > 0
    weights = (1 << np.arange(nbits, dtype=np.uint64)).astype(np.uint64)
    qbuckets = (qbits.astype(np.uint64) * weights).sum(axis=1).astype(np.int64)
    # multiprobe: own bucket + all 1-bit flips
    probe = set()
    for b in qbuckets.tolist():
        probe.add(b)
        for i in range(nbits):
            probe.add(b ^ (1 << i))
    sigs = hyperplane_signatures(embeddings, nbits, dim, id_col, vec_col, seed)
    cand_ids = sigs.filter(F.col("bucket").isin(list(probe))).select(id_col)
    cands = embeddings.join(cand_ids, id_col, "left_semi")
    return brute_cosine_topk(cands, query_vectors, k, id_col, vec_col)


def _kmeans(sample: np.ndarray, n_centroids: int, iters: int = 8, seed: int = SEED) -> np.ndarray:
    """Tiny seeded Lloyd's k-means on a driver-side sample (centroid init =
    random sample rows). Deterministic; good enough for IVF routing.

    Early-exits once the assignment repeats: an unchanged assignment
    recomputes the exact same centroids, so every later iteration is a
    no-op — the returned centroids are identical to running all ``iters``
    rounds (on converged inputs this skips most of the fixed 8 rounds)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    cent = sample[idx].copy()
    prev_assign = None
    for _ in range(iters):
        d = sample @ cent.T
        assign = d.argmax(axis=1)  # cosine on normalized rows
        if prev_assign is not None and np.array_equal(assign, prev_assign):
            break
        prev_assign = assign
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def ivf_cosine_topk(
    embeddings: DataFrame,
    query_vectors: pd.DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = SEED,
) -> DataFrame:
    """IVF ANN: route vectors to their nearest centroid (coarse quantizer
    trained on a seeded sample), probe the query's nprobe nearest centroid
    cells, exact-rerank inside. nprobe=n_centroids degenerates to exact.

    At 100 TB the cell assignment is one mapInPandas pass (matmul per Arrow
    batch) and a write partitioned by cell; queries touch nprobe cells —
    partition pruning does the rest."""
    spark = embeddings.sparkSession
    sample = seeded_vector_sample(embeddings, sample_size, id_col, vec_col, seed)
    smat = _normalize(np.array(sample[vec_col].tolist(), dtype=np.float64))
    cent = _kmeans(smat, n_centroids, seed=seed)
    bc = spark.sparkContext.broadcast(cent)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = _normalize(np.array(pdf[vec_col].tolist(), dtype=np.float64))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "cell": (mat @ c.T).argmax(axis=1)}
            )

    cells = embeddings.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} long, cell int"
    )
    qmat = _normalize(np.array(query_vectors["embedding"].tolist(), dtype=np.float64))
    probe_cells = set(
        int(c) for row in (qmat @ cent.T).argsort(axis=1)[:, ::-1][:, :nprobe]
        for c in row
    )
    cand_ids = cells.filter(F.col("cell").isin(list(probe_cells))).select(id_col)
    cands = embeddings.join(cand_ids, id_col, "left_semi")
    return brute_cosine_topk(cands, query_vectors, k, id_col, vec_col)


def _dot_expr(x, y):
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    tau: float = 0.95,
    nbits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = SEED,
    dim: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(id_a, id_b, cosine >= tau): embedding near-duplicate pairs.

    Candidates from shared LSH bucket (high-cosine pairs collide with
    probability (1 - θ/π)^nbits), verified exactly with a zip_with dot
    product — JVM-side, no Python in the verify.

    dim: embedding dimensionality — pass it to skip the one-row inference
    job that hyperplane_signatures otherwise runs per call.

    max_bucket_size: skew guard for the within-bucket self-join (the
    shingle pipeline's max_shingle_df analogue, dedup.py). A degenerate
    bucket — skewed or normalized-collapsed embeddings are common in real
    corpora — otherwise goes quadratic. Buckets over the cap switch to
    star linking: every member is verified against the bucket's min-id
    representative only (linear in bucket size). For the dominant
    degenerate case (identical/collapsed vectors, which NO hyperplane
    split can separate) this still yields every member's duplicate edge;
    pairs in an oversized bucket whose cosine ≥ tau with each other but
    not with the representative are the accepted recall trade."""
    sigs = hyperplane_signatures(embeddings, nbits, dim, id_col, vec_col, seed)
    e = embeddings.join(sigs, id_col)
    if max_bucket_size is not None:
        stats = sigs.groupBy("bucket").agg(
            F.count("*").alias("_bsize"), F.min(id_col).alias("_rep")
        )
        # stats has at most 2^nbits rows by construction (bucket is an
        # nbits-bit signature), so for nbits <= 16 it is provably tiny
        # (<= 65536 × ~24 B) and broadcast unconditionally — no reliance on
        # AQE being enabled, no counting job. Beyond that the bucket count
        # can approach n, so let Spark/AQE pick the strategy.
        if nbits <= 16:
            stats = F.broadcast(stats)
        e = e.join(stats, "bucket")
        small = e.filter(F.col("_bsize") <= max_bucket_size)
        big = e.filter(F.col("_bsize") > max_bucket_size)
        small_pairs = _bucket_self_join(small, id_col, vec_col)
        reps = big.filter(F.col(id_col) == F.col("_rep")).select(
            "bucket",
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("va"),
        )
        # reps is one row (with a full embedding) PER oversized bucket —
        # usually tiny, but a pathological corpus can have ~n/cap of them,
        # so no force-broadcast here either; AQE broadcasts when it fits
        big_pairs = (
            big.filter(F.col(id_col) != F.col("_rep"))
            .select("bucket", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
            .join(reps, "bucket")
        )
        cand = small_pairs.unionByName(big_pairs.select(small_pairs.columns))
    else:
        cand = _bucket_self_join(e, id_col, vec_col)
    return (
        cand.withColumn(
            "cosine",
            _dot_expr(F.col("va"), F.col("vb"))
            / (
                F.sqrt(_dot_expr(F.col("va"), F.col("va")))
                * F.sqrt(_dot_expr(F.col("vb"), F.col("vb")))
            ),
        )
        .filter(F.col("cosine") >= tau)
        .select("id_a", "id_b", "cosine")
        .distinct()
    )


def _bucket_self_join(e: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    a = e.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket")
    b = e.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket")
    return a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b")).select(
        "id_a", "va", "id_b", "vb"
    )
