"""Log-structured tiered segment merge.

Incremental indexing produces partition-local *segments* (each a full sharded
index over a batch of new documents, built by index/build.py). Queries can
run over the union of segments (retrieval is distributive over docID-disjoint
segments), but block counts and per-term fan-out grow with segment count — so
segments are folded with a tiered merge, the standard log-structured policy
(reference delegates this to Lucene/PISA whose segment merging is the same
idea; in-repo, the reference rebuilds from scratch — inverted_index.py:23-46).

The merge itself is one Spark job: union the segments' postings, group by
(shard_id, term_id), decode + k-way concat by docID + re-encode in an Arrow
grouped-map. Because shards partition docID space identically in every
segment (same num_shards), the merge never crosses shards — the shuffle is
bounded per (shard, term) exactly like the build.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import numpy as np

from .build import POSTINGS_SCHEMA, read_index_meta
from .codec import decode_block, encode_blocks


def merge_postings(
    segments: list[DataFrame], scale: float, block_size: int = 128
) -> DataFrame:
    """Merge docID-sorted posting segments into one postings DataFrame."""
    unioned = segments[0]
    for s in segments[1:]:
        unioned = unioned.unionByName(s)

    def remerge(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard_id"].iloc[0])
        term = int(pdf["term_id"].iloc[0])
        docs_all, w_all = [], []
        for r in pdf.itertuples(index=False):
            d, w = decode_block(r.first_doc, r.n, r.doc_bytes, r.w_bytes, scale)
            docs_all.append(d)
            w_all.append(w)
        docs = np.concatenate(docs_all)
        w = np.concatenate(w_all)
        rows = encode_blocks(docs, w, scale, block_size=block_size)
        out = pd.DataFrame(
            rows,
            columns=[
                "block_id", "first_doc", "last_doc", "n",
                "doc_bytes", "w_bytes", "block_max_f",
            ],
        )
        out["block_max"] = (out["block_max_f"] * scale).round().astype("int32")
        out["shard_id"] = shard
        out["term_id"] = term
        return out[
            ["shard_id", "term_id", "block_id", "first_doc", "last_doc",
             "n", "doc_bytes", "w_bytes", "block_max"]
        ]

    return unioned.groupBy("shard_id", "term_id").applyInPandas(
        remerge, schema=POSTINGS_SCHEMA
    )


def merge_indexes(
    spark: SparkSession, segment_paths: list[str], out_path: str
) -> dict:
    """Merge on-disk index segments (identical meta) into out_path.

    Segments must cover **disjoint docID ranges** (the incremental indexer
    allocates contiguous ranges above a persisted watermark —
    streaming/incremental.py). Two independent `cli build` runs both start
    doc ids at 0; merging those would silently alias different documents,
    so overlapping ranges are rejected."""
    metas = [read_index_meta(p) for p in segment_paths]
    scale = metas[0]["scale"]
    num_shards = metas[0]["num_shards"]
    block_size = metas[0]["block_size"]
    assert all(
        m["scale"] == scale and m["num_shards"] == num_shards for m in metas
    ), "segments must share quantization scale and shard count"
    # explicit schema: an empty segment (no parquet files under the
    # partition dirs) fails schema inference; its (None, None) range is
    # skipped below rather than TypeError-ing against int ranges
    segs = [
        spark.read.schema(POSTINGS_SCHEMA).parquet(p) for p in segment_paths
    ]
    ranges = sorted(
        r
        for r in (
            tuple(s.agg(F.min("first_doc"), F.max("last_doc")).collect()[0])
            for s in segs
        )
        if r[0] is not None
    )
    for (lo_a, hi_a), (lo_b, _hi_b) in zip(ranges, ranges[1:]):
        if lo_b <= hi_a:
            raise ValueError(
                f"segment docID ranges overlap ({lo_a}..{hi_a} vs {lo_b}..): "
                "merge requires docID-disjoint segments (watermark-allocated)"
            )
    merged = merge_postings(segs, scale, block_size)
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard_id")
        .parquet(out_path)
    )
    import json, os

    with open(os.path.join(out_path, "_index_meta.json"), "w") as fh:
        json.dump(
            {
                "scale": scale,
                "num_shards": num_shards,
                "block_size": block_size,
                "lineage": {"merged_from": segment_paths},
            },
            fh,
        )
    return {"segments": len(segment_paths), "out": out_path}


def tiered_merge_plan(segment_sizes: list[int], fanout: int = 4) -> list[list[int]]:
    """Which segments to fold this round (indices), grouped by tier.

    Tier t holds segments with size in [fanout^t, fanout^(t+1)); when a tier
    accumulates >= fanout segments they merge into the next tier. Driver-side
    planning only — the merges themselves are Spark jobs.
    """
    import math

    tiers: dict[int, list[int]] = {}
    for i, sz in enumerate(segment_sizes):
        t = int(math.log(max(sz, 1), fanout))
        tiers.setdefault(t, []).append(i)
    return [idxs for t, idxs in sorted(tiers.items()) if len(idxs) >= fanout]
