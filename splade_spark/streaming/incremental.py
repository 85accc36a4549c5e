"""Incremental index maintenance via Structured Streaming.

The reference is strictly batch (SURVEY.md §2.9); its only incrementality is
the all-or-nothing force_new=False index reload
(splade/indexing/inverted_index.py:23-46). Here, newly arriving transcript
conversations stream in (files landing in a directory / an Iceberg CDC feed),
and each micro-batch becomes a posting *segment* built through the normal
sharded build path; segments fold with the log-structured tiered merge
(index/merge.py). `Trigger.AvailableNow` gives catch-up batch semantics.

Scoring stats policy: BM25 df/N/avgdl are **frozen from the base corpus**
per segment-build (the standard search-engine trade-off — stats drift is
repaired at the next full merge/rebuild, queries stay consistent meanwhile).
The frozen stats and quantization scale travel in the segment's lineage.

Doc ids: each batch allocates a contiguous id range above the current high
watermark (persisted in _doc_counter.json), preserving the docID-sorted,
docID-disjoint segment invariant the merge relies on.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..bm25 import bm25_weights
from ..documents import build_documents
from ..index.build import build_index
from ..tokenize import term_freqs
from ..fixtures import TRANSCRIPTS_SCHEMA


class FrozenStats:
    """BM25 corpus statistics frozen at base-index build time.

    df_path points at a (term_id, df) parquet of base-corpus document
    frequencies — segment builds must weight against these, not the
    micro-batch's own df, or idf drifts per segment."""

    def __init__(self, n_docs: int, avgdl: float, scale: float, df_path: str):
        self.n_docs = n_docs
        self.avgdl = avgdl
        self.scale = scale
        self.df_path = df_path

    def to_dict(self) -> dict:
        return {
            "n_docs": self.n_docs,
            "avgdl": self.avgdl,
            "scale": self.scale,
            "df_path": self.df_path,
        }

    @classmethod
    def load(cls, path: str) -> "FrozenStats":
        with open(path) as fh:
            d = json.load(fh)
        return cls(d["n_docs"], d["avgdl"], d["scale"], d["df_path"])

    def save(self, path: str) -> None:
        # atomic tmp+replace, same as the watermark writer below: a crash
        # mid-write must not leave a truncated JSON that load() chokes on
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self.to_dict(), fh)
        os.replace(tmp, path)


def _counter_path(base_dir: str) -> str:
    return os.path.join(base_dir, "_doc_counter.json")


def _next_doc_id(base_dir: str) -> int:
    p = _counter_path(base_dir)
    if os.path.exists(p):
        with open(p) as fh:
            return int(json.load(fh)["next_doc_id"])
    return 0


def _set_next_doc_id(base_dir: str, v: int) -> None:
    tmp = _counter_path(base_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump({"next_doc_id": int(v)}, fh)
    os.replace(tmp, _counter_path(base_dir))


def set_doc_watermark(base_dir: str, next_doc_id: int) -> None:
    """Seed the doc-id watermark above an existing base index's id range,
    so streamed segments allocate ids disjoint from the base build."""
    os.makedirs(base_dir, exist_ok=True)
    _set_next_doc_id(base_dir, next_doc_id)


def build_segment_from_batch(
    batch: DataFrame,
    base_dir: str,
    stats: FrozenStats,
    num_shards: int,
    epoch_id: int,
) -> str | None:
    """One micro-batch of transcripts → one posting segment directory."""
    caches: list = []
    docs = build_documents(batch, cache_registry=caches)
    try:
        offset = _next_doc_id(base_dir)
        docs = docs.withColumn("doc_id", F.col("doc_id") + F.lit(offset))
        n_new = docs.count()
        if n_new == 0:
            return None
        tf = term_freqs(docs)
        df_table = batch.sparkSession.read.parquet(stats.df_path)
        w = bm25_weights(
            tf, stats.n_docs, stats.avgdl, df_table=df_table
        ).select("doc_id", "term_id", "weight")
        seg = os.path.join(base_dir, "segments", f"epoch={epoch_id:08d}")
        build_index(
            w,
            seg,
            stats.scale,
            num_shards=num_shards,
            resume=False,
            lineage={"epoch": epoch_id, "doc_id_offset": offset, "n_docs": n_new,
                     "frozen_stats": stats.to_dict()},
        )
        # doc_map for the new range
        docs.select("doc_id", "conv_id").write.mode("overwrite").parquet(
            seg + "_docmap"
        )
        _set_next_doc_id(base_dir, offset + n_new)
        return seg
    finally:
        # one pinned cache entry per micro-batch would otherwise accumulate
        # for the stream's lifetime (LRU eviction then silently turns later
        # in-batch reuses into full recomputes)
        for c in caches:
            c.unpersist()


def list_segments(base_dir: str) -> list[str]:
    segdir = os.path.join(base_dir, "segments")
    if not os.path.isdir(segdir):
        return []
    return sorted(
        os.path.join(segdir, d)
        for d in os.listdir(segdir)
        if d.startswith("epoch=") and not d.endswith("_docmap")
    )


def load_all_postings(spark: SparkSession, base_dir: str, base_index: str | None = None) -> DataFrame:
    """Union of the base index (if any) and all live segments — retrieval is
    distributive over docID-disjoint segments, so querying the union is
    exact without waiting for a merge."""
    from ..index.build import load_postings

    paths = ([base_index] if base_index else []) + list_segments(base_dir)
    if not paths:
        # explicit raise, not assert (must survive python -O — see
        # merge.py's guard convention)
        raise ValueError(f"no postings found under {base_dir!r}")
    # load_postings applies POSTINGS_SCHEMA explicitly — an empty segment
    # directory (interrupted write) would otherwise fail schema inference
    df = load_postings(spark, paths[0])
    for p in paths[1:]:
        df = df.unionByName(load_postings(spark, p))
    return df


def start_incremental_indexer(
    spark: SparkSession,
    input_dir: str,
    base_dir: str,
    stats: FrozenStats,
    num_shards: int = 16,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """readStream over a landing directory of transcript parquet files →
    one segment per micro-batch. Returns the StreamingQuery.

    Input contract: each landed FILE must hold whole conversations — all
    of a conv_id's turns in one file. Micro-batches are file-granular
    (maxFilesPerTrigger bounds batch memory during catch-up), and
    build_documents groups turns per batch only: a conversation split
    across files that land in different batches would be indexed as two
    partial documents under two doc_ids. Any writer that partitions its
    output by conversation (the normal shape for transcript landing data)
    satisfies this; turn-level appends to an existing conversation need
    the merge/rebuild path instead.

    num_shards must match across the stream's lifetime (and the base index
    it will be merged with): merge_indexes rejects mismatched shard
    counts, and that rejection would otherwise surface only after many
    segments accumulate. A restart with a different value is refused here,
    at stream start."""
    os.makedirs(base_dir, exist_ok=True)
    existing = list_segments(base_dir)
    if existing:
        from ..index.build import read_index_meta

        # a micro-batch killed mid-build leaves a segment dir with no meta
        # file; scan for the first segment with readable meta instead of
        # dying on the partial one with an opaque FileNotFoundError
        prev = None
        partial: list[str] = []
        for seg in existing:
            try:
                prev = read_index_meta(seg).get("num_shards")
                break
            except (OSError, ValueError):
                partial.append(seg)
        if prev is None and partial:
            raise ValueError(
                f"no existing segment has a readable _index_meta.json "
                f"(partial segment dirs from an interrupted build: "
                f"{partial}) — delete them (the stream checkpoint will "
                "replay their batches) before restarting"
            )
        if prev is not None and prev != num_shards:
            raise ValueError(
                f"num_shards={num_shards} does not match the existing "
                f"segments' num_shards={prev} — segments with mixed shard "
                "counts can never be merged (pass the original value)"
            )
    stats.save(os.path.join(base_dir, "_frozen_stats.json"))
    stream = (
        spark.readStream.schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )

    def on_batch(batch: DataFrame, epoch_id: int) -> None:
        build_segment_from_batch(batch, base_dir, stats, num_shards, epoch_id)

    writer = stream.writeStream.foreachBatch(on_batch).option(
        "checkpointLocation",
        checkpoint_dir or os.path.join(base_dir, "_stream_checkpoint"),
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
