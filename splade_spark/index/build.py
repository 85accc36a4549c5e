"""Distributed posting-list construction.

Reference analogue: IndexDictOfArray build — append (doc_id, weight) per term
in ascending doc order (splade/indexing/inverted_index.py:58-67), persisted
as per-term arrays (:86-88). Spark-native redesign:

- The index is **document-sharded**: shard_id = doc_id mod num_shards. Every
  shard holds a slice of *every* term's posting list, so (a) any query can be
  answered per-shard and merged (the classic distributed search layout), and
  (b) Zipf head terms (posting lists covering >50% of docs — see
  splade/utils/index_figure.py:21-29) are split across all shards by
  construction: the groupBy(shard_id, term_id) build shuffle has max group
  size df/num_shards. This *is* the "salted repartition with explicit skew
  splitting" of the north star — the salt is the doc shard, and unlike a
  random salt it never needs a re-merge to restore docID order, because
  shards partition docID space.
- Within a (shard, term) group, postings are docID-sorted and cut into
  128-entry blocks, delta+varint docIDs, u8-quantized weights, integer
  block_max (codec.py) — one Arrow grouped-map UDF, numpy-vectorized.
- Output is a parquet table partitioned by shard_id (Iceberg-ready: same
  layout via `writeTo(...).partitionedBy(shard_id)`), with per-shard
  checkpoint ledger entries carrying lineage + postings/sec metrics, so a
  killed build resumes per-partition (the reference's force_new=False reload,
  inverted_index.py:23-46, is all-or-nothing; ours is per-shard).

At 100 TB the build is one wide shuffle of (doc, term, weight) rows keyed by
(shard, term); AQE coalesces small shards, and dynamic partition overwrite
makes per-shard writes idempotent.
"""

from __future__ import annotations

import json

import os
import time


import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import BLOCK_SIZE
from .codec import check_bits, encode_groups

POSTINGS_SCHEMA = (
    "shard_id int, term_id long, block_id int, first_doc long, last_doc long, "
    "n int, doc_bytes binary, w_bytes binary, block_max int"
)


def with_shard(weights: DataFrame, num_shards: int) -> DataFrame:
    return weights.withColumn(
        "shard_id", F.pmod(F.col("doc_id"), F.lit(num_shards)).cast("int")
    )


def build_postings(
    weights: DataFrame,
    scale: float,
    num_shards: int = 32,
    block_size: int = BLOCK_SIZE,
    bits: int = 8,
    local_sort: bool = True,
    codec: str = "varint",
    prequantize: bool = False,
) -> DataFrame:
    """(doc_id, term_id, weight) → compressed posting blocks.

    One shuffle — repartition on (shard_id, term_id) — then one vectorized
    Arrow encoder (mapInPandas) whose batches cover ALL the partition's
    (shard, term) groups (codec.encode_groups). A grouped-map per
    (shard, term) is wrong at scale in both directions: Zipf tails make
    millions of tiny groups (per-group pandas overhead dominates), and a
    per-shard grouping would buffer whole shards in memory.

    prequantize=True: quantize the weight JVM-side BEFORE the shuffle —
    ``least(hi, greatest(0, bround(w*scale)))`` cast to int, exactly
    quantize_weights' rint-then-clip (F.bround is HALF_EVEN like np.rint;
    asserted byte-identical to the float path in test_index_build). The
    engine's central shuffle then carries a low-entropy int32 instead of
    a float64. Measured on this box (42M postings, local[16]): ~5-9%
    SLOWER — the extra JVM expression eval costs more than the 4-of-28
    bytes saved in a memory-local shuffle — so the float path stays the
    default; the knob exists for network-shuffle clusters where shuffle
    bytes, not map-side CPU, are the constraint.

    local_sort=True (default): rows are sorted *inside the Python worker*
    (np.lexsort over the buffered partition) instead of with Spark's
    sortWithinPartitions. Measured head-to-head at 42M postings, the JVM
    row sort + sorted-row→Arrow conversion is the scaling bottleneck of
    the whole build (shared-JVM sort/GC contention: 4→16 core efficiency
    0.53 vs 0.84 for the Python sort at equal full-width throughput).
    Memory is O(partition): size the partition count so partitions hold
    ~8–32M rows (spark.sql.shuffle.partitions, or defaultParallelism).

    local_sort=False: Spark sorts (shard, term, doc) within partitions and
    a streaming encoder carries the trailing possibly-incomplete group
    across batches — memory O(arrow batch + one group) regardless of
    partition size; use it when partitions can't be bounded.
    """

    def encode_partition(batches):
        """Arrow-native partition encoder: the int64/float64 input columns
        come out of the Arrow buffers as numpy views (one combine_chunks
        materialization, no pandas frame construction), and the encoded
        blocks go back as ONE RecordBatch built straight from the numpy
        outputs of encode_groups — the pandas round trip this replaces
        copied every input column twice per partition (guide §4.2: hand
        whole batches to vectorized native code)."""
        import numpy as np
        import pyarrow as pa

        chunks = [rb for rb in batches if rb.num_rows]
        if not chunks:
            return
        tbl = pa.Table.from_batches(chunks).combine_chunks()
        s = tbl.column("shard_id").to_numpy()
        t = tbl.column("term_id").to_numpy()
        d = tbl.column("doc_id").to_numpy()
        w = tbl.column("weight").to_numpy()
        o = np.lexsort((d, t, s))  # stable; (shard,term,doc) keys are unique
        g = encode_groups(
            s[o], t[o], d[o], w[o], scale,
            block_size=block_size, bits=bits, codec=codec,
            prequantized=prequantize,
        )
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(g["shard_id"], type=pa.int32()),
                pa.array(g["term_id"], type=pa.int64()),
                pa.array(g["block_id"], type=pa.int32()),
                pa.array(g["first_doc"], type=pa.int64()),
                pa.array(g["last_doc"], type=pa.int64()),
                pa.array(g["n"], type=pa.int32()),
                pa.array(g["doc_bytes"], type=pa.binary()),
                pa.array(g["w_bytes"], type=pa.binary()),
                pa.array(g["block_max"], type=pa.int32()),
            ],
            names=[
                "shard_id", "term_id", "block_id", "first_doc", "last_doc",
                "n", "doc_bytes", "w_bytes", "block_max",
            ],
        )

    def encode_stream(batches):
        import numpy as np

        pending: pd.DataFrame | None = None
        for pdf in batches:
            if pending is not None and len(pending):
                pdf = pd.concat([pending, pdf], ignore_index=True)
                pending = None
            if len(pdf) == 0:
                continue
            s = pdf["shard_id"].to_numpy()
            t = pdf["term_id"].to_numpy()
            same_tail = (s == s[-1]) & (t == t[-1])
            not_tail = np.flatnonzero(~same_tail)
            cut = int(not_tail[-1]) + 1 if len(not_tail) else 0
            pending = pdf.iloc[cut:]
            body = pdf.iloc[:cut]
            if len(body):
                yield pd.DataFrame(
                    encode_groups(
                        body["shard_id"].to_numpy(),
                        body["term_id"].to_numpy(),
                        body["doc_id"].to_numpy(),
                        body["weight"].to_numpy(),
                        scale,
                        block_size=block_size,
                        bits=bits,
                        codec=codec,
                        prequantized=prequantize,
                    )
                )
        if pending is not None and len(pending):
            yield pd.DataFrame(
                encode_groups(
                    pending["shard_id"].to_numpy(),
                    pending["term_id"].to_numpy(),
                    pending["doc_id"].to_numpy(),
                    pending["weight"].to_numpy(),
                    scale,
                    block_size=block_size,
                    bits=bits,
                    codec=codec,
                    prequantized=prequantize,
                )
            )

    sharded = with_shard(weights, num_shards)
    if prequantize:
        hi_q = float(2**bits - 1)
        sharded = sharded.withColumn(
            "weight",
            F.least(
                F.lit(hi_q),
                F.greatest(F.lit(0.0), F.bround(F.col("weight") * F.lit(float(scale)))),
            ).cast("int"),
        )
    # explicit partition count — AQE's coalescePartitions would shrink this
    # CPU-bound encode stage to a handful of partitions based on shuffle
    # bytes alone; user-specified repartition(N) is exempt from coalescing
    spark = weights.sparkSession
    n_part = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")),
        spark.sparkContext.defaultParallelism * 2,
    )
    if local_sort:
        arranged = sharded.repartition(n_part, "shard_id", "term_id")
        return arranged.select(
            "shard_id", "term_id", "doc_id", "weight"
        ).mapInArrow(encode_partition, schema=POSTINGS_SCHEMA)
    arranged = sharded.repartition(n_part, "shard_id", "term_id").sortWithinPartitions(
        "shard_id", "term_id", "doc_id"
    )
    return arranged.mapInPandas(encode_stream, schema=POSTINGS_SCHEMA)


def _ledger_dir(path: str) -> str:
    return os.path.join(path, "_ledger")


def read_ledger(path: str) -> dict[int, dict]:
    d = _ledger_dir(path)
    out: dict[int, dict] = {}
    if not os.path.isdir(d):
        return out
    for f in os.listdir(d):
        if f.startswith("shard-") and f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                entry = json.load(fh)
            out[int(entry["shard_id"])] = entry
    return out


def _write_ledger_entry(path: str, entry: dict) -> None:
    d = _ledger_dir(path)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".shard-{entry['shard_id']:05d}.tmp")
    dst = os.path.join(d, f"shard-{entry['shard_id']:05d}.json")
    with open(tmp, "w") as fh:
        json.dump(entry, fh)
    os.replace(tmp, dst)  # atomic per-partition commit


def _write_index_meta(path: str, meta: dict) -> None:
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, "._index_meta.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, "_index_meta.json"))


def build_index(
    weights: DataFrame,
    path: str,
    scale: float,
    num_shards: int = 32,
    block_size: int = BLOCK_SIZE,
    resume: bool = True,
    lineage: dict | None = None,
    bits: int = 8,
    codec: str = "varint",
    local_sort: bool = True,
) -> dict:
    """Resumable sharded index build → parquet at `path`, partitioned by
    shard_id, plus a per-shard checkpoint ledger with lineage + metrics.
    local_sort=False selects the bounded-memory streaming encoder (see
    build_postings) for deployments where partitions can't be sized to
    fit worker memory.

    Returns build metrics {built_shards, skipped_shards, postings, elapsed_s,
    postings_per_sec}. Re-running after a kill only builds missing shards
    (idempotent: dynamic partition overwrite replaces partial shard output).
    """
    spark = weights.sparkSession
    done = read_ledger(path) if resume else {}
    if done:
        # a resume MUST match the committed shards' encoding parameters —
        # continuing a killed `--codec for` build with default flags would
        # otherwise produce a mixed-codec index whose meta mislabels the
        # pre-existing shards (silently garbage at query time)
        ref = next(iter(done.values()))
        expect = {
            "scale": scale, "num_shards": num_shards,
            "block_size": block_size, "bits": bits, "codec": codec,
        }
        got = {
            "scale": ref.get("scale"),
            "num_shards": ref.get("num_shards"),
            "block_size": ref.get("block_size"),
            "bits": ref.get("bits", 8),
            "codec": ref.get("codec", "varint"),
        }
        if got != expect:
            raise ValueError(
                f"resume parameter mismatch: ledger has {got}, "
                f"call has {expect} — pass the original build flags "
                "or use resume=False to rebuild"
            )
    pending = [s for s in range(num_shards) if s not in done]
    metrics = {
        "built_shards": len(pending),
        "skipped_shards": num_shards - len(pending),
        "postings": 0,
        "elapsed_s": 0.0,
        "postings_per_sec": 0.0,
    }
    meta = {
        "scale": scale,
        "num_shards": num_shards,
        "block_size": block_size,
        "bits": bits,
        "codec": codec,
        "lineage": lineage or {},
    }
    if not pending:
        # repair path: a build killed between the last ledger write and the
        # meta write would otherwise leave an index the query path can't
        # open, and resume would never fix it (pending is empty)
        if not os.path.exists(os.path.join(path, "_index_meta.json")):
            _write_index_meta(path, meta)
        return metrics

    t0 = time.time()
    sharded = with_shard(weights, num_shards)
    if len(pending) < num_shards:
        sharded = sharded.filter(F.col("shard_id").isin(pending))
    postings = build_postings(
        sharded.select("shard_id", "doc_id", "term_id", "weight"),
        scale,
        num_shards=num_shards,
        block_size=block_size,
        bits=bits,
        codec=codec,
        local_sort=local_sort,
    )
    # Range-repartition the (small) encoded blocks so each shard writes ~one
    # term-sorted file: without this, encode_partitions × shards files get
    # committed (serial renames dominate), and term row-group stats are
    # interleaved. Term-sorted files give the query path tight min/max
    # pruning on term_id.
    arranged = postings.repartition(num_shards, "shard_id").sortWithinPartitions(
        "shard_id", "term_id", "block_id"
    )
    (
        arranged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("shard_id")
        .parquet(path)
    )
    elapsed = time.time() - t0

    # per-shard postings counts for ledger metrics (cheap: parquet footer agg)
    # explicit schema: an empty corpus writes no files, and schema inference
    # on an empty partitioned dir fails
    built = (
        spark.read.schema(POSTINGS_SCHEMA)
        .parquet(path)
        .filter(F.col("shard_id").isin(pending))
    )
    counts = {
        int(r["shard_id"]): int(r["p"])
        for r in built.groupBy("shard_id").agg(F.sum("n").alias("p")).collect()
    }
    now = time.time()
    total = 0
    for s in pending:
        p = counts.get(s, 0)
        total += p
        _write_ledger_entry(
            path,
            {
                "shard_id": s,
                "postings": p,
                "committed_at": now,
                "build_elapsed_s": elapsed,
                "postings_per_sec_job": (sum(counts.values()) / elapsed)
                if elapsed > 0
                else 0.0,
                "scale": scale,
                "num_shards": num_shards,
                "block_size": block_size,
                "bits": bits,
                "codec": codec,
                "lineage": lineage or {},
            },
        )
    # index-level metadata (scale + bits are needed to score)
    _write_index_meta(path, meta)
    metrics.update(
        postings=total,
        elapsed_s=elapsed,
        postings_per_sec=(total / elapsed) if elapsed > 0 else 0.0,
    )
    return metrics


def iceberg_available(spark: SparkSession) -> bool:
    """True when the iceberg-spark-runtime jar is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_postings_iceberg(
    postings: DataFrame, table: str, num_shards: int,
    properties: dict | None = None,
) -> None:
    """Iceberg sink for posting blocks (north-rule table layout).

    `writeTo(table).partitionedBy(shard_id)` — identical layout to the
    parquet path (one partition per shard, term-sorted files give tight
    min/max pruning on term_id; Iceberg keeps those stats in its manifest,
    so the query path's term filter prunes files without listing). The
    caller's catalog must be configured (session.get_spark
    iceberg_warehouse=...); requires the iceberg-spark-runtime jar.

    properties: table properties attached to the SAME createOrReplace
    commit as the data — meta and data publish in one Iceberg snapshot, so
    a crash anywhere leaves either the previous good table or the complete
    new one, never data without meta.
    """
    spark = postings.sparkSession
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not on the classpath — add "
            "org.apache.iceberg:iceberg-spark-runtime via spark.jars.packages "
            "or use the parquet path (build_index fmt='parquet')"
        )
    arranged = postings.repartition(num_shards, "shard_id").sortWithinPartitions(
        "shard_id", "term_id", "block_id"
    )
    writer = arranged.writeTo(table)
    for k, v in (properties or {}).items():
        writer = writer.tableProperty(k, str(v))
    writer.partitionedBy(F.col("shard_id")).createOrReplace()


def load_postings_iceberg(spark: SparkSession, table: str) -> DataFrame:
    return spark.read.table(table)


def build_index_iceberg(
    weights: DataFrame,
    table: str,
    scale: float,
    num_shards: int = 32,
    block_size: int = BLOCK_SIZE,
    bits: int = 8,
    codec: str = "varint",
) -> dict:
    """Sharded index build into an Iceberg table.

    Same encode pipeline as build_index; the ledger/meta live as Iceberg
    table properties (splade.scale etc.) instead of sidecar JSON, and
    atomicity/idempotence comes from Iceberg's snapshot commit rather than
    the per-shard filesystem ledger. Data AND properties publish in the
    single createOrReplace snapshot (tableProperty on the writer, not
    post-hoc ALTERs) — a failed write never publishes a table that
    read_index_meta_iceberg cannot open, and the previous good index
    survives until the new one is complete."""
    spark = weights.sparkSession
    t0 = time.time()
    sharded = with_shard(weights, num_shards)
    postings = build_postings(
        sharded.select("shard_id", "doc_id", "term_id", "weight"),
        scale, num_shards=num_shards, block_size=block_size, bits=bits,
        codec=codec,
    )
    write_postings_iceberg(
        postings, table, num_shards,
        properties={
            "splade.scale": scale,
            "splade.num_shards": num_shards,
            "splade.block_size": block_size,
            "splade.bits": bits,
            "splade.codec": codec,
        },
    )
    elapsed = time.time() - t0
    total = int(
        load_postings_iceberg(spark, table).agg(F.sum("n")).collect()[0][0] or 0
    )
    return {
        "postings": total,
        "elapsed_s": elapsed,
        "postings_per_sec": (total / elapsed) if elapsed > 0 else 0.0,
    }


def read_index_meta_iceberg(spark: SparkSession, table: str) -> dict:
    props = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    }
    return {
        "scale": float(props["splade.scale"]),
        "num_shards": int(props["splade.num_shards"]),
        "block_size": int(props["splade.block_size"]),
        "bits": check_bits(props.get("splade.bits", 8)),
        "codec": props.get("splade.codec", "varint"),
    }


def read_index_meta(path: str) -> dict:
    with open(os.path.join(path, "_index_meta.json")) as fh:
        meta = json.load(fh)
    # fail loudly here rather than decoding garbage weights in the kernel
    check_bits(meta.get("bits", 8))
    return meta


def load_postings(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(POSTINGS_SCHEMA).parquet(path)


def index_dist_from_postings(postings: DataFrame) -> DataFrame:
    """Posting length per term (reference: index_dist.json)."""
    return postings.groupBy("term_id").agg(F.sum("n").alias("posting_len"))
