"""Sources & sinks — the reference's scan/sink surface, Spark-native.

Reference analogues (SURVEY.md §2.1):
- S1  TSV collection scan        (splade/datasets/datasets.py:65-98)
- S5  BEIR corpus scan + concat  (splade/datasets/datasets.py:101-122)
- S7  TREC run scan              (splade/datasets/rerank.py:37-55)
- S8  qrels scan / TREC→JSON     (splade/utils/processing_trec_eval.py:9-19)
- S11 run sink (run.json)        (splade/tasks/transformer_evaluator.py:186-188)
- S12 Anserini JSONL sink        (splade/tasks/transformer_evaluator.py:213-243)
- S13 Anserini query TSV sink    (splade/tasks/transformer_evaluator.py:244-247)

All scans go through spark.read with explicit schemas (no inference jobs at
100 TB); small JSON exports collect only top-k-bounded results.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_collection_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S1: `id \\t text` lines → (doc_id string, text string); newlines
    inside text were stripped upstream (the reference strips at scan)."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("text", T.StringType(), True),
        ]
    )
    return spark.read.csv(path, sep="\t", schema=schema).withColumn(
        "text", F.coalesce(F.trim("text"), F.lit(""))
    )


def read_beir_corpus(spark: SparkSession, path: str) -> DataFrame:
    """S5: corpus.jsonl {_id, title, text} → (doc_id, text=title+' '+text),
    with the reference's coalescing fallbacks."""
    schema = T.StructType(
        [
            T.StructField("_id", T.StringType(), False),
            T.StructField("title", T.StringType(), True),
            T.StructField("text", T.StringType(), True),
        ]
    )
    df = spark.read.schema(schema).json(path)
    return df.select(
        F.col("_id").alias("doc_id"),
        F.trim(
            F.concat_ws(" ", F.coalesce("title", F.lit("")), F.coalesce("text", F.lit("")))
        ).alias("text"),
    )


def read_ir_corpus(docs: DataFrame) -> DataFrame:
    """S6: ir_datasets-style corpus → (doc_id, text) with the reference's
    field-coalescing fallback chain (splade/datasets/datasets.py:165-235,
    IR_Dataset.__init__):

        1. title + " " + text        (docs with both fields)
        2. decode(body, iso-8859-1) + " " + url   (web corpora)
        3. title                     (title-only docs — the reference
           crashes on these; dropping the title would silently index an
           empty, unretrievable document)
        4. text                      (plain collections)

    plus the reference's doc_id quote-strip. Schema-flexible: absent
    columns are treated as null, so one expression covers every
    ir_datasets doc namedtuple shape. Pure codegen — runs at scan speed.
    """
    cols = set(docs.columns)
    get = lambda c: F.col(c) if c in cols else F.lit(None).cast("string")  # noqa: E731
    body = (
        F.decode(F.col("body"), "ISO-8859-1")
        if "body" in cols
        else F.lit(None).cast("string")
    )
    text = F.coalesce(
        F.when(
            get("title").isNotNull() & get("text").isNotNull(),
            F.concat(get("title"), F.lit(" "), get("text")),
        ),
        F.when(
            body.isNotNull(),
            F.concat(body, F.lit(" "), F.coalesce(get("url"), F.lit(""))),
        ),
        get("title"),
        get("text"),
        F.lit(""),
    )
    return docs.select(
        F.regexp_replace(F.col("doc_id").cast("string"), '"', "").alias("doc_id"),
        text.alias("text"),
    )


def read_qrels_json(spark: SparkSession, path: str) -> DataFrame:
    """S8: {qid: {did: rel}} → (query_id, doc_id, rel). Qrels are small —
    parsed on the driver, parallelized for joins."""
    with open(path) as fh:
        data = json.load(fh)
    rows = [
        (qid, did, int(rel))
        for qid, dd in data.items()
        for did, rel in dd.items()
    ]
    return spark.createDataFrame(rows, "query_id string, doc_id string, rel int")


def read_qrels_trec(spark: SparkSession, path: str) -> DataFrame:
    """S8: TREC 4-col `qid 0 did rel` (whitespace-separated)."""
    schema = T.StructType(
        [
            T.StructField("query_id", T.StringType(), False),
            T.StructField("_it", T.StringType(), True),
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("rel", T.IntegerType(), False),
        ]
    )
    return spark.read.csv(path, sep=" ", schema=schema).select(
        "query_id", "doc_id", "rel"
    )


def read_trec_run(spark: SparkSession, path: str) -> DataFrame:
    """S7: 6-col TREC run `qid Q0 did rank score tag`."""
    schema = T.StructType(
        [
            T.StructField("query_id", T.StringType(), False),
            T.StructField("_q0", T.StringType(), True),
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("rank", T.IntegerType(), False),
            T.StructField("score", T.DoubleType(), False),
            T.StructField("_tag", T.StringType(), True),
        ]
    )
    return spark.read.csv(path, sep=" ", schema=schema).select(
        "query_id", "doc_id", "rank", "score"
    )


def write_runs_parquet(runs: DataFrame, path: str) -> None:
    """S11 primary sink: the runs table, partition-friendly."""
    runs.write.mode("overwrite").parquet(path)


def write_run_json(runs: DataFrame, path: str) -> None:
    """S11 parity sink: run.json {qid: {did: score}} — reference format.
    Runs are top-k-bounded per query, so the collect is safe."""
    out: dict[str, dict[str, float]] = {}
    for r in runs.select("query_id", "doc_id", "score").collect():
        out.setdefault(str(r.query_id), {})[str(r.doc_id)] = float(r.score)
    with open(path, "w") as fh:
        json.dump(out, fh)


def export_anserini_jsonl(
    weights: DataFrame,
    documents: DataFrame,
    path: str,
    quantization_factor: float = 100.0,
    filler_term: str = "[unused993]",
) -> None:
    """S12: per-doc {"id", "content", "vector": {term: int impact}} JSONL.

    Quantization rint(w*Q) per the reference (transformer_evaluator.py:229);
    np.rint is HALF_EVEN, so F.bround (not F.round's HALF_UP) — a weight
    landing exactly on .5×(1/Q) must export the same impact the reference
    would. Docs whose vector quantizes to empty get the filler token with
    impact 1 (the reference's empty-doc patch, :236-239). One shuffle
    (groupBy doc), written distributed as JSON lines."""
    impacts = weights.withColumn(
        "impact", F.bround(F.col("weight") * quantization_factor).cast("int")
    ).filter(F.col("impact") > 0)
    vectors = impacts.groupBy("doc_id").agg(
        F.map_from_arrays(
            F.collect_list("term"), F.collect_list("impact")
        ).alias("vector")
    )
    out = (
        documents.select("doc_id", F.col("text").alias("content"))
        .join(vectors, "doc_id", "left")
        .withColumn(
            "vector",
            F.coalesce(
                "vector",
                F.create_map(F.lit(filler_term), F.lit(1)),
            ),
        )
        .select(
            F.to_json(
                F.struct(
                    F.col("doc_id").cast("string").alias("id"),
                    "content",
                    "vector",
                )
            ).alias("value")
        )
    )
    out.write.mode("overwrite").text(path)


def export_anserini_queries_tsv(
    query_weights: DataFrame, path: str, quantization_factor: float = 100.0
) -> None:
    """S13: `qid \\t term term term ...` with each term repeated impact
    times (explode + repeat + concat, JVM-side). HALF_EVEN rounding
    (F.bround) to match the reference's np.rint."""
    q = query_weights.withColumn(
        "impact", F.bround(F.col("weight") * quantization_factor).cast("int")
    ).filter(F.col("impact") > 0)
    lines = q.groupBy("query_id").agg(
        F.concat_ws(
            " ",
            F.flatten(
                F.collect_list(F.array_repeat(F.col("term"), F.col("impact")))
            ),
        ).alias("terms")
    )
    lines.select(
        F.concat_ws("\t", F.col("query_id").cast("string"), "terms").alias("value")
    ).write.mode("overwrite").text(path)


def self_hit_filter(runs: DataFrame) -> DataFrame:
    """P10: drop rows where doc_id == query_id (BEIR protocol,
    splade/beir_eval.py:81-88)."""
    return runs.filter(F.col("doc_id").cast("string") != F.col("query_id").cast("string"))
