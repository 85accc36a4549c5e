from __future__ import annotations

from pyspark.sql import functions as F

from splade_spark.fixtures import queries, transcripts


def test_transcripts_deterministic_across_partitioning(spark):
    a = transcripts(spark, 50, partitions=2).orderBy("conv_id", "turn_idx")
    b = transcripts(spark, 50, partitions=7).orderBy("conv_id", "turn_idx")
    assert [r.asDict() for r in a.collect()] == [r.asDict() for r in b.collect()]


def test_transcripts_schema_and_invariants(tiny_transcripts):
    t = tiny_transcripts
    assert set(t.columns) == {"conv_id", "turn_idx", "role", "text", "tool", "ts"}
    assert t.count() > 100
    # turn_idx dense per conversation, ts strictly increasing within conv
    agg = t.groupBy("conv_id").agg(
        F.count("*").alias("n"),
        F.max("turn_idx").alias("mx"),
        F.min("turn_idx").alias("mn"),
    )
    bad = agg.filter((F.col("mx") != F.col("n") - 1) | (F.col("mn") != 0)).count()
    assert bad == 0
    # edge cases present
    assert t.filter(F.col("text") == "").count() > 0
    assert t.filter(F.col("text").contains("\t")).count() > 0
    assert t.filter(F.col("tool").isNotNull()).count() > 0


def test_per_turn_text_equality_after_shuffle(spark, tiny_transcripts):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering after engine transformations."""
    orig = tiny_transcripts.orderBy("conv_id", "turn_idx").select("text").collect()
    roundtrip = (
        tiny_transcripts.repartition(13, "role")
        .sortWithinPartitions("ts")
        .orderBy("conv_id", "turn_idx")
        .select("text")
        .collect()
    )
    assert [r.text for r in orig] == [r.text for r in roundtrip]


def test_query_fixture_edge_cases():
    q = queries(25)
    assert len(q) == 25
    texts = q["text"].tolist()
    assert any("zzzunknownterm" in t for t in texts)
    assert any(t == "!!! ???" for t in texts)
