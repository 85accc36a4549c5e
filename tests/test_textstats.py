from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from splade_spark.pipeline.multimodal import (
    extract_features,
    resize_meta,
    sample_frames,
    synthetic_assets,
)
from splade_spark.pipeline.textstats import (
    FP_BASE,
    FP_MOD,
    fingerprints,
    lang_id,
    quality_features,
    token_counts,
)


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "hello world, it's me!"), (2, ""), (3, "  a  b  ")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_tokens_ws, r.n_tokens_bpe) for r in token_counts(df).collect()}
    assert out[1] == (4, 8)  # hello/world/,/it/'/s/me/!
    assert out[2] == (0, 0)
    assert out[3] == (2, 2)


def test_quality_features(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "!!! ??? ..."), (3, "word " * 100)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in quality_features(df).collect()}
    assert out[2].punct_ratio > 0.9 and out[2].quality_score < 0.2
    assert out[1].stopword_ratio == pytest.approx(2 / 6)
    assert out[1].unique_ratio == pytest.approx(5 / 6)
    assert out[3].unique_ratio == pytest.approx(1 / 100)
    assert out[1].quality_score > out[2].quality_score


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is happy"),
            (2, "el gato que vive en la casa es feliz y un amigo"),
            (3, "der hund ist ein gutes tier und die katze auch nicht"),
            (4, "le chat est dans la maison et les oiseaux pour une fois"),
            (5, "你好世界这是一个测试"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.lang_pred for r in lang_id(df).collect()}
    assert out == {1: "en", 2: "es", 3: "de", 4: "fr", 5: "zh"}


def test_fingerprints(spark):
    df = spark.createDataFrame(
        [(1, "abc"), (2, "abc"), (3, "abd"), (4, "ab")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.fingerprint, r.min_gram_fp) for r in fingerprints(df).collect()}
    # polynomial hash hand-check: ((a*B + b)*B + c) mod M
    a, b, c = ord("a"), ord("b"), ord("c")
    exp = ((a * FP_BASE + b) * FP_BASE + c) % FP_MOD
    assert out[1][0] == exp and out[2][0] == exp
    assert out[3][0] != exp
    assert out[4][1] is None  # shorter than 8-gram window


def test_multimodal_plumbing(spark):
    assets = synthetic_assets(spark, 30).cache()
    assert assets.count() == 30
    feats = extract_features(assets).cache()
    assert feats.count() == 30
    row = feats.first()
    assert len(row.feature) == 32
    # determinism: same payload → same features
    f2 = extract_features(assets)
    assert (
        feats.alias("a")
        .join(f2.alias("b"), "asset_id")
        .filter(F.col("a.feature") != F.col("b.feature"))
        .count()
        == 0
    )
    frames = sample_frames(assets)
    assert frames.count() > 0
    assert frames.groupBy("asset_id").count().agg(F.max("count")).collect()[0][0] <= 8
    rm = resize_meta(assets, max_side=64)
    bad = rm.filter(
        (F.col("target_width") > 64) | (F.col("target_height") > 64)
    ).count()
    assert bad == 0


def test_multimodal_real_decode_raises(spark):
    assets = synthetic_assets(spark, 3)
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        extract_features(assets, decode_stub=False).collect()
