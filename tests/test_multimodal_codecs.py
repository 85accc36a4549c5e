"""Real stdlib media codecs: WAV/BMP/PNG round-trips, feature extraction,
and the Spark real-decode path over them.

The reference has no media layer; this is the LLM-training-data pipeline
requirement. The decoders are exact (lossless formats), so round-trips
assert bit-identical pixel/sample recovery — not approximate similarity.
"""

from __future__ import annotations

import numpy as np
import pytest

from splade_spark.pipeline.multimodal import (
    audio_features,
    decode_asset,
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    extract_features,
    image_features,
    resize_images,
    synthetic_assets,
)


def _rand_img(rng, h, w, c=3):
    a = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    return a if c > 1 else a[:, :, 0]


def test_bmp_roundtrip_exact():
    rng = np.random.default_rng(1)
    for h, w in [(1, 1), (5, 7), (16, 16), (33, 31)]:  # odd widths hit padding
        img = _rand_img(rng, h, w)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_roundtrip_exact_all_filters(filter_type, channels):
    rng = np.random.default_rng(2 + filter_type * 10 + channels)
    img = _rand_img(rng, 13, 17, channels)
    dec = decode_png(encode_png(img, filter_type=filter_type))
    assert dec.shape == img.shape
    assert np.array_equal(dec, img)


def test_png_rejects_garbage_and_bmp_magic():
    with pytest.raises(ValueError):
        decode_png(b"not a png")
    with pytest.raises(ValueError):
        decode_bmp(b"XXnot a bmp")


def test_wav_roundtrip_exact_mono_and_stereo():
    rng = np.random.default_rng(3)
    mono = rng.integers(-32768, 32768, size=400, dtype=np.int16)
    rate, x = decode_wav(encode_wav(mono, rate=8000))
    assert rate == 8000
    assert np.array_equal((x * 32768.0).astype(np.int16), mono)
    stereo = rng.integers(-32768, 32768, size=(200, 2), dtype=np.int16)
    rate, x2 = decode_wav(encode_wav(stereo, rate=16000))
    assert rate == 16000 and x2.shape == (200, 2)
    assert np.array_equal((x2 * 32768.0).astype(np.int16), stereo)


def test_audio_features_find_dominant_frequency():
    rate, f0 = 8000, 440.0
    t = np.arange(rate) / rate  # 1 second
    x = 0.5 * np.sin(2 * np.pi * f0 * t)
    feats = audio_features(x, rate)
    dur, rms, zcr, peak_hz = feats[0], feats[1], feats[2], feats[3]
    assert dur == pytest.approx(1.0)
    assert rms == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)
    assert peak_hz == pytest.approx(f0, abs=2.0)
    assert zcr == pytest.approx(2 * f0 / rate, rel=0.05)


def test_image_features_shape_and_flat_image():
    img = np.full((8, 8, 3), 200, dtype=np.uint8)
    f = image_features(img)
    assert f.shape == (32,)
    assert f[0] == 8 and f[1] == 8
    assert f[2:5] == pytest.approx([200.0] * 3)  # channel means
    assert f[5:8] == pytest.approx([0.0] * 3)  # channel stds


def test_decode_asset_sniffs_all_three_formats():
    rng = np.random.default_rng(4)
    img = _rand_img(rng, 9, 9)
    assert decode_asset(encode_bmp(img)).shape == (32,)
    assert decode_asset(encode_png(img)).shape == (32,)
    assert decode_asset(encode_wav(np.zeros(100, dtype=np.int16))).shape == (32,)
    with pytest.raises(NotImplementedError, match="libjpeg/ffmpeg"):
        decode_asset(b"\xff\xd8\xff\xe0 jpeg-ish bytes")


def test_real_formats_assets_decode_in_spark(spark):
    assets = synthetic_assets(spark, 30, real_formats=True).cache()
    # video third is honestly undecodable -> skip drops exactly those
    feats = extract_features(
        assets, decode_stub=False, on_undecodable="skip"
    ).cache()
    assert feats.count() == 20
    assert feats.filter("kind = 'video'").count() == 0
    # Spark kernel output == local decode of the same payloads
    rows = assets.filter("kind != 'video'").select("asset_id", "payload").collect()
    local = {r.asset_id: decode_asset(bytes(r.payload)) for r in rows}
    for r in feats.collect():
        assert np.allclose(r.feature, local[r.asset_id])
    # error mode still raises on the video rows
    with pytest.raises(Exception, match="libjpeg/ffmpeg|NotImplementedError"):
        extract_features(assets, decode_stub=False).collect()


def test_resize_images_real_pixels(spark):
    assets = synthetic_assets(spark, 12, real_formats=True)
    out = resize_images(assets, max_side=24).collect()
    assert len(out) == 4  # the image third
    for r in out:
        assert max(r.width, r.height) <= 24
        img = (
            decode_png(bytes(r.payload))
            if bytes(r.payload)[:8].startswith(b"\x89PNG")
            else decode_bmp(bytes(r.payload))
        )
        assert img.shape[0] == r.height and img.shape[1] == r.width
    # aspect ratio preserved within rounding
    src = {
        r.asset_id: (int(r.meta["width"]), int(r.meta["height"]))
        for r in assets.filter("kind = 'image'").collect()
    }
    for r in out:
        w0, h0 = src[r.asset_id]
        assert abs(r.width / r.height - w0 / h0) < 0.2


def test_resize_is_identity_when_smaller_than_max(spark):
    """An image already under max_side must come back bit-identical through
    the full Spark resize kernel (scale clamps to 1.0 → bilinear at the
    source grid → same pixels → same PNG/BMP payload pixels)."""
    rng = np.random.default_rng(5)
    img_png = _rand_img(rng, 10, 14)
    img_bmp = _rand_img(rng, 9, 6)
    assets = spark.createDataFrame(
        [
            (1, "image", bytearray(encode_png(img_png)), {}),
            (2, "image", bytearray(encode_bmp(img_bmp)), {}),
        ],
        "asset_id long, kind string, payload binary, meta map<string,string>",
    )
    out = {r.asset_id: r for r in resize_images(assets, max_side=64).collect()}
    assert (out[1].width, out[1].height) == (14, 10)
    assert (out[2].width, out[2].height) == (6, 9)
    assert np.array_equal(decode_png(bytes(out[1].payload)), img_png)
    assert np.array_equal(decode_bmp(bytes(out[2].payload)), img_bmp)


def test_corrupt_payloads_skip_and_count(spark):
    """Corrupt payloads behind VALID magic bytes (truncated PNG IDAT,
    broken WAV) must not crash skip mode — they are dropped and counted
    via the optional accumulator; error mode still raises."""
    rng = np.random.default_rng(6)
    good = encode_png(_rand_img(rng, 8, 8))
    bad_png = good[:40] + b"\x00" * 10  # valid sig, truncated/garbled IDAT
    bad_wav = encode_wav(np.zeros(50, dtype=np.int16))[:20]  # RIFF, cut fmt
    assets = spark.createDataFrame(
        [
            (1, "image", bytearray(good), {}),
            (2, "image", bytearray(bad_png), {}),
            (3, "audio", bytearray(bad_wav), {}),
        ],
        "asset_id long, kind string, payload binary, meta map<string,string>",
    )
    ctr = spark.sparkContext.accumulator(0)
    feats = extract_features(
        assets, decode_stub=False, on_undecodable="skip", skip_counter=ctr
    ).collect()
    assert [r.asset_id for r in feats] == [1]
    assert ctr.value == 2  # 'count the rest' is a real number
    with pytest.raises(Exception):
        extract_features(assets, decode_stub=False).collect()
    # resize also survives the corrupt rows: only the good image returns
    resized = resize_images(assets, max_side=4).collect()
    assert [r.asset_id for r in resized] == [1]


def test_tiny_image_features_are_finite():
    """1x1 and 2x2 images (common scraped-thumbnail degenerates) must not
    produce NaN pooling features: the 4x4 thumbnail pools over a
    replicate-padded grid while the h/w features keep the true dims."""
    for h, w in [(1, 1), (2, 2), (1, 5), (3, 2)]:
        img = np.full((h, w, 3), 100, dtype=np.uint8)
        f = image_features(img)
        assert np.isfinite(f).all(), (h, w)
        assert f[0] == h and f[1] == w
        # flat image → every pooled cell equals the pixel value
        assert f[10:26] == pytest.approx([100.0] * 16)


def test_encode_wav_clips_out_of_range_ints():
    """Out-of-range int samples must clip, not wrap (40000 → 32767, not
    -25536); in-range samples stay exact."""
    x = np.array([40000, -40000, 1234, -32768, 32767], dtype=np.int64)
    rate, dec = decode_wav(encode_wav(x, rate=8000))
    got = (dec * 32768.0).round().astype(np.int64)
    assert got.tolist() == [32767, -32768, 1234, -32768, 32767]
