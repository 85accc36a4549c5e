"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery — schema, partition-preserving mapInPandas
decode/feature stages, Arrow batch shapes, frame sampling — is real and
tested, and so is media decode for every format this environment can
support without external codec libraries:

- **WAV (PCM16)** via stdlib `wave` — real sample decode, real features
  (duration, RMS, zero-crossing rate, dominant frequency, FFT band
  energies).
- **BMP (24-bit uncompressed)** via `struct`+numpy — real pixel decode.
- **PNG (8-bit gray/RGB/RGBA, non-interlaced, filters 0-4)** via stdlib
  `zlib` + a numpy unfilter — real pixel decode. The encoder emits
  filter 0/2 rows (fully vectorized decode); Sub/Average/Paeth rows from
  external files take a per-row scalar path.

JPEG / Opus / H.264 genuinely need libjpeg/ffmpeg, which are absent here:
`decode_stub=True` (default) produces a deterministic fake decode from the
payload bytes for plumbing tests; `decode_stub=False` runs the REAL
decoders above, sniffing the container from payload magic bytes, and
raises NotImplementedError only for the codec-library formats.

Asset schema: (asset_id long, kind string in {image,audio,video},
payload binary, meta map<string,string>).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ASSET_SCHEMA = "asset_id long, kind string, payload binary, meta map<string,string>"

FEATURE_DIM = 32

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def synthetic_assets(
    spark: SparkSession, n: int, seed: int = 42, real_formats: bool = False
) -> DataFrame:
    """Deterministic asset table for tests.

    real_formats=False (default): payload = seeded opaque bytes with
    codec-library metadata (jpeg/opus/h264) — the plumbing-test corpus.
    real_formats=True: images are genuine BMP/PNG encodes of seeded
    gradient+noise pixels, audio is a genuine PCM16 WAV of a seeded sine
    mix — decodable by this module's real path end to end; video stays an
    opaque h264 payload (ffmpeg-only, honestly undecodable here)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"].tolist():
                rng = np.random.default_rng(seed * 7919 + i)
                kind = kinds[i % 3]
                if not real_formats or kind == "video":
                    payload = rng.bytes(int(rng.integers(64, 512)))
                    meta = {
                        "width": str(int(rng.integers(16, 512))),
                        "height": str(int(rng.integers(16, 512))),
                        "codec": {
                            "image": "jpeg", "audio": "opus", "video": "h264",
                        }[kind],
                    }
                elif kind == "image":
                    h = int(rng.integers(16, 64))
                    w = int(rng.integers(16, 64))
                    gx = np.linspace(0, 255, w)[None, :, None]
                    gy = np.linspace(0, 255, h)[:, None, None]
                    noise = rng.integers(0, 40, size=(h, w, 3))
                    img = np.clip(
                        (gx + gy) / 2 + noise, 0, 255
                    ).astype(np.uint8)
                    if i % 2 == 0:
                        payload, codec = encode_bmp(img), "bmp"
                    else:
                        payload, codec = encode_png(img), "png"
                    meta = {"width": str(w), "height": str(h), "codec": codec}
                else:  # audio
                    rate = 8000
                    dur = float(rng.uniform(0.05, 0.3))
                    t = np.arange(int(rate * dur)) / rate
                    f0 = float(rng.uniform(100, 2000))
                    x = 0.6 * np.sin(2 * np.pi * f0 * t) + 0.2 * np.sin(
                        2 * np.pi * 2.5 * f0 * t
                    )
                    payload = encode_wav(x, rate)
                    meta = {
                        "rate": str(rate),
                        "seconds": f"{dur:.3f}",
                        "codec": "wav",
                    }
                rows.append((int(i), kind, payload, meta))
            yield pd.DataFrame(rows, columns=["asset_id", "kind", "payload", "meta"])

    return spark.range(0, n, 1, max(2, n // 500)).mapInPandas(gen, schema=ASSET_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: sha256-seeded features."""
    h = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(np.frombuffer(h[:8], dtype=np.uint64)[0])
    return rng.standard_normal(dim)


# --------------------------------------------------------------------------
# Real codecs (stdlib-only): WAV/PCM16, BMP24, PNG8
# --------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """PCM16 WAV bytes from int16 samples (or floats in [-1, 1])."""
    x = np.asarray(samples)
    if x.dtype.kind == "f":
        x = (np.clip(x, -1.0, 1.0) * 32767.0).round().astype("<i2")
    else:
        # clip integer inputs too: a bare int16 cast WRAPS out-of-range
        # values (40000 → -25536), silently corrupting loud samples
        x = np.clip(x.astype(np.int64), -32768, 32767).astype("<i2")
    nch = 1 if x.ndim == 1 else x.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """(rate, float64 samples in [-1, 1)); stereo → shape (n, 2)."""
    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError("only PCM16 WAV is supported")
        rate, nch = w.getframerate(), w.getnchannels()
        raw = w.readframes(w.getnframes())
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    if nch > 1:
        x = x.reshape(-1, nch)
    return rate, x


def encode_bmp(img: np.ndarray) -> bytes:
    """24-bit uncompressed bottom-up BMP from a uint8 (h, w, 3) RGB array."""
    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    row = w * 3
    pad = (-row) % 4
    stride = row + pad
    # bottom-up row order, BGR channel order, 4-byte row padding
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, :row] = img[::-1, :, ::-1].reshape(h, row)
    pixel_off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", pixel_off + h * stride, 0, 0, pixel_off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, h * stride, 2835, 2835, 0, 0
    )
    return hdr + info + body.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """uint8 (h, w, 3) RGB array from a 24-bit uncompressed BMP."""
    b = bytes(payload)
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", b, 10)[0]
    _, w, h, _, bpp = struct.unpack_from("<IiiHH", b, 14)
    comp = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP is supported")
    flip = h > 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    arr = (
        np.frombuffer(b, np.uint8, stride * h, pixel_off)
        .reshape(h, stride)[:, :row]
        .reshape(h, w, 3)[:, :, ::-1]
    )
    return np.ascontiguousarray(arr[::-1] if flip else arr)


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data))
    )


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """8-bit non-interlaced PNG from uint8 (h, w[, c]) with c in {1, 3, 4}.

    filter_type 0 (None) or 2 (Up) keep decode fully vectorized; 1/3/4
    (Sub/Average/Paeth) are supported for round-trip testing of the
    decoder's scalar path."""
    img = np.asarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    c = 1 if img.ndim == 2 else img.shape[2]
    color = {1: 0, 3: 2, 4: 6}[c]
    raw = img.reshape(h, w * c).astype(np.int32)
    prev = np.zeros(w * c, dtype=np.int32)
    lines = []
    for y in range(h):
        cur = raw[y]
        left = np.concatenate([np.zeros(c, np.int32), cur[:-c]])
        ul = np.concatenate([np.zeros(c, np.int32), prev[:-c]])
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:
            filt = cur - left
        elif filter_type == 2:
            filt = cur - prev
        elif filter_type == 3:
            filt = cur - (left + prev) // 2
        elif filter_type == 4:
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = cur - pred
        else:
            raise ValueError(f"unknown PNG filter {filter_type}")
        lines.append(bytes([filter_type]) + (filt % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """uint8 (h, w[, c]) from an 8-bit gray/RGB/RGBA non-interlaced PNG.

    All five scanline filters are handled; None/Up rows decode with pure
    numpy, Sub/Average/Paeth rows walk pixels (the intra-row dependency is
    inherently sequential)."""
    b = bytes(payload)
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(b):
        (ln,) = struct.unpack_from(">I", b, pos)
        tag = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or interlace != 0 or comp != 0 or color not in (0, 2, 6):
        raise NotImplementedError(
            "only 8-bit gray/RGB/RGBA non-interlaced PNG is supported"
        )
    c = {0: 1, 2: 3, 6: 4}[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        off = y * (stride + 1)
        f = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, off + 1).astype(np.int32)
        if f == 0:
            cur = line
        elif f == 2:
            cur = (line + prev) % 256
        elif f in (1, 3, 4):
            cur = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - c] if x >= c else 0
                up = int(prev[x])
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + up) // 2
                else:
                    ul = int(prev[x - c]) if x >= c else 0
                    p = a + up - ul
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - ul)
                    pred = a if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                cur[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter byte {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, c) if c > 1 else out.reshape(h, w)


def image_features(img: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic real features from decoded pixels: dims, per-channel
    mean/std, gray mean/std, 4x4 mean-pooled gray thumbnail (26 values,
    zero-padded to dim)."""
    a = np.asarray(img, dtype=np.float64)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    a = a[:, :, :3]
    h, w, _ = a.shape
    gray = a.mean(axis=2)
    # tiny images (any side < 4) would give duplicate linspace bin edges →
    # empty pooling slices → NaN features; replicate-pad to >= 4 per side
    # first (1x1/2x2 thumbnails are common in scraped corpora). The h/w
    # features below keep the ORIGINAL dims.
    if h < 4:
        gray = np.repeat(gray, -(-4 // h), axis=0)
    if w < 4:
        gray = np.repeat(gray, -(-4 // w), axis=1)
    gh, gw = gray.shape
    ys = np.linspace(0, gh, 5).astype(int)
    xs = np.linspace(0, gw, 5).astype(int)
    thumb = [
        gray[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
        for i in range(4)
        for j in range(4)
    ]
    feats = [
        float(h), float(w),
        *a.mean(axis=(0, 1)), *a.std(axis=(0, 1)),
        gray.mean(), gray.std(), *thumb,
    ]
    out = np.zeros(dim)
    out[: min(len(feats), dim)] = feats[:dim]
    return out


def audio_features(
    samples: np.ndarray, rate: int, dim: int = FEATURE_DIM
) -> np.ndarray:
    """Deterministic real features from decoded PCM: duration, RMS,
    zero-crossing rate, dominant frequency, 8 log band energies
    (12 values, zero-padded to dim)."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim > 1:
        x = x.mean(axis=1)
    n = len(x)
    dur = n / rate if rate else 0.0
    rms = float(np.sqrt(np.mean(x**2))) if n else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(x)) if n else np.zeros(1)
    peak_hz = float(np.argmax(spec)) / max(len(spec) - 1, 1) * (rate / 2.0)
    bands = [float(np.log1p((b**2).sum())) for b in np.array_split(spec, 8)]
    feats = [dur, rms, zcr, peak_hz, *bands]
    out = np.zeros(dim)
    out[: min(len(feats), dim)] = feats[:dim]
    return out


def decode_asset(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Sniff the container from magic bytes and run the REAL decoder +
    feature extractor. Raises NotImplementedError for formats that truly
    need external codec libraries (JPEG/Opus/H.264)."""
    b = bytes(payload)
    if b[:8] == _PNG_SIG:
        return image_features(decode_png(b), dim)
    if b[:2] == b"BM":
        return image_features(decode_bmp(b), dim)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        rate, x = decode_wav(b)
        return audio_features(x, rate, dim)
    raise NotImplementedError(
        "payload is not WAV/BMP/PNG — JPEG/Opus/H.264 decode requires "
        "libjpeg/ffmpeg, which are not available in this environment"
    )


# what a corrupt-but-magic-matching payload can raise out of the stdlib
# decoders: truncated IDAT → zlib.error, corrupt WAV fmt → wave.Error,
# short BMP/PNG headers → struct.error / ValueError / EOFError / IndexError
_DECODE_ERRORS = (
    NotImplementedError,
    ValueError,
    zlib.error,
    wave.Error,
    struct.error,
    EOFError,
    IndexError,
)


def extract_features(
    assets: DataFrame,
    dim: int = FEATURE_DIM,
    decode_stub: bool = True,
    on_undecodable: str = "error",
    skip_counter=None,
) -> DataFrame:
    """(asset_id, kind, feature array<double>): decode + feature-extract.

    decode_stub=True keeps the deterministic sha256-seeded fake (plumbing
    tests, format-free corpora). decode_stub=False runs the REAL stdlib
    decoders (WAV/BMP/PNG, sniffed from payload magic — see module
    docstring). Undecodable rows — unsupported container (needs
    libjpeg/ffmpeg) OR corrupt payloads behind a valid magic (truncated
    IDAT, broken fmt chunk, short header) — raise when
    on_undecodable='error', or are dropped when on_undecodable='skip'
    (the curation-pipeline shape: decode what you can, count the rest).

    skip_counter: optional Spark accumulator
    (``spark.sparkContext.accumulator(0)``) incremented per skipped row so
    'count the rest' is a real number, not a diff of two counts. Standard
    accumulator caveat applies: task retries can overcount — treat it as a
    curation diagnostic, not an exact ledger (the exact ledger is
    ``assets.count() - features.count()``)."""
    if on_undecodable not in ("error", "skip"):
        raise ValueError("on_undecodable must be 'error' or 'skip'")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, kinds, feats = [], [], []
            for aid, kind, p in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                if decode_stub:
                    f = _fake_decode(bytes(p), dim)
                else:
                    try:
                        f = decode_asset(bytes(p), dim)
                    except _DECODE_ERRORS:
                        if on_undecodable == "skip":
                            if skip_counter is not None:
                                skip_counter.add(1)
                            continue
                        raise
                ids.append(aid)
                kinds.append(kind)
                feats.append(f.tolist())
            if not ids:
                # an all-skipped batch must yield nothing: an empty pandas
                # frame types 'feature' as float64, which Arrow cannot cast
                # to list<double>
                continue
            yield pd.DataFrame(
                {"asset_id": ids, "kind": kinds, "feature": feats}
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        kernel, schema="asset_id long, kind string, feature array<double>"
    )


def resize_images(assets: DataFrame, max_side: int = 256) -> DataFrame:
    """(asset_id, kind, width, height, payload): REAL pixel resize of every
    decodable image asset — decode (BMP/PNG), bilinear-resample to fit
    max_side preserving aspect ratio (never upscale, matching resize_meta's
    plan), re-encode in the same container. Non-image or undecodable
    payloads are dropped (the catalog half, resize_meta, plans for them)."""

    def _bilinear(img: np.ndarray, th: int, tw: int) -> np.ndarray:
        h, w = img.shape[:2]
        ys = (np.arange(th) + 0.5) * h / th - 0.5
        xs = (np.arange(tw) + 0.5) * w / tw - 0.5
        y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
        x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
        y1 = np.minimum(y0 + 1, h - 1)
        x1 = np.minimum(x0 + 1, w - 1)
        wy = np.clip(ys - y0, 0, 1)[:, None, None]
        wx = np.clip(xs - x0, 0, 1)[None, :, None]
        a = img[y0][:, x0].astype(np.float64)
        b = img[y0][:, x1].astype(np.float64)
        c = img[y1][:, x0].astype(np.float64)
        d = img[y1][:, x1].astype(np.float64)
        out = (
            a * (1 - wy) * (1 - wx)
            + b * (1 - wy) * wx
            + c * wy * (1 - wx)
            + d * wy * wx
        )
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, ws, hs, payloads = [], [], [], [], []
            for aid, kind, p in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                b = bytes(p)
                try:
                    if b[:8] == _PNG_SIG:
                        img, enc = decode_png(b), encode_png
                    elif b[:2] == b"BM":
                        img, enc = decode_bmp(b), encode_bmp
                    else:
                        continue
                except _DECODE_ERRORS:
                    # corrupt payload behind a valid magic (truncated IDAT,
                    # short header): drop it, same contract as the sniff miss
                    continue
                if img.ndim == 2:
                    img = img[:, :, None]
                h, w = img.shape[:2]
                scale = min(max_side / w, max_side / h, 1.0)
                tw, th = int(round(w * scale)), int(round(h * scale))
                res = _bilinear(img, th, tw)
                if res.shape[2] == 1:
                    res = res[:, :, 0]
                ids.append(aid)
                kinds.append(kind)
                ws.append(tw)
                hs.append(th)
                payloads.append(enc(res))
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "kind": kinds,
                    "width": ws,
                    "height": hs,
                    "payload": payloads,
                }
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        kernel,
        schema="asset_id long, kind string, width int, height int, payload binary",
    )


def sample_frames(
    assets: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """(asset_id, frame_idx, frame binary): frame sampling for video assets.

    Stub treats every_n_bytes-sized payload slices as 'frames' — the real
    implementation swaps the slicing for ffmpeg keyframe extraction; the
    explode shape (one row per sampled frame, partition-preserved) stays."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_frame = [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload)
                for j in range(min(max_frames, max(1, len(b) // every_n_bytes))):
                    out_id.append(aid)
                    out_idx.append(j)
                    out_frame.append(b[j * every_n_bytes : (j + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"asset_id": out_id, "frame_idx": out_idx, "frame": out_frame}
            )

    return (
        assets.filter(F.col("kind") == "video")
        .select("asset_id", "payload")
        .mapInPandas(kernel, schema="asset_id long, frame_idx int, frame binary")
    )


def resize_meta(assets: DataFrame, max_side: int = 256) -> DataFrame:
    """Pure-SQL resize planning: target dims preserving aspect ratio from
    typed metadata — the catalog-side half of a resize stage (the pixel
    work belongs in extract_features' kernel)."""
    w = F.col("meta")["width"].cast("int")
    h = F.col("meta")["height"].cast("int")
    scale = F.least(F.lit(max_side) / w, F.lit(max_side) / h, F.lit(1.0))
    return assets.withColumn("target_width", F.round(w * scale).cast("int")).withColumn(
        "target_height", F.round(h * scale).cast("int")
    )
