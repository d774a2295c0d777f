"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Spark-side plumbing — schemas, Arrow batch shapes, ``mapInPandas``
iterator contracts, partition sizing — runs REAL pure-numpy codecs
(functions/codecs.py): PNG images, WAV PCM16 audio, Y4M (YUV4MPEG2 C444)
video; all three round-trip bit-exactly. Unrecognized containers fall back
to a deterministic stub (md5-seeded fake) so pipelines over codec-less
fixtures stay exercisable; a production deployment swaps richer codecs
(PIL/torchaudio/ffmpeg) in behind the same per-row kernel seams.

Design for scale:
  - media blobs never pass through the driver; ``mapInPandas`` streams Arrow
    batches on executors,
  - ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds executor memory
    per batch (set low for large blobs),
  - metadata (width/height/duration/...) travels as ordinary columns so
    filters on it prune BEFORE decode (predicate pushdown on the parquet
    scan, decode only on surviving rows).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("codec", StringType()),
    ]
)


def synth_media_items(n: int = 200, seed: int = 42, real_codecs: bool = False):
    """Deterministic media generator shared by :func:`synth_media` (Spark DF)
    and the shared-parquet oracle fixture (fixture_cache.ensure_media_fixture):
    yields ``(row_tuple, source)`` where ``source`` is the PRE-ENCODE numpy
    payload content (image pixels / int16 samples / YUV frames) so an oracle
    can derive expected features from the source truth without ever running
    the decoders. Generation draws are strictly sequential per item, so the
    first m items of ``n`` equal all items of ``m`` for m ≤ n."""
    from .codecs import encode_png, encode_wav, encode_y4m

    rng = np.random.RandomState(seed)
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        w, h = int(rng.randint(16, 256)), int(rng.randint(16, 256))
        dur = int(rng.randint(100, 10_000))
        source = None
        if real_codecs and kind == "image":
            img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            payload, codec, source = encode_png(img), "png", img
        elif real_codecs and kind == "audio":
            rate = 8000
            t = np.arange(int(rate * dur / 1000), dtype=np.float64)
            wave = np.sin(2 * np.pi * (100 + (i % 20) * 10) * t / rate)
            samples = (wave * 20000).astype("<i2")
            payload, codec, source = encode_wav(rate, samples), "wav", samples
        elif real_codecs and kind == "video":
            w, h = w % 48 + 16, h % 48 + 16  # keep clips fixture-sized
            n_frames = max(1, dur * 4 // 1000)  # 4 fps
            frames = rng.randint(0, 256, size=(n_frames, h, w, 3), dtype=np.uint8)
            payload, codec, source = encode_y4m(frames, fps=(4, 1)), "y4m", frames
        else:
            body = rng.bytes(int(rng.randint(64, 2048)))
            payload, codec = struct.pack(">II", w, h) + body, "fake"
        yield (i, kind, bytearray(payload), w, h, dur, codec), source


def synth_media(spark, n: int = 200, seed: int = 42, real_codecs: bool = False) -> DataFrame:
    """Deterministic fake media table: payload bytes are a pure function of
    (seed, media_id); metadata is consistent with the payload header.

    ``real_codecs=True`` emits REAL containers — images as valid PNGs, audio
    as valid PCM16 WAVs, video as valid Y4M clips at 4 fps
    (functions/codecs.py) — so the decode path runs the actual codec instead
    of the stub."""
    rows = [r for r, _src in synth_media_items(n, seed, real_codecs)]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


# --------------------------------------------------------------- decode stub

_DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", IntegerType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def _decode_kernel(payload: bytes, n_features: int = 8) -> np.ndarray:
    """Decode/feature-extract behind one seam.

    REAL paths (pure numpy/stdlib, functions/codecs.py): PNG payloads decode
    to pixels → intensity-histogram features; WAV payloads decode to PCM →
    per-segment RMS features; Y4M payloads decode to frames → luma-plane
    histogram over the whole clip. All deterministic, unit-norm.
    FALLBACK (unrecognized container, e.g. synth_media's fake payloads): the
    round-1 deterministic stub — md5 → seeded PRNG → unit-norm vector — so
    pipelines over codec-less fixtures stay exercisable end-to-end.
    A production deployment swaps richer codecs (PIL/ffmpeg) in here only.
    """
    from .codecs import decode_png, decode_wav, decode_y4m, is_png, is_wav, is_y4m

    b = bytes(payload)
    if is_png(b):
        img = decode_png(b)
        gray = img[:, :, :3].mean(axis=2) if img.shape[2] >= 3 else img[:, :, 0]
        hist, _ = np.histogram(gray, bins=n_features, range=(0.0, 256.0))
        v = hist.astype(np.float64)
        n = np.linalg.norm(v)
        return v / n if n > 0 else v
    if is_wav(b):
        _, samples = decode_wav(b)
        x = samples.astype(np.float64).mean(axis=1)
        segs = np.array_split(x, n_features)
        v = np.array([np.sqrt((s * s).mean()) if len(s) else 0.0 for s in segs])
        n = np.linalg.norm(v)
        return v / n if n > 0 else v
    if is_y4m(b):
        _, frames = decode_y4m(b)
        luma = frames[:, :, :, 0].astype(np.float64)  # Y plane across the clip
        hist, _ = np.histogram(luma, bins=n_features, range=(0.0, 256.0))
        v = hist.astype(np.float64)
        n = np.linalg.norm(v)
        return v / n if n > 0 else v
    digest = hashlib.md5(b).digest()
    rng = np.random.RandomState(np.frombuffer(digest[:4], dtype=np.uint32)[0])
    v = rng.randn(n_features)
    return v / np.linalg.norm(v)


def decode_features(df: DataFrame, n_features: int = 8, batch_rows: int = 256) -> DataFrame:
    """mapInPandas decode: binary payload → feature vector + checked metadata.

    Iterator-of-frames form so one task streams many small Arrow batches —
    blobs never concentrate in a single pandas frame.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_kernel(p, n_features).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return df.mapInPandas(fn, schema=_DECODE_SCHEMA)


# --------------------------------------------------------------- resize stub

_RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(df: DataFrame, max_side: int = 64) -> DataFrame:
    """Resize: PNG payloads take the REAL path — decode, nearest-neighbor
    resample, re-encode (functions/codecs.py). Unrecognized containers keep
    the round-1 stub (clamp metadata, re-stamp the fake header) so the
    binary-in/binary-out batch contract is exercised either way."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import decode_png, encode_png, is_png, resize_nearest

        for pdf in batches:
            out_w, out_h, out_p = [], [], []
            for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                b = bytes(p)
                if is_png(b):
                    img = decode_png(b)
                    ih, iw = img.shape[:2]
                    scale = min(1.0, max_side / max(iw, ih))
                    nw, nh = max(1, int(iw * scale)), max(1, int(ih * scale))
                    out_p.append(encode_png(resize_nearest(img, nw, nh)))
                else:
                    scale = min(1.0, max_side / max(int(w), int(h)))
                    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                    out_p.append(struct.pack(">II", nw, nh) + b[8:])
                out_w.append(nw)
                out_h.append(nh)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": out_p, "width": out_w, "height": out_h}
            )

    return df.filter(F.col("kind") == "image").mapInPandas(fn, schema=_RESIZE_SCHEMA)


# --------------------------------------------------------------- frame sample

_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_ms", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling, one output row per sampled frame.

    REAL path (Y4M payloads): demux the clip (codecs.decode_y4m), pick the
    frame at each ``every_ms`` timestamp by the stream's own frame rate, and
    emit it PNG-encoded — so sampled frames feed straight back into the
    image decode/resize operators. FALLBACK (unrecognized container): the
    round-1 deterministic fake frame per ``every_ms`` of the metadata
    duration. Either way one input row fans out to many output rows — the
    mapInPandas contract is identical."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import decode_y4m, encode_png, is_y4m

        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for mid, p, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                b = bytes(p)
                if is_y4m(b):
                    (num, den), frames = decode_y4m(b)
                    clip_ms = len(frames) * 1000.0 * den / num
                    i, t = 0, 0.0
                    while t < clip_ms:
                        src = min(int(t * num / (1000.0 * den)), len(frames) - 1)
                        rows["media_id"].append(mid)
                        rows["frame_idx"].append(i)
                        rows["frame_ts_ms"].append(int(t))
                        rows["frame"].append(encode_png(frames[src]))
                        i, t = i + 1, t + every_ms
                    continue
                n = max(1, int(dur) // every_ms)
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(i * every_ms)
                    h = hashlib.md5(b + struct.pack(">I", i)).digest()
                    rows["frame"].append(h)
            yield pd.DataFrame(rows)

    return df.filter(F.col("kind") == "video").mapInPandas(fn, schema=_FRAME_SCHEMA)
