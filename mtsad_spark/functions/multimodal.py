"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batch shapes,
``mapInPandas`` iterator contracts, partition sizing — while the actual media
codecs are STUBBED (this container ships no image/audio libraries): decode
produces a deterministic fake derived from the bytes when no codec is
available, so pipelines are testable end-to-end and swap to a real codec
(PIL/torchaudio/ffmpeg) by replacing one function.

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


def synth_media(spark, n: int = 200, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes are a pure function of
    (seed, media_id); metadata is consistent with the payload header."""

    def gen():
        rng = np.random.RandomState(seed)
        for i in range(n):
            kind = ("image", "audio", "video")[i % 3]
            w, h = int(rng.randint(16, 256)), int(rng.randint(16, 256))
            dur = int(rng.randint(100, 10_000))
            body = rng.bytes(int(rng.randint(64, 2048)))
            payload = struct.pack(">II", w, h) + body
            yield (i, kind, bytearray(payload), w, h, dur, "fake")

    return spark.createDataFrame(list(gen()), schema=MEDIA_SCHEMA)


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
    """STUB decode/feature-extract. A real deployment replaces this with e.g.
    PIL.Image.open + a vision tower. The fake is deterministic in the bytes:
    md5 → seeded PRNG → unit-norm feature vector, so downstream similarity /
    dedup plumbing is fully exercisable.
    """
    try:  # pragma: no cover - no codec libs in this container
        import PIL.Image  # noqa: F401

        raise NotImplementedError("real codec path not wired in this sandbox")
    except ImportError:
        pass
    digest = hashlib.md5(bytes(payload)).digest()
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
    """STUB resize: clamps metadata and re-stamps the payload header (a real
    impl decodes + resamples pixels). Keeps the binary-in/binary-out batch
    contract that a real kernel needs."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_w, out_h, out_p = [], [], []
            for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                scale = min(1.0, max_side / max(int(w), int(h)))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                body = bytes(p)[8:]
                out_p.append(struct.pack(">II", nw, nh) + body)
                out_w.append(nw)
                out_h.append(nh)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": out_p, "width": out_w, "height": out_h}
            )

    return df.filter(F.col("kind") == "image").mapInPandas(fn, schema=_RESIZE_SCHEMA)


# --------------------------------------------------------- frame-sample stub

_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_ms", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """STUB video frame sampling: emits one fake frame per ``every_ms`` of
    duration (a real impl seeks + decodes). One input row fans out to many
    output rows — the mapInPandas contract the real kernel shares."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for mid, p, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                n = max(1, int(dur) // every_ms)
                for i in range(n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_ts_ms"].append(i * every_ms)
                    h = hashlib.md5(bytes(p) + struct.pack(">I", i)).digest()
                    rows["frame"].append(h)
            yield pd.DataFrame(rows)

    return df.filter(F.col("kind") == "video").mapInPandas(fn, schema=_FRAME_SCHEMA)
