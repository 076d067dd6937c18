"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via ``mapInPandas`` in Arrow
batches. The image/audio codec libraries are NOT in this container, so
the decode step is STUBBED (deterministic fake, clearly marked) — the
Spark-side plumbing (schema, partitioning, UDF signatures, batch shapes)
is real and tested, and a real decoder drops into ``DECODERS`` unchanged.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)


def synth_media(spark, docs: DataFrame) -> DataFrame:
    """Materialize a media table from the docs' media spans: payload bytes
    derived deterministically from the ref (stands in for object-store
    fetch; byte-identical across runs)."""
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .filter("s.kind = 'media'")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref in pdf["media_ref"]:
                seed = hashlib.md5(ref.encode()).digest()
                kind = ["image", "audio", "video"][seed[0] % 3]
                payload = (seed * 8)[: 64 + seed[1] % 64]
                rows.append(
                    (ref, kind, payload,
                     {"bytes": str(len(payload)), "codec": "fake/v1"})
                )
            yield pd.DataFrame(rows, columns=["media_ref", "kind", "payload", "meta"])

    return refs.mapInPandas(gen, MEDIA_SCHEMA)


def _fake_decode_image(payload: bytes) -> np.ndarray:
    """STUB — no PIL/libjpeg in this container. Deterministic 8×8×3 uint8
    'pixels' from the payload hash. Replace with PIL.Image.open in prod."""
    h = hashlib.sha256(payload).digest()
    return np.frombuffer((h * 6)[: 8 * 8 * 3], dtype=np.uint8).reshape(8, 8, 3).copy()


def _fake_decode_audio(payload: bytes) -> np.ndarray:
    """STUB — deterministic 256-sample float32 'waveform'."""
    h = hashlib.sha256(payload + b"a").digest()
    raw = np.frombuffer((h * 32)[: 256 * 4], dtype=np.uint8).astype(np.float32)
    return (raw - 127.5) / 127.5


DECODERS = {"image": _fake_decode_image, "audio": _fake_decode_audio}

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(media: DataFrame, feature_dim: int = 16) -> DataFrame:
    """Decode (stubbed) → mean-pool features, Arrow-batched via
    mapInPandas; batch shape = (rows, payload bytes) in, fixed-dim float
    vectors out. Video falls back to frame-sampling the image decoder."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for ref, kind, payload in zip(pdf["media_ref"], pdf["kind"], pdf["payload"]):
                dec = DECODERS.get(kind, _fake_decode_image)
                arr = dec(bytes(payload))
                if arr.ndim == 3:  # image: H×W×C
                    h, w = arr.shape[:2]
                    flat = arr.astype(np.float32).ravel()
                else:  # audio: samples
                    h, w = 1, len(arr)
                    flat = arr.astype(np.float32)
                # mean-pool into feature_dim buckets
                pad = (-len(flat)) % feature_dim
                flat = np.pad(flat, (0, pad))
                feat = flat.reshape(feature_dim, -1).mean(axis=1)
                out.append((ref, kind, w, h, feat))
            yield pd.DataFrame(out, columns=["media_ref", "kind", "width", "height", "feature"])

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(media: DataFrame, size: tuple[int, int] = (4, 4)) -> DataFrame:
    """Nearest-neighbor resize of decoded images (numpy index grid — real
    logic; only the decode underneath is stubbed)."""
    th, tw = size
    schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType()),
            T.StructField("pixels", T.ArrayType(T.IntegerType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, kind, payload in zip(pdf["media_ref"], pdf["kind"], pdf["payload"]):
                if kind != "image":
                    continue
                img = _fake_decode_image(bytes(payload))
                h, w = img.shape[:2]
                yi = (np.arange(th) * h // th)[:, None]
                xi = (np.arange(tw) * w // tw)[None, :]
                rows.append((ref, img[yi, xi].ravel().astype(np.int32)))
            yield pd.DataFrame(rows, columns=["media_ref", "pixels"])

    return media.mapInPandas(run, schema)
