"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Design: media payloads are ``binary`` columns next to a metadata struct
(mime type, width/height/duration, byte length).  Decode / feature-extract
/ resize / frame-sample run as Arrow-batched ``mapInPandas`` stages — the
only sane shape at 100 TB: payload bytes never visit the driver, each
batch is decoded inside an executor, and the output schema is fixed up
front so downstream stages remain declarative.

The actual codec calls are STUBBED (the image/audio libraries are not in
this container): ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic hash-derived feature vector
stands in for real decoding.  The Spark-side plumbing — schema, batching,
partitioning, UDF signatures — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from frames_map_reduce_spark.schema import require_columns

MEDIA_META = T.StructType([
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
])


def attach_media_meta(df: DataFrame, binary_col: str, mime: str) -> DataFrame:
    """Derive the typed metadata struct for a binary payload column.
    Width/height/duration need decoding, so they are NULL here; n_bytes and
    mime are cheap and computed natively."""
    require_columns(df, [binary_col])
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(binary_col)).cast("long").alias("n_bytes"),
        ),
    )


FEATURE_DIM = 16
IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real image encoder: features derived
    from a hash of the FULL payload bytes.  Same bytes ⇒ same vector;
    any byte difference ⇒ a different vector."""
    import hashlib
    digest = hashlib.md5(bytes(payload)).digest()
    seed = int.from_bytes(digest[:8], "little", signed=False)
    rng = np.random.default_rng(seed % (2**63))
    return rng.standard_normal(dim).astype(np.float32).tolist()


def decode_image_features(df: DataFrame, id_col: str, binary_col: str,
                          fake: bool = False, batch_hint: int = 1024) -> DataFrame:
    """binary payload → feature vector via Arrow-batched mapInPandas.

    ``fake=False`` raises NotImplementedError at execution time (no codec
    libraries in this container); ``fake=True`` uses the deterministic
    hash-derived vector so the full pipeline (schema, batching, joins on
    features) is exercisable in tests.
    """
    require_columns(df, [id_col, binary_col])
    narrow = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("_payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decoding requires a codec library (e.g. Pillow); "
                    "not available in this environment — use fake=True for plumbing tests")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "feature": [_fake_features(p) for p in pdf["_payload"]],
            })

    return narrow.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def resize_images(df: DataFrame, id_col: str, binary_col: str,
                  width: int, height: int, fake: bool = False) -> DataFrame:
    """Resize stage: binary → binary with updated metadata.  Stubbed codec
    (fake path emits a deterministic truncated payload standing in for the
    re-encoded image); the schema/meta plumbing is real."""
    require_columns(df, [id_col, binary_col])
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_meta", MEDIA_META),
    ])
    narrow = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("_payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image resizing requires a codec library; use fake=True")
            payloads = [bytes(p)[: max(16, width * height // 64)] for p in pdf["_payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": payloads,
                "media_meta": [
                    {"mime": "image/png", "width": width, "height": height,
                     "duration_ms": None, "n_bytes": len(p)}
                    for p in payloads],
            })

    return narrow.mapInPandas(run, schema=schema)


def extract_audio_features(df: DataFrame, id_col: str, binary_col: str,
                           fake: bool = False) -> DataFrame:
    """Audio feature extraction stub (MFCC-shaped output): binary →
    array<float>, same mapInPandas plumbing as images."""
    require_columns(df, [id_col, binary_col])
    narrow = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("_payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real audio decoding requires a codec library; use fake=True")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "feature": [_fake_features(bytes(p) + b"audio") for p in pdf["_payload"]],
            })

    return narrow.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, id_col: str, binary_col: str,
                  every_ms: int = 1000, fake: bool = False) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.  Stubbed
    like decode_image_features; the fake path emits hash-derived frames at
    the requested cadence assuming a fixed fake duration."""
    require_columns(df, [id_col, binary_col])
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_feature", T.ArrayType(T.FloatType())),
    ])
    narrow = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("_payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real video decoding requires a codec library; use fake=True")
            rows = {"doc_id": [], "frame_idx": [], "frame_feature": []}
            for did, payload in zip(pdf["doc_id"], pdf["_payload"]):
                fake_duration_ms = 3000
                for idx in range(fake_duration_ms // every_ms):
                    rows["doc_id"].append(did)
                    rows["frame_idx"].append(idx)
                    rows["frame_feature"].append(
                        _fake_features(bytes(payload) + idx.to_bytes(4, "little")))
            yield pd.DataFrame(rows)

    return narrow.mapInPandas(run, schema=schema)
