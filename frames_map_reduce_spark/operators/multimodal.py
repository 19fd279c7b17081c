"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

Design: media payloads are ``binary`` columns next to a metadata struct
(mime type, width/height/duration, byte length).  Decode / feature-extract
/ resize / frame-sample run as Arrow-batched ``mapInPandas`` stages — the
only sane shape at 100 TB: payload bytes never visit the driver, each
batch is decoded inside an executor, and the output schema is fixed up
front so downstream stages remain declarative.

Codec status (no Pillow/libsndfile in this container, so everything here
is stdlib + numpy — see functions/media.py):

- REAL: metadata extraction (PNG/JPEG/GIF dimensions, WAV duration) via
  pure header parsing; PNG decode/encode/resize/feature-extraction
  (zlib rows + predictor inversion); WAV PCM16 feature extraction.
- STUBBED: JPEG/GIF pixel decode and video frame sampling (need a
  DCT/LZW/container codec) — those paths raise ``NotImplementedError``
  unless ``fake=True``, in which case a deterministic hash-derived
  vector stands in so the plumbing stays testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from frames_map_reduce_spark.functions import media as MEDIA
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


MEDIA_META_FIELDS = [f.name for f in MEDIA_META.fields]


def extract_media_meta(df: DataFrame, id_col: str, binary_col: str,
                       batch_hint: int = 1024) -> DataFrame:
    """REAL metadata extraction: (id, media_meta struct) per payload.

    Sniffs the format by magic bytes and parses dimensions (PNG IHDR,
    JPEG SOFn walk, GIF screen descriptor) and WAV duration from headers
    only — no pixel/sample decode, so cost is O(header) per row no matter
    the payload size.  Arrow-batched ``mapInPandas``: bytes stay on
    executors, and the structural plan node is safe under AQE
    re-optimization (see spark-graft gotchas on PythonUDF collapse).
    """
    require_columns(df, [id_col, binary_col])
    narrow = df.select(F.col(id_col).alias("doc_id"),
                       F.col(binary_col).alias("_payload"))
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_meta", MEDIA_META),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for p in pdf["_payload"]:
                b = bytes(p)
                mime = MEDIA.sniff_mime(b)
                dims = MEDIA.parse_dims(b) if (mime or "").startswith("image/") else None
                wav = MEDIA.parse_wav_meta(b) if mime == "audio/wav" else None
                metas.append({
                    "mime": mime,
                    "width": dims[0] if dims else None,
                    "height": dims[1] if dims else None,
                    "duration_ms": wav["duration_ms"] if wav else None,
                    "n_bytes": len(b),
                })
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media_meta": metas})

    return narrow.mapInPandas(run, schema=schema)


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

    REAL for PNG payloads (functions/media.py png_decode → 4×4
    mean-pooled luminance grid → 16 floats in [0, 1]) and for baseline
    JPEG (pure-numpy Huffman + DC-coefficient decode → 8×-downsampled
    luma map, pooled the same way — media.py jpeg_dc_features).  GIF
    pixel decode needs an LZW codec, so it raises
    ``NotImplementedError`` unless ``fake=True`` (deterministic
    hash-derived vector, plumbing-only).
    """
    require_columns(df, [id_col, binary_col])
    narrow = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("_payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["_payload"]:
                b = bytes(p)
                if fake:
                    feats.append(_fake_features(b))
                elif b[:8] == MEDIA.PNG_SIG:
                    feats.append(MEDIA.png_features(b, grid=4))
                elif b[:2] == b"\xff\xd8":
                    feats.append(MEDIA.jpeg_dc_features(b, grid=4))
                else:
                    raise NotImplementedError(
                        "real pixel decode implemented for PNG and baseline "
                        "JPEG (pure stdlib/numpy); GIF needs an LZW codec — "
                        "use fake=True for plumbing tests")
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return narrow.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def resize_images(df: DataFrame, id_col: str, binary_col: str,
                  width: int, height: int, fake: bool = False) -> DataFrame:
    """Resize stage: binary → binary with updated metadata.

    REAL for PNG: decode → nearest-neighbor resample → re-encode (pure
    numpy index-gather; functions/media.py).  Other formats raise unless
    ``fake=True`` (deterministic truncated payload stand-in)."""
    require_columns(df, [id_col, binary_col])
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_meta", MEDIA_META),
    ])
    narrow = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("_payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for p in pdf["_payload"]:
                b = bytes(p)
                if fake:
                    payloads.append(b[: max(16, width * height // 64)])
                elif b[:8] == MEDIA.PNG_SIG:
                    payloads.append(MEDIA.png_resize_nearest(b, width, height))
                else:
                    raise NotImplementedError(
                        "real resize implemented for PNG only; use fake=True")
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
    """Audio feature extraction: binary → array<float> (16 bands), same
    mapInPandas plumbing as images.

    REAL for PCM16 WAV: band-wise RMS energy over 16 equal time slices
    (functions/media.py wav_features — ``np.frombuffer`` sample decode,
    no codec needed).  Compressed formats raise unless ``fake=True``."""
    require_columns(df, [id_col, binary_col])
    narrow = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("_payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["_payload"]:
                b = bytes(p)
                if fake:
                    feats.append(_fake_features(b + b"audio"))
                else:
                    real = MEDIA.wav_features(b, n_bands=FEATURE_DIM)
                    if real is None:
                        raise NotImplementedError(
                            "real audio decode implemented for PCM16 WAV only; "
                            "use fake=True for other formats")
                    feats.append(real)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

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
