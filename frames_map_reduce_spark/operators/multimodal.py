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

- REAL: metadata extraction (PNG/JPEG/GIF dimensions, WAV/AVI duration)
  via pure header parsing; PNG decode/encode/resize/features (zlib rows
  + predictor inversion); baseline-JPEG encode + DC-only decode
  (Huffman + dequantized DC → 8×-downsampled luma); GIF LZW
  encode/first-frame decode; WAV PCM16 features; MJPEG-AVI frame
  sampling (RIFF walk + per-frame JPEG DC decode).
- STUBBED: every other codec/container (``fake=True`` substitutes a
  deterministic hash-derived vector so the plumbing stays testable;
  without it those payloads raise ``NotImplementedError``).
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
                avi = (MEDIA.parse_avi_meta(b)
                       if mime == "video/x-msvideo" else None)
                mp4 = MEDIA.parse_mp4_meta(b) if mime == "video/mp4" else None
                if avi:
                    dims = (avi["width"], avi["height"])
                elif mp4 and "width" in mp4:
                    dims = (mp4["width"], mp4["height"])
                metas.append({
                    "mime": mime,
                    "width": dims[0] if dims else None,
                    "height": dims[1] if dims else None,
                    "duration_ms": (wav["duration_ms"] if wav
                                    else avi["duration_ms"] if avi
                                    else (mp4 or {}).get("duration_ms")),
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

    REAL for all three image formats this engine meets (pure
    stdlib/numpy, functions/media.py):

    - PNG: full decode (zlib + predictor inversion) → 4×4 mean-pooled
      luminance grid → 16 floats in [0, 1];
    - baseline JPEG: Huffman + DC-coefficient decode → 8×-downsampled
      luma map, pooled the same way (jpeg_dc_features);
    - GIF: LZW first-frame decode through the color table
      (gif_features).

    Unrecognized payloads raise ``NotImplementedError`` unless
    ``fake=True`` (deterministic hash-derived vector, plumbing-only).
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
                elif b[:6] in (b"GIF87a", b"GIF89a"):
                    feats.append(MEDIA.gif_features(b, grid=4))
                else:
                    raise NotImplementedError(
                        "real pixel decode implemented for PNG, baseline "
                        "JPEG, and GIF; use fake=True for other formats")
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return narrow.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


def resize_images(df: DataFrame, id_col: str, binary_col: str,
                  width: int, height: int, fake: bool = False) -> DataFrame:
    """Resize stage: binary → binary with updated metadata.

    REAL for all three image formats (functions/media.py
    ``image_thumbnail_png``): PNG full decode, GIF first-frame LZW
    decode, JPEG via its DC luma map (DCT-domain thumbnailing — the 8×
    reduction JPEG stores for free, grayscale); nearest-neighbor
    resample, re-encoded as PNG.  Unrecognized payloads raise unless
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
                elif (b[:8] == MEDIA.PNG_SIG or b[:2] == b"\xff\xd8"
                        or b[:6] in (b"GIF87a", b"GIF89a")):
                    payloads.append(MEDIA.image_thumbnail_png(b, width, height))
                else:
                    raise NotImplementedError(
                        "real resize implemented for PNG/JPEG/GIF; "
                        "use fake=True for other formats")
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

    REAL for PCM16 WAV (``np.frombuffer`` sample decode) AND for G.711
    mu-law/A-law WAV (format tags 7/6 — table-codec expansion, see
    functions/media.py g711_decode): band-wise RMS energy over 16 equal
    time slices.  Other compressed formats raise unless ``fake=True``."""
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
    """Video frame sampling: one output row per sampled frame.

    REAL for MJPEG AVI (functions/media.py): the RIFF container yields
    per-frame baseline JPEGs, sampled at the ``every_ms`` cadence
    (frame index = floor(t / frame_duration), deduplicated, so slow
    cadences skip frames and fast cadences don't repeat them) and
    featurized through the DC-only JPEG decoder.  ``frame_idx`` is the
    SOURCE frame index.  Other containers raise ``NotImplementedError``
    unless ``fake=True`` (hash-derived frames at the cadence over a fixed
    3 s fake duration, plumbing-only)."""
    require_columns(df, [id_col, binary_col])
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_feature", T.ArrayType(T.FloatType())),
    ])
    narrow = df.select(F.col(id_col).alias("doc_id"), F.col(binary_col).alias("_payload"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_feature": []}
            for did, payload in zip(pdf["doc_id"], pdf["_payload"]):
                b = bytes(payload)
                if fake:
                    fake_duration_ms = 3000
                    for idx in range(fake_duration_ms // every_ms):
                        rows["doc_id"].append(did)
                        rows["frame_idx"].append(idx)
                        rows["frame_feature"].append(
                            _fake_features(b + idx.to_bytes(4, "little")))
                    continue
                meta = MEDIA.parse_avi_meta(b)
                if meta is None:
                    raise NotImplementedError(
                        "real video decoding implemented for MJPEG AVI; "
                        "use fake=True for other containers")
                frames = list(MEDIA.avi_mjpeg_frames(b))
                if meta["usec_per_frame"] <= 0:
                    raise ValueError(
                        "AVI without fixed frame rate "
                        "(dwMicroSecPerFrame <= 0): cannot time-sample")
                frame_ms = meta["usec_per_frame"] / 1000.0
                wanted = []
                t = 0.0
                while t < meta["duration_ms"]:
                    idx = int(t // frame_ms)
                    if idx < len(frames) and (not wanted or wanted[-1] != idx):
                        wanted.append(idx)
                    t += every_ms
                for idx in wanted:
                    rows["doc_id"].append(did)
                    rows["frame_idx"].append(idx)
                    rows["frame_feature"].append(
                        MEDIA.jpeg_dc_features(frames[idx], grid=4))
            yield pd.DataFrame(rows)

    return narrow.mapInPandas(run, schema=schema)
