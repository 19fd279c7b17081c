"""Generate tests/fixtures/media.parquet: deterministic media payloads
with GROUND-TRUTH columns computed from the SOURCE arrays (pre-encode),
so the DuckDB oracle can value-check Spark-side byte parsing/decoding
without itself needing a codec.

Columns:
  doc_id            long
  payload           binary   (real PNG / crafted JPEG-GIF headers / real WAV)
  true_mime         string
  true_width        int      (NULL for audio)
  true_height       int      (NULL for audio)
  true_duration_ms  long     (NULL for images)
  feat_check        boolean  (rows whose feature mean is oracle-checkable:
                              solid grayscale PNGs and PCM16 WAVs)
  true_feat_mean    double   (float64 mean of the 16 expected features,
                              computed from the source array, NULL unless
                              feat_check)

Run:  python tests/fixtures/gen_media.py
Deterministic (fixed seed, no timestamps) — the parquet is committed.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from frames_map_reduce_spark.functions.media import (  # noqa: E402
    _DCT, JPEG_QL, WAV_FMT_ALAW, WAV_FMT_ULAW, avi_encode_mjpeg,
    g711_decode, g711_encode, gif_encode_gray, jpeg_encode_gray,
    jpeg_encode_gray_progressive, mp4_encode_stub, png_encode,
    wav_encode_g711)

OUT = os.path.join(os.path.dirname(__file__), "media.parquet")


def make_jpeg(width: int, height: int) -> bytes:
    """Minimal JPEG: SOI + SOF0 frame header + EOI.  Not decodable (no
    scan data) but a spec-valid marker stream for dimension parsing."""
    sof = struct.pack(">HBHHB", 17, 8, height, width, 3)
    sof += bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    return b"\xff\xd8" + b"\xff\xc0" + sof + b"\xff\xd9"


def make_jpeg_real(rng: np.random.Generator, width: int,
                   height: int) -> tuple[bytes, float]:
    """Real baseline grayscale JPEG (this repo's own pure-numpy encoder)
    + the float64 ground-truth mean of the 16 pooled DC-luma features,
    computed from the SOURCE array through the quantization formula —
    pre-encode, so the oracle proves the Huffman+DC decode byte-level."""
    img = rng.integers(0, 256, size=(height, width), dtype=np.uint8)
    payload = jpeg_encode_gray(img)
    bh, bw = (height + 7) // 8 * 8, (width + 7) // 8 * 8
    pad = np.pad(img, ((0, bh - height), (0, bw - width)), mode="edge") \
        .astype(np.float64) - 128.0
    blocks = pad.reshape(bh // 8, 8, bw // 8, 8).transpose(0, 2, 1, 3)
    dc = (_DCT[None, None] @ blocks @ _DCT.T[None, None])[:, :, 0, 0]
    luma = np.clip(np.rint(dc / JPEG_QL[0, 0]) * JPEG_QL[0, 0] / 8.0 + 128.0,
                   0.0, 255.0)
    gh, gw = luma.shape
    ys = np.linspace(0, gh, 5).astype(int)
    xs = np.linspace(0, gw, 5).astype(int)
    feats = [luma[ys[i]:max(ys[i + 1], ys[i] + 1),
                  xs[j]:max(xs[j + 1], xs[j] + 1)].mean() / 255.0
             for i in range(4) for j in range(4)]
    return payload, float(np.mean(feats))


def make_jpeg_progressive(rng: np.random.Generator, width: int, height: int,
                          al: int) -> tuple[bytes, float]:
    """Real progressive grayscale JPEG (SOF2, initial DC scan with point
    transform ``al`` + one AC scan) + the pre-encode ground-truth pooled
    feature mean: the shifted quantization formula ((dc_q >> al) << al)."""
    img = rng.integers(0, 256, size=(height, width), dtype=np.uint8)
    payload = jpeg_encode_gray_progressive(img, al=al)
    bh, bw = (height + 7) // 8 * 8, (width + 7) // 8 * 8
    pad = np.pad(img, ((0, bh - height), (0, bw - width)), mode="edge") \
        .astype(np.float64) - 128.0
    blocks = pad.reshape(bh // 8, 8, bw // 8, 8).transpose(0, 2, 1, 3)
    dc = (_DCT[None, None] @ blocks @ _DCT.T[None, None])[:, :, 0, 0]
    q00 = JPEG_QL[0, 0]
    coded = (np.rint(dc / q00).astype(np.int64) >> al) << al
    luma = np.clip(coded.astype(np.float64) * q00 / 8.0 + 128.0, 0.0, 255.0)
    gh, gw = luma.shape
    ys = np.linspace(0, gh, 5).astype(int)
    xs = np.linspace(0, gw, 5).astype(int)
    feats = [luma[ys[i]:max(ys[i + 1], ys[i] + 1),
                  xs[j]:max(xs[j + 1], xs[j] + 1)].mean() / 255.0
             for i in range(4) for j in range(4)]
    return payload, float(np.mean(feats))


def make_gif(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00" + b"\x3b"


def make_wav(rng: np.random.Generator, rate: int, n_frames: int,
             amp: float) -> tuple[bytes, float]:
    """PCM16 mono WAV + float64 ground-truth mean of the 16 band-RMS
    features, computed from the SOURCE samples (np.linspace banding,
    same contract as wav_features but from pre-write data)."""
    t = np.arange(n_frames, dtype=np.float64)
    sig = amp * 32767.0 * np.sin(2 * np.pi * 440.0 * t / rate)
    sig += rng.normal(0, 300.0, n_frames)
    pcm = np.clip(sig, -32768, 32767).astype("<i2")

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())

    bounds = np.linspace(0, len(pcm), 17).astype(int)
    bands = [float(np.sqrt(np.mean(pcm[bounds[k]:max(bounds[k + 1], bounds[k] + 1)]
                                   .astype(np.float64) ** 2))) / 32768.0
             for k in range(16)]
    return buf.getvalue(), float(np.mean(bands))


def make_wav_g711(rng: np.random.Generator, rate: int, n_frames: int,
                  amp: float, fmt: int) -> tuple[bytes, float]:
    """G.711 companded WAV (mu-law or A-law) + ground-truth band-RMS of
    the DECODED (quantized) samples — what a correct expander must see."""
    t = np.arange(n_frames, dtype=np.float64)
    sig = amp * 32767.0 * np.sin(2 * np.pi * 330.0 * t / rate)
    sig += rng.normal(0, 250.0, n_frames)
    pcm = np.clip(sig, -32768, 32767).astype(np.int16)
    payload = wav_encode_g711(pcm, rate, fmt)
    dec = g711_decode(g711_encode(pcm, fmt), fmt)
    bounds = np.linspace(0, len(dec), 17).astype(int)
    bands = [float(np.sqrt(np.mean(dec[bounds[k]:max(bounds[k + 1], bounds[k] + 1)]
                                   .astype(np.float64) ** 2))) / 32768.0
             for k in range(16)]
    return payload, float(np.mean(bands))


def main() -> None:
    rng = np.random.default_rng(20260813)
    rows = []

    # Solid grayscale PNGs: feature mean is exactly float32(v/255).
    gray_vals = [16, 51, 102, 128, 160, 204, 240]
    sizes = [(8, 8), (16, 12), (32, 32), (24, 40), (64, 48), (48, 64), (96, 96)]
    did = 0
    for v, (w, h) in zip(gray_vals, sizes):
        img = np.full((h, w, 1), v, dtype=np.uint8)
        rows.append((did, png_encode(img), "image/png", w, h, None,
                     True, float(np.float32(float(v) / 255.0))))
        did += 1

    # RGB / RGBA / gradient PNGs: meta-checked, roundtrip-tested, but
    # feature mean not oracled (float32 pooling vs float64 truth drifts).
    for w, h, c in [(20, 14, 3), (33, 27, 3), (17, 17, 4), (40, 10, 4)]:
        img = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        rows.append((did, png_encode(img), "image/png", w, h, None, False, None))
        did += 1

    for w, h in [(640, 480), (1920, 1080), (31, 97), (12, 300)]:
        rows.append((did, make_jpeg(w, h), "image/jpeg", w, h, None, False, None))
        did += 1

    # Real baseline grayscale JPEGs (repo encoder, Annex K tables): the
    # DC-only decoder must reproduce the quantization-formula ground truth
    # exactly.  Sizes chosen to cover block-aligned, padded, and tiny.
    for w, h in [(64, 48), (56, 40), (17, 23), (8, 8), (129, 65)]:
        payload, feat_mean = make_jpeg_real(rng, w, h)
        rows.append((did, payload, "image/jpeg", w, h, None, True, feat_mean))
        did += 1

    # Real progressive grayscale JPEGs (SOF2): DC-scan decode must equal
    # the shifted quantization formula — covers Al=0 and Al>0.
    for (w, h), al in [((48, 32), 0), ((33, 29), 1)]:
        payload, feat_mean = make_jpeg_progressive(rng, w, h, al)
        rows.append((did, payload, "image/jpeg", w, h, None, True, feat_mean))
        did += 1

    for w, h in [(100, 50), (256, 256), (7, 9)]:
        rows.append((did, make_gif(w, h), "image/gif", w, h, None, False, None))
        did += 1

    # Real grayscale GIFs (repo LZW encoder, identity palette): lossless,
    # so the ground-truth feature mean is the exact float64 pooled mean of
    # the source array — the oracle proves the LZW decode bit-level.
    for w, h in [(48, 32), (21, 35), (8, 8)]:
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        # identity palette ⇒ R=G=B=v; replicate gif_features' weighted-sum
        # EXPRESSION (not the algebraic identity v*1.0) so float64
        # rounding matches bit-for-bit
        v = img.astype(np.float64)
        lum = v * 0.299 + v * 0.587 + v * 0.114
        ys = np.linspace(0, h, 5).astype(int)
        xs = np.linspace(0, w, 5).astype(int)
        feats = [lum[ys[i]:max(ys[i + 1], ys[i] + 1),
                     xs[j]:max(xs[j + 1], xs[j] + 1)].mean() / 255.0
                 for i in range(4) for j in range(4)]
        rows.append((did, gif_encode_gray(img), "image/gif", w, h, None,
                     True, float(np.mean(feats))))
        did += 1

    for rate, n_frames, amp in [(8000, 8000, 0.5), (16000, 4000, 0.25),
                                (44100, 22050, 0.8), (8000, 12345, 0.1)]:
        payload, feat_mean = make_wav(rng, rate, n_frames, amp)
        dur = n_frames * 1000 // rate
        rows.append((did, payload, "audio/wav", None, None, dur, True, feat_mean))
        did += 1

    # G.711 companded WAVs (format tags 7 = mu-law, 6 = A-law): the
    # expander must reproduce the decoded-sample band-RMS exactly.
    for rate, n_frames, amp, fmt in [(8000, 6000, 0.4, WAV_FMT_ULAW),
                                     (8000, 9000, 0.15, WAV_FMT_ALAW)]:
        payload, feat_mean = make_wav_g711(rng, rate, n_frames, amp, fmt)
        dur = n_frames * 1000 // rate
        rows.append((did, payload, "audio/wav", None, None, dur, True, feat_mean))
        did += 1

    # MP4 containers — metadata path only (ISO-BMFF box walk: tkhd dims,
    # mvhd duration); frame decode for MP4 is an honest non-goal (codec)
    for w, h, dur in [(640, 360, 2500), (1920, 1080, 61000)]:
        rows.append((did, mp4_encode_stub(w, h, dur), "video/mp4",
                     w, h, dur, False, None))
        did += 1

    table = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "payload": pa.array([r[1] for r in rows], pa.binary()),
        "true_mime": pa.array([r[2] for r in rows], pa.string()),
        "true_width": pa.array([r[3] for r in rows], pa.int32()),
        "true_height": pa.array([r[4] for r in rows], pa.int32()),
        "true_duration_ms": pa.array([r[5] for r in rows], pa.int64()),
        "feat_check": pa.array([r[6] for r in rows], pa.bool_()),
        "true_feat_mean": pa.array([r[7] for r in rows], pa.float64()),
    })
    pq.write_table(table, OUT, compression="snappy")
    print(f"wrote {OUT}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
