"""Pure-Python media parsing and (for PNG / WAV) real codecs.

No external codec library is available in this environment, but several
formats are tractable with the stdlib alone:

- **PNG**: container is length-prefixed chunks; pixel data is zlib
  (stdlib) over 5 simple per-row predictors.  We implement a real
  decoder/encoder for 8-bit gray / RGB / RGBA, non-interlaced — enough to
  make image decode / resize / feature-extraction REAL rather than
  stubbed.
- **WAV**: RIFF header math gives duration; PCM16 samples are just
  ``np.frombuffer`` — real audio decode.
- **JPEG / GIF**: full decode genuinely needs a DCT/LZW codec, but
  width/height live in fixed header structures — we parse dimensions.

These functions run inside Arrow-batched ``mapInPandas`` stages
(operators/multimodal.py); payload bytes never visit the driver.

Reference parity: the reference engine treats media as opaque blobs with
typed metadata; this module is part of the mandated LLM-pipeline
extension surface, not a reference port.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# PNG color type -> channel count (8-bit, non-palette only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


# ---------------------------------------------------------------------------
# Header / dimension parsing (PNG, JPEG, GIF, WAV)
# ---------------------------------------------------------------------------

def sniff_mime(b: bytes) -> str | None:
    """Identify a payload by magic bytes."""
    if b[:8] == PNG_SIG:
        return "image/png"
    if b[:2] == b"\xff\xd8":
        return "image/jpeg"
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return "image/gif"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "audio/wav"
    return None


def parse_dims(b: bytes) -> tuple[int, int] | None:
    """(width, height) from the header of a PNG / JPEG / GIF payload,
    without decoding pixel data.  None if unrecognized/corrupt."""
    try:
        if b[:8] == PNG_SIG:
            # First chunk must be IHDR: length(4) 'IHDR' width(4BE) height(4BE)
            if b[12:16] != b"IHDR":
                return None
            w, h = struct.unpack(">II", b[16:24])
            return (w, h)
        if b[:2] == b"\xff\xd8":
            return _jpeg_dims(b)
        if b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", b[6:10])
            return (w, h)
    except (struct.error, IndexError):
        return None
    return None


# JPEG SOFn markers that carry frame dimensions (not C4=DHT, C8=JPG, CC=DAC)
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _jpeg_dims(b: bytes) -> tuple[int, int] | None:
    """Walk JPEG marker segments to the first SOFn frame header."""
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:        # resync on stray bytes
            i += 1
            continue
        marker = b[i + 1]
        if marker == 0xFF:      # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2              # standalone markers, no length
            continue
        seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
        if marker in _JPEG_SOF:
            # segment: len(2) precision(1) height(2BE) width(2BE)
            h, w = struct.unpack(">HH", b[i + 5:i + 9])
            return (w, h)
        if marker == 0xDA:      # start of scan — no SOF found before data
            return None
        i += 2 + seg_len
    return None


def parse_wav_meta(b: bytes) -> dict | None:
    """RIFF/WAVE header math: sample rate, channels, duration.  No codec
    needed — duration is data-chunk bytes over byte rate."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i = 12
    fmt = None
    data_size = None
    try:
        while i + 8 <= len(b):
            cid, size = b[i:i + 4], struct.unpack("<I", b[i + 4:i + 8])[0]
            if cid == b"fmt ":
                (_audio_fmt, n_ch, rate, byte_rate,
                 _block, bits) = struct.unpack("<HHIIHH", b[i + 8:i + 24])
                fmt = {"channels": n_ch, "sample_rate": rate,
                       "byte_rate": byte_rate, "bits": bits}
            elif cid == b"data":
                data_size = size
            i += 8 + size + (size & 1)  # chunks are word-aligned
    except struct.error:
        return None
    if fmt is None or data_size is None or fmt["byte_rate"] == 0:
        return None
    fmt["duration_ms"] = data_size * 1000 // fmt["byte_rate"]
    fmt["data_size"] = data_size
    return fmt


# ---------------------------------------------------------------------------
# PNG decode (8-bit gray/gray+alpha/RGB/RGBA, non-interlaced)
# ---------------------------------------------------------------------------

def png_decode(b: bytes) -> np.ndarray:
    """Decode a PNG payload to a (H, W, C) uint8 array.

    Supports bit depth 8, color types 0/2/4/6, interlace 0 — the subset
    this engine's encoder produces and the common case for ML corpora
    normalized upstream.  Raises ValueError on unsupported variants.
    """
    if b[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    i = 8
    idat = []
    width = height = channels = None
    while i + 8 <= len(b):
        (length,) = struct.unpack(">I", b[i:i + 4])
        ctype = b[i + 4:i + 8]
        data = b[i + 8:i + 8 + length]
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8 or color not in _PNG_CHANNELS or interlace != 0:
                raise ValueError(
                    f"unsupported PNG variant: depth={depth} color={color} "
                    f"interlace={interlace}")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        i += 12 + length  # len + type + data + crc
    if width is None or not idat:
        raise ValueError("truncated PNG")
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row_off = y * (stride + 1)
        ftype = raw[row_off]
        row = np.frombuffer(raw, dtype=np.uint8,
                            count=stride, offset=row_off + 1).copy()
        out[y] = _png_unfilter_row(row, prev, ftype, channels)
        prev = out[y]
    return out.reshape(height, width, channels)


def _png_unfilter_row(row: np.ndarray, prev: np.ndarray, ftype: int,
                      bpp: int) -> np.ndarray:
    """Invert one PNG row predictor.  Sub/Paeth recur along the row, so
    those loop per byte — acceptable here (fixture-scale images; at corpus
    scale filter-0 rows from our own encoder vectorize to a no-op)."""
    if ftype == 0:
        return row
    if ftype == 2:                       # Up: vectorized
        return (row.astype(np.uint16) + prev).astype(np.uint8)
    out = row.astype(np.int32)
    pv = prev.astype(np.int32)
    if ftype == 1:                       # Sub
        for x in range(bpp, len(out)):
            out[x] = (out[x] + out[x - bpp]) & 0xFF
    elif ftype == 3:                     # Average
        for x in range(len(out)):
            left = out[x - bpp] if x >= bpp else 0
            out[x] = (out[x] + ((left + pv[x]) >> 1)) & 0xFF
    elif ftype == 4:                     # Paeth
        for x in range(len(out)):
            a = out[x - bpp] if x >= bpp else 0
            c = pv[x - bpp] if x >= bpp else 0
            p = a + pv[x] - c
            pa, pb, pc = abs(p - a), abs(p - pv[x]), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (pv[x] if pb <= pc else c)
            out[x] = (out[x] + pred) & 0xFF
    else:
        raise ValueError(f"bad PNG filter type {ftype}")
    return out.astype(np.uint8)


def png_encode(arr: np.ndarray) -> bytes:
    """Encode a (H, W) or (H, W, C) uint8 array as a PNG (filter 0,
    one IDAT).  Valid per the spec — any standard viewer decodes it."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6)) + chunk(b"IEND", b""))


def png_resize_nearest(b: bytes, width: int, height: int) -> bytes:
    """Decode → nearest-neighbor resample → re-encode.  Pure numpy
    index-gather; deterministic."""
    img = png_decode(b)
    h, w = img.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return png_encode(img[ys][:, xs])


def png_features(b: bytes, grid: int = 4) -> list[float]:
    """Deterministic real image features: mean-pool luminance over a
    ``grid``×``grid`` spatial grid, scaled to [0, 1].  Runs entirely in
    numpy; the shape (grid² floats) matches the stubbed fake path's
    contract of a fixed-dim vector per payload."""
    img = png_decode(b).astype(np.float32)
    if img.shape[2] >= 3:
        lum = img[:, :, 0] * 0.299 + img[:, :, 1] * 0.587 + img[:, :, 2] * 0.114
    else:
        lum = img[:, :, 0]
    h, w = lum.shape
    ys = np.linspace(0, h, grid + 1).astype(int)
    xs = np.linspace(0, w, grid + 1).astype(int)
    feats = [float(lum[ys[i]:max(ys[i + 1], ys[i] + 1),
                       xs[j]:max(xs[j + 1], xs[j] + 1)].mean()) / 255.0
             for i in range(grid) for j in range(grid)]
    return feats


def wav_features(b: bytes, n_bands: int = 16) -> list[float] | None:
    """Real audio features from PCM16 WAV: RMS energy over ``n_bands``
    equal time slices, normalized to [0, 1]."""
    meta = parse_wav_meta(b)
    if meta is None or meta["bits"] != 16:
        return None
    # data chunk payload: find it again (cheap; headers are tiny)
    i = 12
    while i + 8 <= len(b):
        cid, size = b[i:i + 4], struct.unpack("<I", b[i + 4:i + 8])[0]
        if cid == b"data":
            pcm = np.frombuffer(b, dtype="<i2", count=size // 2, offset=i + 8)
            break
        i += 8 + size + (size & 1)
    else:
        return None
    if len(pcm) == 0:
        return [0.0] * n_bands
    bounds = np.linspace(0, len(pcm), n_bands + 1).astype(int)
    out = []
    for k in range(n_bands):
        seg = pcm[bounds[k]:max(bounds[k + 1], bounds[k] + 1)].astype(np.float64)
        out.append(float(np.sqrt(np.mean(seg * seg))) / 32768.0)
    return out
