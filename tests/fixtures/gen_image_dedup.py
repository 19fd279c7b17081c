"""Generate tests/fixtures/image_dedup.parquet: deterministic image
payloads in near-dup clusters, with GROUND-TRUTH aHash band columns
computed from the SOURCE arrays (pre-encode), so the DuckDB oracle can
recompute the banded-Hamming pairing without a codec — the gen_media.py
convention applied to perceptual dedup (r11 verdict #4: dedup ×
multimodal).

Columns:
  doc_id    long
  payload   binary   (real PNG / grayscale GIF / baseline-JPEG bytes,
                      this repo's own encoders)
  true_fmt  string   (debug only)
  true_p0..true_p3  integer  (pHash truth — r13; same convention)
  true_b0..true_b3  integer  (the four 16-bit aHash band values of the
                      source-derived milli-luma plane: PNG/GIF are
                      lossless so the plane IS the source luma; JPEG's
                      plane is the DC quantization formula replayed
                      from the source DCT — pre-encode in every case,
                      so value parity proves the byte-level decode)

Clusters by construction: three solid PNGs (aHash all-zero -> a
Hamming-0 triangle and a degenerate shared bucket), exact-copy pairs
per format, small perturbations (a few pooling cells shifted +/-40
luma) at Hamming 1-3, and a dozen random images that pair with nothing
(64 random bits; P(<=3 differing) ~ 1e-14 per pair, frozen by the seed).

Run:  python tests/fixtures/gen_image_dedup.py
Deterministic (fixed seed, no timestamps) — the parquet is committed.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from frames_map_reduce_spark.functions.media import (  # noqa: E402
    _DCT, JPEG_QL, ahash_bands, gif_encode_gray, jpeg_encode_gray,
    phash_bands, png_encode)

OUT = os.path.join(os.path.dirname(__file__), "image_dedup.parquet")

GRID, N_BANDS = 8, 4


def luma1000_gray(src: np.ndarray) -> np.ndarray:
    return src.astype(np.int64) * 1000


def luma1000_rgb(src: np.ndarray) -> np.ndarray:
    s = src.astype(np.int64)
    return s[:, :, 0] * 299 + s[:, :, 1] * 587 + s[:, :, 2] * 114


def luma1000_jpeg(src: np.ndarray) -> np.ndarray:
    """The DC quantization formula from the SOURCE array — what a
    correct DC-only decode must reproduce (make_jpeg_real's math)."""
    h, w = src.shape
    bh, bw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    pad = np.pad(src, ((0, bh - h), (0, bw - w)), mode="edge") \
        .astype(np.float64) - 128.0
    blocks = pad.reshape(bh // 8, 8, bw // 8, 8).transpose(0, 2, 1, 3)
    dc = (_DCT[None, None] @ blocks @ _DCT.T[None, None])[:, :, 0, 0]
    q00 = JPEG_QL[0, 0]
    luma = np.clip(np.rint(dc / q00) * q00 / 8.0 + 128.0, 0.0, 255.0)
    return np.rint(luma * 1000.0).astype(np.int64)


def perturb_cells(img: np.ndarray, cells: list[tuple[int, int]],
                  delta: int) -> np.ndarray:
    """Shift every pixel of the named (i, j) pooling cells by ``delta``
    (clipped) — moves those cell means across the global-mean threshold
    while barely moving the threshold itself."""
    out = img.astype(np.int64)
    h, w = out.shape[0], out.shape[1]
    ys = np.linspace(0, h, GRID + 1).astype(int)
    xs = np.linspace(0, w, GRID + 1).astype(int)
    for i, j in cells:
        out[ys[i]:max(ys[i + 1], ys[i] + 1),
            xs[j]:max(xs[j + 1], xs[j] + 1)] += delta
    return np.clip(out, 0, 255).astype(np.uint8)


def main() -> None:
    rng = np.random.default_rng(20260816)
    rows = []
    did = 0

    def add(payload: bytes, fmt: str, lum: np.ndarray) -> None:
        nonlocal did
        b = ahash_bands(lum, grid=GRID, n_bands=N_BANDS)
        p = phash_bands(lum, grid=GRID, n_bands=N_BANDS)
        rows.append((did, payload, fmt, *b, *p))
        did += 1

    # --- solid PNGs: every cell mean == global mean -> all-zero hash,
    # a Hamming-0 triangle across different sizes/values
    for v, (w, h) in [(100, (16, 16)), (100, (16, 16)), (200, (20, 12))]:
        img = np.full((h, w, 1), v, dtype=np.uint8)
        add(png_encode(img), "png-solid", luma1000_gray(img[:, :, 0]))

    # --- grayscale PNG cluster: base, exact copy, 1-cell and 3-cell
    # perturbations
    base_a = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    for variant in [base_a, base_a,
                    perturb_cells(base_a, [(2, 3)], 40),
                    perturb_cells(base_a, [(0, 0), (4, 5), (7, 7)], -40)]:
        add(png_encode(variant[:, :, None]), "png-gray",
            luma1000_gray(variant))

    # --- RGB PNG pair: base + 2-cell perturbation on the green channel
    base_b = rng.integers(0, 256, size=(20, 24, 3), dtype=np.uint8)
    pert_b = base_b.copy()
    g = perturb_cells(base_b[:, :, 1], [(1, 1), (6, 2)], 35)
    pert_b[:, :, 1] = g
    for variant in [base_b, pert_b]:
        add(png_encode(variant), "png-rgb", luma1000_rgb(variant))

    # --- grayscale GIF cluster (identity palette -> lossless): base,
    # exact copy, 1-cell perturbation
    base_c = rng.integers(0, 256, size=(28, 40), dtype=np.uint8)
    for variant in [base_c, base_c, perturb_cells(base_c, [(5, 5)], 45)]:
        add(gif_encode_gray(variant), "gif-gray", luma1000_gray(variant))

    # --- baseline-JPEG cluster: base, one-block +30, three-block +50
    # (ground truth replays the DC quantization formula, so whatever the
    # quantizer absorbs is absorbed identically on both sides)
    base_d = rng.integers(0, 256, size=(48, 64), dtype=np.uint8)
    pert_d1 = base_d.astype(np.int64)
    pert_d1[8:16, 16:24] += 30
    pert_d1 = np.clip(pert_d1, 0, 255).astype(np.uint8)
    pert_d2 = base_d.astype(np.int64)
    for y, x in [(0, 0), (16, 32), (40, 48)]:
        pert_d2[y:y + 8, x:x + 8] += 50
    pert_d2 = np.clip(pert_d2, 0, 255).astype(np.uint8)
    for variant in [base_d, pert_d1, pert_d2]:
        add(jpeg_encode_gray(variant), "jpeg-gray", luma1000_jpeg(variant))

    # --- random distinct images: pair with nothing
    for _ in range(4):
        img = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
        add(png_encode(img[:, :, None]), "png-rand", luma1000_gray(img))
    for _ in range(3):
        img = rng.integers(0, 256, size=(18, 22, 3), dtype=np.uint8)
        add(png_encode(img), "png-rgb-rand", luma1000_rgb(img))
    for _ in range(2):
        img = rng.integers(0, 256, size=(16, 20), dtype=np.uint8)
        add(gif_encode_gray(img), "gif-rand", luma1000_gray(img))
    for _ in range(3):
        img = rng.integers(0, 256, size=(32, 40), dtype=np.uint8)
        add(jpeg_encode_gray(img), "jpeg-rand", luma1000_jpeg(img))

    # --- boxed re-encodes (r13, pHash truth rows): letterboxed /
    # pillarboxed copies of cluster bases.  Under aHash the bars shift
    # every cell (~19/64 bits — no pair); under pHash the uniform-border
    # trim recovers the frame EXACTLY (Hamming 0 with base + copy).
    lb = np.zeros((44, 32), dtype=np.uint8)
    lb[6:38] = base_a
    add(png_encode(lb[:, :, None]), "png-letterbox", luma1000_gray(lb))
    pb = np.full((28, 52), 17, dtype=np.uint8)
    pb[:, 6:46] = base_c
    add(gif_encode_gray(pb), "gif-pillarbox", luma1000_gray(pb))

    table = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "payload": pa.array([r[1] for r in rows], pa.binary()),
        "true_fmt": pa.array([r[2] for r in rows], pa.string()),
        "true_b0": pa.array([r[3] for r in rows], pa.int32()),
        "true_b1": pa.array([r[4] for r in rows], pa.int32()),
        "true_b2": pa.array([r[5] for r in rows], pa.int32()),
        "true_b3": pa.array([r[6] for r in rows], pa.int32()),
        "true_p0": pa.array([r[7] for r in rows], pa.int32()),
        "true_p1": pa.array([r[8] for r in rows], pa.int32()),
        "true_p2": pa.array([r[9] for r in rows], pa.int32()),
        "true_p3": pa.array([r[10] for r in rows], pa.int32()),
    })
    pq.write_table(table, OUT, compression="snappy")
    print(f"wrote {OUT}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
