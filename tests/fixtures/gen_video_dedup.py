"""Generate tests/fixtures/video_dedup.parquet (+ _truth): deterministic
MJPEG-AVI payloads in near-dup clusters with GROUND-TRUTH per-frame
aHash bands computed from the SOURCE frame arrays (pre-encode) — the
gen_image_dedup.py convention lifted to video (every MJPEG frame is a
standalone baseline JPEG, so the frame truth replays the DC
quantization formula exactly like the image fixture's JPEG rows).

Files:
  video_dedup.parquet        doc_id, payload, true_fmt, n_frames
  video_dedup_truth.parquet  doc_id, frame_idx, true_b0..true_b3 (INT)

Clusters by construction: an exact byte copy (all frames match at
Hamming 0), a 2-frames-perturbed copy, a frame-subset re-edit (partial
match), a second cluster pair, and distinct random videos matching
nothing.

Run:  python tests/fixtures/gen_video_dedup.py
Deterministic (fixed seed, no timestamps) — both parquets are committed.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from frames_map_reduce_spark.functions.media import (  # noqa: E402
    _DCT, JPEG_QL, ahash_bands, avi_encode_mjpeg)
from tests.fixtures.gen_image_dedup import (  # noqa: E402
    GRID, N_BANDS, perturb_cells)

OUT = os.path.join(os.path.dirname(__file__), "video_dedup.parquet")
OUT_TRUTH = os.path.join(os.path.dirname(__file__),
                         "video_dedup_truth.parquet")


def luma1000_jpeg_frame(src: np.ndarray) -> np.ndarray:
    """DC quantization formula from the SOURCE frame — what the
    per-frame jpeg_dc_luma decode must reproduce (gen_image_dedup's
    luma1000_jpeg, duplicated here so the video fixture is
    self-contained)."""
    h, w = src.shape
    bh, bw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    pad = np.pad(src, ((0, bh - h), (0, bw - w)), mode="edge") \
        .astype(np.float64) - 128.0
    blocks = pad.reshape(bh // 8, 8, bw // 8, 8).transpose(0, 2, 1, 3)
    dc = (_DCT[None, None] @ blocks @ _DCT.T[None, None])[:, :, 0, 0]
    q00 = JPEG_QL[0, 0]
    luma = np.clip(np.rint(dc / q00) * q00 / 8.0 + 128.0, 0.0, 255.0)
    return np.rint(luma * 1000.0).astype(np.int64)


def random_video(rng: np.random.Generator, n_frames: int,
                 h: int = 48, w: int = 64) -> list:
    """A deterministic 'walking' clip: each frame drifts from the last
    (realistic inter-frame correlation WITHIN a video, so consecutive
    frames of one video do not pair with each other as near-dups only
    when the drift crosses cell thresholds — the truth decides)."""
    base = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    frames = [base]
    for _ in range(n_frames - 1):
        nxt = np.clip(frames[-1].astype(np.int64)
                      + rng.integers(-60, 61, size=(h, w)), 0, 255) \
            .astype(np.uint8)
        frames.append(nxt)
    return frames


def main() -> None:
    rng = np.random.default_rng(20260817)
    vids, truth = [], []
    did = 0

    def add(frames: list, fmt: str) -> None:
        nonlocal did
        vids.append((did, avi_encode_mjpeg(frames, fps=10), fmt,
                     len(frames)))
        for k, f in enumerate(frames):
            b = ahash_bands(luma1000_jpeg_frame(f), grid=GRID,
                            n_bands=N_BANDS)
            truth.append((did, k, *b))
        did += 1

    # cluster V: base, exact copy, 2-frames-perturbed copy, re-edit
    v_base = random_video(rng, 6)
    add(v_base, "avi-base")                                   # 0
    add(list(v_base), "avi-copy")                             # 1
    pert = list(v_base)
    pert[1] = perturb_cells(pert[1], [(2, 2), (5, 6)], 45)
    pert[4] = perturb_cells(pert[4], [(0, 7)], -45)
    add(pert, "avi-perturbed")                                # 2
    reedit = v_base[2:6] + [random_video(rng, 1)[0]]
    add(reedit, "avi-reedit")                                 # 3

    # cluster W: base + perturbed copy
    w_base = random_video(rng, 4)
    add(w_base, "avi-base2")                                  # 4
    wpert = list(w_base)
    wpert[0] = perturb_cells(wpert[0], [(3, 3)], 40)
    add(wpert, "avi-perturbed2")                              # 5

    # distinct videos: match nothing
    for n in (5, 4, 6, 3):
        add(random_video(rng, n), "avi-rand")                 # 6..9

    pq.write_table(pa.table({
        "doc_id": pa.array([v[0] for v in vids], pa.int64()),
        "payload": pa.array([v[1] for v in vids], pa.binary()),
        "true_fmt": pa.array([v[2] for v in vids], pa.string()),
        "n_frames": pa.array([v[3] for v in vids], pa.int32()),
    }), OUT, compression="snappy")
    pq.write_table(pa.table({
        "doc_id": pa.array([t[0] for t in truth], pa.int64()),
        "frame_idx": pa.array([t[1] for t in truth], pa.int32()),
        "true_b0": pa.array([t[2] for t in truth], pa.int32()),
        "true_b1": pa.array([t[3] for t in truth], pa.int32()),
        "true_b2": pa.array([t[4] for t in truth], pa.int32()),
        "true_b3": pa.array([t[5] for t in truth], pa.int32()),
    }), OUT_TRUTH, compression="snappy")
    print(f"wrote {OUT}: {len(vids)} videos; "
          f"{OUT_TRUTH}: {len(truth)} frames")


if __name__ == "__main__":
    main()
