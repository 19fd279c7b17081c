"""Generate tests/fixtures/audio_dedup.parquet: deterministic WAV
payloads in near-dup clusters with GROUND-TRUTH aHash band columns
computed from the SOURCE samples (pre-encode) — the gen_image_dedup.py
convention for audio.  The interesting clusters are CROSS-CODEC: the
same track as PCM16 and as G.711 mu-law/A-law companded copies (zero
byte overlap, tiny energy perturbation), plus gain-scaled and noised
copies (aHash loudness invariance), plus distinct tracks matching
nothing.

Columns: doc_id, payload, true_fmt, true_b0..true_b3 (INTEGER).
For PCM16 the truth samples ARE the written samples (lossless); for
G.711 the truth replays decode(encode(samples)) — what a correct
expander must produce.

Run:  python tests/fixtures/gen_audio_dedup.py
Deterministic (fixed seed, no timestamps) — the parquet is committed.
"""

from __future__ import annotations

import io
import os
import sys
import wave

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from frames_map_reduce_spark.functions.media import (  # noqa: E402
    WAV_FMT_ALAW, WAV_FMT_ULAW, ahash_bands, audio_energy_grid,
    g711_decode, g711_encode, wav_encode_g711)

OUT = os.path.join(os.path.dirname(__file__), "audio_dedup.parquet")
GRID, N_BANDS = 8, 4
RATE = 8000


def pcm16_wav(pcm: np.ndarray) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(RATE)
        w.writeframes(pcm.astype("<i2").tobytes())
    return buf.getvalue()


def track(rng: np.random.Generator, n: int, freqs, amps) -> np.ndarray:
    """A deterministic multi-tone 'melody' under a RANDOM piecewise
    amplitude envelope (32 interpolated control points drawn per
    track) — the envelope is what the energy fingerprint measures, so
    distinct tracks get ~independent 64-bit hashes while every copy /
    re-encode of the same track keeps its envelope.  (An early version
    gave all tracks ONE shared envelope: every pair collided at
    Hamming ≤ 3 — the fingerprint was working exactly as designed.)"""
    t = np.arange(n, dtype=np.float64)
    sig = np.zeros(n)
    for f, a in zip(freqs, amps):
        sig += a * 32767.0 * np.sin(2 * np.pi * f * t / RATE)
    ctrl = rng.uniform(0.05, 1.0, 32)
    env = np.interp(t, np.linspace(0, n - 1, 32), ctrl)
    sig = sig * env + rng.normal(0, 200.0, n)
    return np.clip(sig, -32768, 32767).astype(np.int16)


def main() -> None:
    rng = np.random.default_rng(20260818)
    rows = []
    did = 0

    def add(payload: bytes, fmt: str, truth_pcm: np.ndarray) -> None:
        nonlocal did
        b = ahash_bands(audio_energy_grid(truth_pcm, grid=GRID),
                        grid=GRID, n_bands=N_BANDS)
        rows.append((did, payload, fmt, *b))
        did += 1

    # cluster A: PCM16 base, exact copy, mu-law + A-law companded
    # copies, half-gain copy, lightly noised copy
    base = track(rng, 12000, [440.0, 880.0], [0.3, 0.15])
    add(pcm16_wav(base), "pcm16-base", base)                       # 0
    add(pcm16_wav(base), "pcm16-copy", base)                       # 1
    for fmt, name in [(WAV_FMT_ULAW, "ulaw-copy"),
                      (WAV_FMT_ALAW, "alaw-copy")]:
        add(wav_encode_g711(base, RATE, fmt), name,
            g711_decode(g711_encode(base, fmt), fmt))              # 2, 3
    half = (base.astype(np.int64) // 2).astype(np.int16)
    add(pcm16_wav(half), "pcm16-halfgain", half)                   # 4
    noised = np.clip(base.astype(np.int64)
                     + rng.integers(-150, 151, len(base)),
                     -32768, 32767).astype(np.int16)
    add(pcm16_wav(noised), "pcm16-noised", noised)                 # 5
    # window-level edit: boost two of the 64 energy windows — flips
    # only the bits whose windows cross the track mean (a small
    # NONZERO Hamming partner, unlike the invariant copies above)
    jit = base.astype(np.int64)
    n = len(jit)
    b64 = np.linspace(0, n, 65).astype(int)
    for w in (10, 43):
        jit[b64[w]:b64[w + 1]] = jit[b64[w]:b64[w + 1]] * 2
    jit = np.clip(jit, -32768, 32767).astype(np.int16)
    add(pcm16_wav(jit), "pcm16-jitter", jit)                       # 6

    # cluster B: a different melody, PCM16 + mu-law copy
    b2 = track(rng, 9000, [330.0, 660.0, 990.0], [0.25, 0.1, 0.05])
    add(pcm16_wav(b2), "pcm16-base2", b2)                          # 7
    add(wav_encode_g711(b2, RATE, WAV_FMT_ULAW), "ulaw-copy2",
        g711_decode(g711_encode(b2, WAV_FMT_ULAW), WAV_FMT_ULAW))  # 8

    # distinct tracks: different envelopes/tones, match nothing
    for k in range(6):
        n = 8000 + 1000 * k
        d = track(rng, n,
                  [200.0 + 97.0 * k, 500.0 + 131.0 * k],
                  [0.2 + 0.05 * k, 0.1])
        add(pcm16_wav(d), f"pcm16-rand{k}", d)                     # 9..14

    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "payload": pa.array([r[1] for r in rows], pa.binary()),
        "true_fmt": pa.array([r[2] for r in rows], pa.string()),
        "true_b0": pa.array([r[3] for r in rows], pa.int32()),
        "true_b1": pa.array([r[4] for r in rows], pa.int32()),
        "true_b2": pa.array([r[5] for r in rows], pa.int32()),
        "true_b3": pa.array([r[6] for r in rows], pa.int32()),
    }), OUT, compression="snappy")
    print(f"wrote {OUT}: {len(rows)} rows")


if __name__ == "__main__":
    main()
