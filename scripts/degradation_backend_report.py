#!/usr/bin/env python
"""Quantify the video-compression degradation gap: PyAV ladder vs cv2 fallback.

The reference's training degradations include an in-memory PyAV mp4 round
trip over {libx264, h264, mpeg4} x a 1e4-1e5 bitrate ladder
(/root/reference/finetune/datasets/degradation.py:478-558). In environments
without PyAV, dove_tpu's RandomVideoCompression uses a cv2 mp4v temp-file
fallback — a real MPEG-4 Part 2 encode (this cv2 build is FFmpeg-backed),
but with NO working rate control: VIDEOWRITER_PROP_QUALITY and
OPENCV_FFMPEG_WRITER_OPTIONS are both ignored (measured: byte-identical
output), so the fallback is a single operating point instead of a ladder,
and the libx264/h264 artifact families are absent entirely.

This script measures the artifact statistics of every backend available on
the machine it runs on and merges them into one JSON report:

    python scripts/degradation_backend_report.py \
        [--out docs/reports/DEGRADATION_BACKEND.json]

Run it here to record the cv2-fallback rows; run it again on a machine with
PyAV to add the reference-ladder rows to the same file (rows merge by key).

Per (backend, codec, bitrate) row:
  * psnr_db        vs the uncompressed source clip
  * dct_low/mid/high  8x8 luma block-DCT energy fraction by radial band
                      (low: u+v<=2, mid: 3..7, high: >=8) — MPEG quantization
                      drains high-band energy first
  * blockiness     mean |gradient| across 8-pixel block boundaries divided
                   by mean |gradient| inside blocks (1.0 = no block seams)
  * bytes          encoded size (rate-control sanity check)
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dove_tpu.data.degradation import RandomVideoCompression, _have_av  # noqa: E402


def make_clip(frames: int = 16, size: int = 128) -> np.ndarray:
    """Structured synthetic clip: gradients + texture + edges + motion.

    Pure noise is incompressible and pure gradients trivially compressible;
    a mix exercises the quantizer the way natural video does."""
    rng = np.random.default_rng(20260819)
    F, H, W = frames, size, size
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    base = 0.5 + 0.4 * np.sin(xx / 9.0) * np.cos(yy / 13.0)
    checker = ((xx // 8 + yy // 8) % 2).astype(np.float32) * 0.25
    texture = rng.random((H, W)).astype(np.float32) * 0.15
    clip = np.empty((F, H, W, 3), np.float32)
    for f in range(F):
        shifted = np.roll(base + checker + texture, f * 3, axis=1)
        clip[f, ..., 0] = shifted
        clip[f, ..., 1] = np.roll(shifted, f, axis=0)
        clip[f, ..., 2] = 1.0 - shifted * 0.8
    return np.clip(clip, 0.0, 1.0)


def _luma(clip: np.ndarray) -> np.ndarray:
    return (0.299 * clip[..., 0] + 0.587 * clip[..., 1]
            + 0.114 * clip[..., 2])


def _dct2_8x8(blocks: np.ndarray) -> np.ndarray:
    """DCT-II over the last two (8, 8) axes (orthonormal)."""
    n = 8
    k = np.arange(n)
    basis = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    basis *= np.sqrt(2.0 / n)
    basis[0] /= np.sqrt(2.0)
    return np.einsum("ui,...ij,vj->...uv", basis, blocks, basis)


def dct_band_energy(clip: np.ndarray) -> dict[str, float]:
    """8x8 block-DCT energy fraction by radial frequency band (luma)."""
    y = _luma(clip)
    F, H, W = y.shape
    H8, W8 = H // 8 * 8, W // 8 * 8
    blocks = y[:, :H8, :W8].reshape(F, H8 // 8, 8, W8 // 8, 8)
    blocks = blocks.transpose(0, 1, 3, 2, 4)
    coef = _dct2_8x8(blocks - blocks.mean(axis=(-2, -1), keepdims=True))
    energy = coef ** 2
    u, v = np.mgrid[0:8, 0:8]
    radial = u + v
    total = float(energy.sum()) or 1.0
    return {
        "dct_low": float(energy[..., radial <= 2].sum() / total),
        "dct_mid": float(energy[..., (radial > 2) & (radial < 8)].sum() / total),
        "dct_high": float(energy[..., radial >= 8].sum() / total),
    }


def blockiness(clip: np.ndarray) -> float:
    """|gradient| across 8-px block boundaries / |gradient| inside blocks."""
    y = _luma(clip)
    dx = np.abs(np.diff(y, axis=2))  # [F, H, W-1]; dx[..., j] = col j -> j+1
    cols = np.arange(dx.shape[2])
    at_boundary = (cols % 8) == 7
    inside = ~at_boundary
    return float(dx[..., at_boundary].mean() / max(dx[..., inside].mean(), 1e-6))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a - b) ** 2))
    return 99.0 if mse == 0 else 10.0 * np.log10(1.0 / mse)


def measure(clip: np.ndarray, out: np.ndarray, nbytes: int | None) -> dict:
    row = {"psnr_db": round(psnr(clip, out), 2),
           "blockiness": round(blockiness(out), 4)}
    row.update({k: round(v, 4) for k, v in dct_band_energy(out).items()})
    if nbytes is not None:
        row["bytes"] = nbytes
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(
        Path(__file__).resolve().parent.parent
        / "docs" / "reports" / "DEGRADATION_BACKEND.json"))
    args = ap.parse_args()

    clip = make_clip()
    op = RandomVideoCompression({
        "codec": ["mpeg4"], "codec_prob": [1.0], "bitrate": [1e4, 1e5]})

    rows: dict[str, dict] = {"source": measure(clip, clip, None)}

    # cv2 fallback: single operating point (rate control measured inert)
    out = op._cv2_roundtrip(clip, bitrate=50_000)
    rows["cv2-mp4v-fallback"] = measure(clip, out, None)

    # rate-targeted MJPEG fallback: the in-env ladder (VERDICT r4 item 7).
    # These are the rate-controlled rows this environment CAN produce —
    # real DCT rate control sweeping the same bitrate axis as the
    # reference recipe; intra-only, so inter-frame artifacts are absent
    # (see meta note for why no ffmpeg-family encoder is reachable here).
    # 1e4/1e5 are the recipe's endpoints (they FLOOR at this probe-clip
    # size: even q=2 exceeds the byte budget — real encoders bottom out the
    # same way); the higher points show the controlled ladder actually
    # sweeping. "bytes" is the achieved size vs target_bytes = bitrate/8 *
    # F/fps (= bitrate * 0.08 here).
    for bitrate in (10_000, 100_000, 300_000, 1_000_000, 3_000_000):
        out, nbytes = op._mjpeg_roundtrip(clip, bitrate, return_bytes=True)
        rows[f"cv2-rate-mjpeg-{bitrate}"] = measure(clip, out, nbytes)

    if _have_av():
        for codec in ("libx264", "h264", "mpeg4"):
            for bitrate in (10_000, 50_000, 100_000):
                try:
                    out = op._av_roundtrip(clip, codec, bitrate)
                except Exception as e:  # codec missing in this ffmpeg build
                    rows[f"pyav-{codec}-{bitrate}"] = {"error": str(e)}
                    continue
                rows[f"pyav-{codec}-{bitrate}"] = measure(clip, out, None)

    out_path = Path(args.out)
    merged = {}
    if out_path.exists():
        merged = json.loads(out_path.read_text())
    merged["meta"] = {
        "clip": "make_clip(16, 128) seed 20260819",
        "note": ("merge-friendly: re-run on a PyAV machine to add the "
                 "reference-ladder rows; cv2 rows measured where PyAV is "
                 "absent. Rate-control probes on this cv2 build: "
                 "VIDEOWRITER_PROP_QUALITY set() returns False, passing it "
                 "via the params list fails VideoWriter open, and "
                 "OPENCV_FFMPEG_WRITER_OPTIONS is ignored (byte-identical "
                 "outputs) — the mp4v fallback has no bitrate ladder. "
                 "No other encoder is reachable in-env (probed 2026-08-20): "
                 "fourccs avc1/h264/x264 fail to open (no libx264 in this "
                 "OpenCV's ffmpeg), PyAV and imageio-ffmpeg are not "
                 "installed, and no ffmpeg binary exists on disk. The "
                 "cv2-rate-mjpeg rows are the rate-CONTROLLED ladder this "
                 "env can produce (binary-searched clip-global JPEG "
                 "quality; intra-only)."),
    }
    merged.setdefault("rows", {}).update(rows)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(merged, indent=2) + "\n")
    print(json.dumps(rows, indent=2))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
