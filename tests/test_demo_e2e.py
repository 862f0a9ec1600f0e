"""End-to-end over the reference's REAL demo clips (slow lane).

The fast-lane CLI tests use synthetic cv2-written frames; this drives the
full product path on actual released LQ clips from
/root/reference/datasets/demo (real codec output, odd geometries), matching
the reference's own usage (inference_script.py:664-751):

  decode -> pad ((F-1)%8, H/W%16) -> x4 upscale -> tile/chunk -> one-step SR
  (tiny weights) -> stitch -> unpad -> write mp4 -> re-read

Asserts geometry preservation (frame count, x4 dims, odd-size unpadding),
writer round-trip, and the inline metric plumbing (--upscale 1 + --gt_dir,
the reference's RealVSR/MVSR4x recipe shape from inference.sh).
"""

from __future__ import annotations

import sys
from pathlib import Path

import cv2
import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
DEMO = Path("/root/reference/datasets/demo")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not DEMO.exists(), reason="reference demo clips absent"),
]


def _run_cli(argv):
    sys.path.insert(0, str(REPO / "scripts"))
    import importlib

    inference = importlib.import_module("inference")
    inference.main(argv)


def _probe(path):
    cap = cv2.VideoCapture(str(path))
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    ok, first = cap.read()
    cap.release()
    assert ok
    return n, w, h, first


def test_demo_clip_x4_geometry(tmp_path):
    """003.mp4 (256x128, 50 frames): default x4 chunked run, mp4 round trip."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "003.mp4").write_bytes((DEMO / "003.mp4").read_bytes())

    _run_cli([
        "--input_dir", str(in_dir),
        "--output_path", str(tmp_path / "out"),
        "--preset", "tiny",
        "--is_vae_st",
        "--chunk_len", "17", "--overlap_t", "8",
    ])
    out = tmp_path / "out" / "003.mp4"
    assert out.exists()
    n, w, h, first = _probe(out)
    assert (n, w, h) == (50, 256 * 4, 128 * 4)
    assert first.std() > 0  # non-degenerate frames survived the writer


def test_demo_clip_odd_dims_and_metrics(tmp_path):
    """007.mp4 (316x178, 33 frames): H/W not %16 -> pad+unpad must restore
    the exact original geometry; --upscale 1 with --gt_dir exercises the
    inline full-reference metric plumbing on real codec input (the
    reference's RealVSR recipe shape, inference.sh)."""
    import json

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    (in_dir / "007.mp4").write_bytes((DEMO / "007.mp4").read_bytes())

    _run_cli([
        "--input_dir", str(in_dir),
        "--output_path", str(tmp_path / "out"),
        "--preset", "tiny",
        "--is_vae_st",
        "--upscale", "1",
        "--gt_dir", str(in_dir),
        "--eval_metrics", "psnr,ssim",
        "--save_format", "lossless",
    ])
    outs = list((tmp_path / "out").glob("007.*"))
    assert outs, "no output written"
    n, w, h, _ = _probe(outs[0])
    assert (n, w, h) == (33, 316, 178)  # odd dims exactly restored
    metrics = json.loads(
        (tmp_path / "out" / "metrics_psnr_ssim.json").read_text())
    assert metrics["count"] == 1
    for name in ("psnr", "ssim"):
        assert len(metrics["per_sample"][name]) == 1
        assert np.isfinite(metrics["average"][name])
    # tiny random weights: output is far from the LQ input, but PSNR of two
    # same-size finite videos stays in a sane band
    assert 0.0 < metrics["average"]["psnr"] < 60.0
