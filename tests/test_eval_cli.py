"""eval_metrics CLI smoke: stem matching, resolution crop, JSON output."""

import json
import subprocess
import sys
from pathlib import Path

import cv2
import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _write_frames(root: Path, name: str, frames: np.ndarray) -> None:
    d = root / name
    d.mkdir(parents=True)
    for i, f in enumerate(frames):
        cv2.imwrite(str(d / f"{i:03d}.png"),
                    cv2.cvtColor((f * 255).astype(np.uint8), cv2.COLOR_RGB2BGR))


def test_eval_metrics_cli(tmp_path):
    rng = np.random.default_rng(0)
    gt = rng.random((3, 32, 40, 3)).astype(np.float32)
    noisy = np.clip(gt + rng.normal(0, 0.05, gt.shape), 0, 1).astype(np.float32)
    _write_frames(tmp_path / "gt", "clipA", gt)
    # prediction slightly larger: exercises the top-left resolution crop
    bigger = np.pad(noisy, ((0, 0), (0, 4), (0, 4), (0, 0)))
    _write_frames(tmp_path / "pred", "clipA", bigger)

    out_json = tmp_path / "metrics.json"
    res = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "eval_metrics.py"),
         "--pred_dir", str(tmp_path / "pred"),
         "--gt_dir", str(tmp_path / "gt"),
         "--metrics", "psnr,ssim",
         "--output", str(out_json)],
        capture_output=True, text=True, timeout=300,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"},
        cwd=str(REPO),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    data = json.loads(out_json.read_text())
    assert data["count"] == 1
    assert 15 < data["average"]["psnr"] < 40
    assert 0.3 < data["average"]["ssim"] <= 1.0
