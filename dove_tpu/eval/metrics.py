"""Quality metrics for VSR evaluation (reference: eval_metrics.py, SURVEY.md §2.5).

PSNR and SSIM are implemented natively (NumPy/JAX, matching the conventions the
reference gets from pyiqa: PSNR on RGB in [0,1]; SSIM on the Y channel with the
MATLAB 11x11 sigma-1.5 Gaussian window at uint8 range). Learned metrics
(LPIPS/DISTS/CLIP-IQA/...) need pretrained feature nets; they are exposed
behind the same interface and raise a clear error when their weights are not
available in the environment (no pyiqa / no downloads here).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

FULL_REFERENCE = ("psnr", "ssim", "lpips", "dists")


def _to_y(rgb: np.ndarray) -> np.ndarray:
    """[..., H, W, 3] RGB in [0,1] -> BT.601 luma in [0, 255]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return (65.481 * r + 128.553 * g + 24.966 * b) + 16.0


def psnr(pred: np.ndarray, gt: np.ndarray) -> float:
    """PSNR over RGB [0,1]; inputs [F, H, W, 3] (averaged per-frame)."""
    vals = []
    for p, g in zip(pred, gt):
        mse = np.mean((p.astype(np.float64) - g.astype(np.float64)) ** 2)
        vals.append(100.0 if mse == 0 else 10.0 * np.log10(1.0 / mse))
    return float(np.mean(vals))


def psnr_y(pred: np.ndarray, gt: np.ndarray) -> float:
    """PSNR on the BT.601 Y channel (range 0-255), averaged per frame."""
    vals = []
    for p, g in zip(pred, gt):
        mse = np.mean((_to_y(p) - _to_y(g)) ** 2)
        vals.append(100.0 if mse == 0 else 10.0 * np.log10(255.0**2 / mse))
    return float(np.mean(vals))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    ax = np.arange(size) - size // 2
    g = np.exp(-(ax**2) / (2 * sigma**2))
    k = np.outer(g, g)
    return k / k.sum()


def _filter2(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """'valid' 2D correlation via strided windows (small images, host-side)."""
    from numpy.lib.stride_tricks import sliding_window_view

    windows = sliding_window_view(img, kernel.shape)
    return np.einsum("ijkl,kl->ij", windows, kernel)


def ssim_single(pred_y: np.ndarray, gt_y: np.ndarray) -> float:
    """MATLAB-convention SSIM on luma images in [0, 255]."""
    k = _gaussian_kernel()
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    p = pred_y.astype(np.float64)
    g = gt_y.astype(np.float64)
    mu_p, mu_g = _filter2(p, k), _filter2(g, k)
    mu_p2, mu_g2, mu_pg = mu_p**2, mu_g**2, mu_p * mu_g
    sigma_p2 = _filter2(p * p, k) - mu_p2
    sigma_g2 = _filter2(g * g, k) - mu_g2
    sigma_pg = _filter2(p * g, k) - mu_pg
    ssim_map = ((2 * mu_pg + c1) * (2 * sigma_pg + c2)) / (
        (mu_p2 + mu_g2 + c1) * (sigma_p2 + sigma_g2 + c2)
    )
    return float(ssim_map.mean())


def ssim(pred: np.ndarray, gt: np.ndarray) -> float:
    """Mean per-frame SSIM on the Y channel; inputs [F, H, W, 3] in [0,1]."""
    return float(
        np.mean([ssim_single(_to_y(p), _to_y(g)) for p, g in zip(pred, gt)])
    )


def match_resolution(pred: np.ndarray, gt: np.ndarray, mode: str = "top-left"):
    """Crop both sequences to the common (F, H, W) (reference:
    eval_metrics.py:74-97 crops rather than resizes)."""
    F = min(pred.shape[0], gt.shape[0])
    H = min(pred.shape[1], gt.shape[1])
    W = min(pred.shape[2], gt.shape[2])
    def crop(x):
        if mode == "center":
            h0 = (x.shape[1] - H) // 2
            w0 = (x.shape[2] - W) // 2
        else:
            h0 = w0 = 0
        return x[:F, h0 : h0 + H, w0 : w0 + W]
    return crop(pred), crop(gt)


def get_metric(name: str) -> Callable:
    name = name.lower()
    if name == "psnr":
        return psnr
    if name == "ssim":
        return ssim
    if name == "lpips":
        from dove_tpu.eval.lpips import lpips_metric

        return lpips_metric()
    if name == "dists":
        from dove_tpu.eval.dists import dists_metric

        return dists_metric()
    if name == "clipiqa":
        from dove_tpu.eval.clip import clipiqa_metric

        return clipiqa_metric()
    if name == "niqe":
        from dove_tpu.eval.niqe import niqe_metric

        return niqe_metric()
    if name == "maniqa":
        from dove_tpu.eval.maniqa import maniqa_metric

        return maniqa_metric()
    if name == "musiq":
        from dove_tpu.eval.musiq import musiq_metric

        return musiq_metric()
    if name in ("ewarp", "e*warp", "warping_error"):
        import os

        path = os.environ.get("DOVE_RAFT_WEIGHTS")
        if not path or not os.path.exists(path):
            raise NotImplementedError(
                "E*warp needs RAFT weights: set DOVE_RAFT_WEIGHTS to a local "
                "raft-things.pth (the reference uses the same checkpoint)"
            )
        from dove_tpu.eval.ewarp import ewarp_clip
        from dove_tpu.models.raft import load_raft

        params = load_raft(path)
        return lambda pred: ewarp_clip(params, pred)
    # every supported metric is dispatched above — anything else is a typo,
    # and deferring the failure to call time (the old _unavailable path)
    # produced a misleading "needs weights" message for it
    raise ValueError(
        f"unknown metric '{name}'; available: psnr, ssim, lpips, dists, "
        "clipiqa, niqe, maniqa, musiq, ewarp"
    )


class MetricAccumulator:
    """Per-sample metric bookkeeping + averaging, JSON-compatible with the
    reference's output schema ({per_sample, average, count})."""

    def __init__(self, names: list[str]):
        self.names = [n.lower() for n in names]
        self._fns = {n: get_metric(n) for n in self.names}
        self.per_sample: dict[str, list[float]] = {n: [] for n in self.names}
        self.sample_names: list[str] = []

    def add(self, name: str, pred: np.ndarray, gt: np.ndarray | None) -> dict:
        # compute EVERY metric before recording anything: a mid-loop
        # exception (e.g. gt=None for one sample, caught by the caller to
        # skip it) must not leave per_sample lists ragged vs count
        out = {}
        for metric in self.names:
            if metric in FULL_REFERENCE:
                if gt is None:
                    raise ValueError(f"metric {metric} needs --gt_dir")
                p, g = match_resolution(pred, gt)
                val = self._fns[metric](p, g)
            else:
                val = self._fns[metric](pred)
            out[metric] = float(val)
        self.sample_names.append(name)
        for metric, val in out.items():
            self.per_sample[metric].append(val)
        return out

    def summary(self) -> dict:
        avg = {
            n: (float(np.mean(v)) if v else float("nan"))
            for n, v in self.per_sample.items()
        }
        return {
            "per_sample": self.per_sample,
            "average": avg,
            "count": len(self.sample_names),
        }
