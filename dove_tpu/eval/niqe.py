"""NIQE — Natural Image Quality Evaluator (no-reference), native NumPy.

The reference scores no-reference quality with pyiqa's ``niqe``
(/root/reference/eval_metrics.py:100-152). This is a from-scratch
implementation of Mittal et al., "Making a 'Completely Blind' Image Quality
Analyzer" (IEEE SPL 2013), following the MATLAB/pyiqa conventions:

  1. grayscale (BT.601 on [0,255]), MSCN coefficients via a 7x7 Gaussian
     (sigma = 7/6) local mean/deviation normalization;
  2. per 96x96 patch, 18 NSS features: an (A)GGD fit of the MSCN field
     (alpha, mean of left/right variance) + AGGD fits (alpha, mean, beta_l,
     beta_r) of the 4 orientation pairwise products (H, V, D1, D2);
  3. the same on a 0.5x MATLAB-bicubic downscale (48x48 patches) -> 36-dim
     feature per patch; patches below 0.75x of the peak local-sharpness are
     discarded (computed at scale 1);
  4. score = sqrt((mu_p - mu_d)^T [(Sigma_p + Sigma_d)/2]^-1 (mu_p - mu_d))
     against the pristine multivariate-Gaussian model.

The pristine model is a fitted artifact, not code — weights-gated like
LPIPS/DISTS: set ``DOVE_NIQE_PARAMS`` to a local ``.npz`` with ``mu`` [36]
and ``cov`` [36, 36] (export once from pyiqa:
``np.savez("niqe.npz", mu=pretrained_model["mu_pris_param"],
cov=pretrained_model["cov_pris_param"])``) or the original
``niqe_image_params.mat``.
"""

from __future__ import annotations

import math
import os

import cv2
import numpy as np

# --- (A)GGD moment-matching fits ------------------------------------------

_GAM = np.arange(0.2, 10.001, 0.001)
_GAMMA = np.vectorize(math.gamma)
_R_GAM = (_GAMMA(2.0 / _GAM) ** 2) / (_GAMMA(1.0 / _GAM) * _GAMMA(3.0 / _GAM))


def estimate_aggd(x: np.ndarray) -> tuple[float, float, float]:
    """Asymmetric GGD fit -> (alpha, beta_l, beta_r); standard estimator."""
    x = x.ravel()
    left = x[x < 0]
    right = x[x > 0]
    left_std = math.sqrt(np.mean(left**2)) if left.size else 0.0
    right_std = math.sqrt(np.mean(right**2)) if right.size else 0.0
    gammahat = left_std / right_std if right_std > 0 else np.inf
    m1 = np.mean(np.abs(x))
    m2 = np.mean(x**2)
    rhat = (m1**2 / m2) if m2 > 0 else np.inf
    rhatnorm = (
        rhat * (gammahat**3 + 1) * (gammahat + 1) / ((gammahat**2 + 1) ** 2)
        if np.isfinite(gammahat)
        else np.inf
    )
    alpha = _GAM[np.argmin((_R_GAM - rhatnorm) ** 2)]
    conv = math.sqrt(math.gamma(1.0 / alpha) / math.gamma(3.0 / alpha))
    return alpha, left_std * conv, right_std * conv


# --- MATLAB-convention bicubic 0.5x downscale ------------------------------

def _matlab_bicubic_half(img: np.ndarray) -> np.ndarray:
    """imresize(img, 0.5, 'bicubic') with antialiasing, per MATLAB semantics
    (cv2.resize INTER_CUBIC skips the antialias prefilter; NIQE's pristine
    model was fitted with MATLAB's, so match it)."""

    def cubic(t):
        a = np.abs(t)
        return np.where(
            a <= 1, 1.5 * a**3 - 2.5 * a**2 + 1,
            np.where(a < 2, -0.5 * a**3 + 2.5 * a**2 - 4 * a + 2, 0.0),
        )

    def weights(n_in: int):
        # MATLAB contributions() for scale=0.5, bicubic, antialiasing: the
        # kernel is stretched 1/scale=2x (support 8), P = ceil(8) + 2 taps.
        scale = 0.5
        n_out = int(np.ceil(n_in * scale))
        x = np.arange(1, n_out + 1, dtype=np.float64)   # 1-based output px
        u = x / scale + 0.5 * (1 - 1 / scale)           # center in input px
        left = np.floor(u - 4).astype(int)              # leftmost tap (1-based)
        idx = left[:, None] + np.arange(10)[None, :]    # [n_out, 10], 1-based
        w = scale * cubic(scale * (u[:, None] - idx))
        w /= w.sum(axis=1, keepdims=True)
        idx0 = np.clip(idx - 1, 0, n_in - 1)            # replicate boundary
        return idx0, w

    def along_axis(a, axis):
        idx, w = weights(a.shape[axis])
        moved = np.moveaxis(a, axis, 0)
        out = np.einsum("ok,ok...->o...", w, moved[idx])
        return np.moveaxis(out, 0, axis)

    return along_axis(along_axis(img.astype(np.float64), 0), 1)


# --- NSS feature extraction ------------------------------------------------

def _mscn(gray: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """-> (MSCN coefficients, local deviation field sigma)."""
    g = gray.astype(np.float64)
    mu = cv2.GaussianBlur(g, (7, 7), 7.0 / 6.0, borderType=cv2.BORDER_REPLICATE)
    sigma = cv2.GaussianBlur(g * g, (7, 7), 7.0 / 6.0,
                             borderType=cv2.BORDER_REPLICATE) - mu * mu
    sigma = np.sqrt(np.maximum(sigma, 0.0))
    return (g - mu) / (sigma + 1.0), sigma


def _patch_features(mscn: np.ndarray) -> list[float]:
    """18 NSS features of one MSCN patch."""
    alpha, bl, br = estimate_aggd(mscn)
    feats = [alpha, (bl + br) / 2.0]
    shifts = [(0, 1), (1, 0), (1, 1), (1, -1)]  # H, V, D1, D2
    for dy, dx in shifts:
        shifted = np.roll(np.roll(mscn, dy, axis=0), dx, axis=1)
        prod = mscn * shifted
        a, l, r = estimate_aggd(prod)
        mean = (r - l) * (math.gamma(2.0 / a) / math.gamma(1.0 / a))
        feats.extend([a, mean, l, r])
    return feats


def niqe_features(gray: np.ndarray, block: int = 96) -> np.ndarray:
    """[H, W] grayscale in [0, 255] -> [n_patches, 36] feature matrix."""
    h, w = gray.shape
    ny, nx = h // block, w // block
    if ny == 0 or nx == 0:
        raise ValueError(f"image {gray.shape} smaller than NIQE block {block}")
    gray = gray[: ny * block, : nx * block]

    mscn1, sigma = _mscn(gray)
    half = _matlab_bicubic_half(gray)
    mscn2, _ = _mscn(half)

    sharp = np.zeros((ny, nx))
    feats = []
    for by in range(ny):
        for bx in range(nx):
            p1 = mscn1[by * block : (by + 1) * block, bx * block : (bx + 1) * block]
            b2 = block // 2
            p2 = mscn2[by * b2 : (by + 1) * b2, bx * b2 : (bx + 1) * b2]
            feats.append(_patch_features(p1) + _patch_features(p2))
            sharp[by, bx] = sigma[
                by * block : (by + 1) * block, bx * block : (bx + 1) * block
            ].mean()

    feats = np.asarray(feats, np.float64)  # [ny*nx, 36]
    keep = (sharp > 0.75 * sharp.max()).ravel()
    if not keep.any():
        keep[:] = True
    return feats[keep]


def niqe_score(
    gray: np.ndarray, mu_pris: np.ndarray, cov_pris: np.ndarray
) -> float:
    """Score one grayscale [0,255] image against a pristine MVG model."""
    feats = niqe_features(gray)
    feats = feats[~np.isnan(feats).any(axis=1)]
    if feats.shape[0] == 0:
        return float("nan")
    mu_d = feats.mean(axis=0)
    cov_d = np.cov(feats, rowvar=False) if feats.shape[0] > 1 else np.zeros_like(cov_pris)
    diff = (mu_pris - mu_d)[None, :]
    inv = np.linalg.pinv((cov_pris + cov_d) / 2.0)
    return float(np.sqrt(max((diff @ inv @ diff.T).item(), 0.0)))


def load_niqe_params(path: str | None = None) -> tuple[np.ndarray, np.ndarray]:
    path = path or os.environ.get("DOVE_NIQE_PARAMS")
    if not path or not os.path.exists(path):
        raise NotImplementedError(
            "NIQE needs its fitted pristine-model parameters: set "
            "DOVE_NIQE_PARAMS to a .npz with mu [36] / cov [36,36] (export "
            "from pyiqa's niqe pretrained params) or the original "
            "niqe_image_params.mat"
        )
    if path.endswith(".mat"):
        from scipy.io import loadmat

        m = loadmat(path)
        return (
            np.asarray(m["mu_prisparam"], np.float64).ravel(),
            np.asarray(m["cov_prisparam"], np.float64),
        )
    z = np.load(path)
    return np.asarray(z["mu"], np.float64).ravel(), np.asarray(z["cov"], np.float64)


def _to_gray255(rgb01: np.ndarray) -> np.ndarray:
    """[H, W, 3] RGB in [0,1] -> BT.601 gray in [0,255] (MATLAB rgb2gray)."""
    r, g, b = rgb01[..., 0], rgb01[..., 1], rgb01[..., 2]
    return np.clip((0.299 * r + 0.587 * g + 0.114 * b) * 255.0, 0, 255)


def niqe_metric(params_path: str | None = None):
    """-> fn(pred [F, H, W, 3] in [0,1]) -> mean per-frame NIQE (lower is
    better). Matches the reference CLI's per-video averaging."""
    mu, cov = load_niqe_params(params_path)

    def fn(pred: np.ndarray) -> float:
        return float(np.mean([niqe_score(_to_gray255(f), mu, cov) for f in pred]))

    return fn
