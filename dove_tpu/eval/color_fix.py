"""Color correction utilities: AdaIN and wavelet color transfer.

Capability parity with the reference's standalone color-fix tool
(/root/reference/finetune/scripts/color_fix_util.py:14-118, itself from
StableSR): match a generated frame's color statistics (AdaIN) or its
low-frequency wavelet band to the source frame. Host-side NumPy; operates on
[H, W, 3] or [F, H, W, 3] float arrays in [0, 1].
"""

from __future__ import annotations

import numpy as np


def _stats(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-channel mean/std over all but the channel axis."""
    axes = tuple(range(x.ndim - 1))
    return x.mean(axis=axes), x.std(axis=axes) + 1e-8


def adain_color_fix(target: np.ndarray, source: np.ndarray) -> np.ndarray:
    """Re-normalize target's per-channel statistics to match source."""
    t_mean, t_std = _stats(target)
    s_mean, s_std = _stats(source)
    out = (target - t_mean) / t_std * s_std + s_mean
    return np.clip(out, 0.0, 1.0)


def _gauss_blur(img: np.ndarray, radius: int) -> np.ndarray:
    """Separable dilated 3-tap blur used by the wavelet decomposition."""
    import cv2

    k = np.zeros(2 * radius + 1, np.float32)
    k[0] = k[-1] = 0.25
    k[radius] = 0.5
    out = np.empty_like(img)
    frames = img if img.ndim == 4 else img[None]
    res = np.stack([cv2.sepFilter2D(f, -1, k, k) for f in frames])
    return res if img.ndim == 4 else res[0]


def wavelet_decomposition(
    img: np.ndarray, levels: int = 5
) -> tuple[np.ndarray, np.ndarray]:
    """(high_freq, low_freq) via iterative à-trous blurring."""
    high = np.zeros_like(img)
    low = img
    for i in range(levels):
        blurred = _gauss_blur(low, 2**i)
        high = high + (low - blurred)
        low = blurred
    return high, low


def wavelet_color_fix(target: np.ndarray, source: np.ndarray) -> np.ndarray:
    """Swap target's low-frequency band for source's (keeps SR detail,
    restores the source's colors/illumination)."""
    t_high, _ = wavelet_decomposition(target)
    _, s_low = wavelet_decomposition(source)
    return np.clip(t_high + s_low, 0.0, 1.0)
