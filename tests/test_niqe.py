"""NIQE native implementation tests (dove_tpu/eval/niqe.py).

No pristine-model weights ship in this environment, so the end-to-end check
fits a small synthetic "pristine" model and verifies the score orders a
degraded image above its clean counterpart (NIQE: lower = more natural).
"""

import cv2
import numpy as np
import pytest

from dove_tpu.eval.niqe import (
    _matlab_bicubic_half,
    estimate_aggd,
    niqe_features,
    niqe_metric,
    niqe_score,
)


def test_aggd_recovers_alpha():
    rng = np.random.default_rng(0)
    gauss = rng.normal(0, 1.0, 200_000)        # GGD alpha = 2
    lap = rng.laplace(0, 1.0, 200_000)         # GGD alpha = 1
    a_g, bl_g, br_g = estimate_aggd(gauss)
    a_l, _, _ = estimate_aggd(lap)
    assert abs(a_g - 2.0) < 0.1
    assert abs(a_l - 1.0) < 0.1
    # symmetric input -> near-equal left/right scales
    assert abs(bl_g - br_g) < 0.05 * bl_g


def test_aggd_asymmetry_direction():
    rng = np.random.default_rng(1)
    x = np.concatenate([
        -np.abs(rng.normal(0, 2.0, 100_000)),   # heavy left tail
        np.abs(rng.normal(0, 0.5, 100_000)),
    ])
    _, bl, br = estimate_aggd(x)
    assert bl > 2.0 * br


def test_bicubic_half_properties():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (96, 64))
    out = _matlab_bicubic_half(img)
    assert out.shape == (48, 32)
    # constant image is exactly preserved (weights sum to 1)
    const = _matlab_bicubic_half(np.full((64, 64), 3.7))
    np.testing.assert_allclose(const, 3.7, rtol=1e-12)
    # a linear ramp survives interior antialiased resampling
    ramp = np.tile(np.arange(64, dtype=np.float64)[None, :], (64, 1))
    r = _matlab_bicubic_half(ramp)
    interior = r[:, 3:-3]
    dif = np.diff(interior, axis=1)
    np.testing.assert_allclose(dif, 2.0, atol=1e-6)


def test_features_shape_and_finite():
    rng = np.random.default_rng(3)
    base = rng.uniform(0, 255, (24, 24))
    gray = cv2.resize(base, (192, 192), interpolation=cv2.INTER_CUBIC)
    gray += rng.normal(0, 6.0, gray.shape)
    feats = niqe_features(np.clip(gray, 0, 255))
    assert feats.shape[1] == 36
    assert 1 <= feats.shape[0] <= 4
    assert np.isfinite(feats).all()


def _textured(rng, h=288, w=288):
    """Natural-ish test image: multi-scale smoothed noise."""
    img = np.zeros((h, w))
    for cell, amp in ((6, 90.0), (24, 60.0), (96, 40.0)):
        low = rng.uniform(0, 1, (h // cell, w // cell))
        img += amp * cv2.resize(low, (w, h), interpolation=cv2.INTER_CUBIC)
    img += rng.normal(0, 3.0, (h, w))
    return np.clip(img + 30, 0, 255)


def test_score_ranks_degraded_worse(tmp_path):
    rng = np.random.default_rng(4)
    feats = np.concatenate([niqe_features(_textured(rng)) for _ in range(6)])
    mu = feats.mean(axis=0)
    cov = np.cov(feats, rowvar=False)

    clean = _textured(rng)
    degraded = cv2.GaussianBlur(clean, (31, 31), 12.0)
    s_clean = niqe_score(clean, mu, cov)
    s_deg = niqe_score(degraded, mu, cov)
    assert np.isfinite(s_clean) and np.isfinite(s_deg)
    assert s_deg > 1.5 * s_clean

    # weights-gated metric entry point (npz roundtrip + [F,H,W,3] API)
    np.savez(tmp_path / "niqe.npz", mu=mu, cov=cov)
    fn = niqe_metric(str(tmp_path / "niqe.npz"))
    clip = np.repeat((clean / 255.0)[None, :, :, None], 3, axis=3)
    val = fn(clip[:2])
    assert np.isfinite(val)


def test_gating_error_without_params(monkeypatch):
    monkeypatch.delenv("DOVE_NIQE_PARAMS", raising=False)
    from dove_tpu.eval.metrics import get_metric

    with pytest.raises(NotImplementedError, match="DOVE_NIQE_PARAMS"):
        get_metric("niqe")
