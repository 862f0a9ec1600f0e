"""Color-fix utilities (AdaIN + wavelet transfer) — invariant tests.

Reference capability: /root/reference/finetune/scripts/color_fix_util.py
(StableSR's color corrector). Properties pinned here: AdaIN matches the
source's per-channel statistics exactly (pre-clip); wavelet transfer keeps
the target's high-frequency band while adopting the source's low band; both
are identity when target == source.
"""

import numpy as np
import pytest

from dove_tpu.eval.color_fix import (
    adain_color_fix,
    wavelet_color_fix,
    wavelet_decomposition,
)


@pytest.fixture
def frames():
    rng = np.random.default_rng(0)
    base = rng.random((2, 32, 40, 3), np.float32) * 0.5 + 0.25
    shifted = np.clip(base * 0.8 + 0.15, 0.0, 1.0)  # color-cast "source"
    return base, shifted


def test_adain_matches_source_stats(frames):
    target, source = frames
    out = adain_color_fix(target, source)
    assert out.shape == target.shape
    for c in range(3):
        np.testing.assert_allclose(
            out[..., c].mean(), source[..., c].mean(), atol=1e-3
        )
        np.testing.assert_allclose(
            out[..., c].std(), source[..., c].std(), atol=1e-3
        )


def test_adain_identity(frames):
    target, _ = frames
    np.testing.assert_allclose(
        adain_color_fix(target, target), target, atol=1e-5
    )


def test_wavelet_decomposition_reconstructs(frames):
    target, _ = frames
    high, low = wavelet_decomposition(target)
    np.testing.assert_allclose(high + low, target, atol=1e-5)


def test_wavelet_color_fix_swaps_low_band(frames):
    target, source = frames
    out = wavelet_color_fix(target, source)
    assert out.shape == target.shape
    high_t, _ = wavelet_decomposition(target)
    high_o, low_o = wavelet_decomposition(np.clip(out, 0.0, 1.0))
    _, low_s = wavelet_decomposition(source)
    # the output's low band tracks the source, not the target (clipping
    # makes this approximate; the cast fixture keeps values interior)
    assert np.abs(low_o - low_s).mean() < np.abs(low_o - (target - high_t)).mean()
    # identity when the source IS the target
    np.testing.assert_allclose(
        wavelet_color_fix(target, target), target, atol=1e-4
    )


def test_single_frame_rank(frames):
    target, source = frames
    out = adain_color_fix(target[0], source[0])
    assert out.shape == target[0].shape
    out_w = wavelet_color_fix(target[0], source[0])
    assert out_w.shape == target[0].shape
