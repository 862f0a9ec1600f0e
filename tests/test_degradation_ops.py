"""Direct unit tests for the degradation op families (SURVEY §2.4).

Reference behavior: /root/reference/finetune/datasets/degradation.py
(Real-ESRGAN-style two-stage synthesis). The dataset tests exercise the
full pipelines; these pin the individual ops' contracts — value ranges,
shape rules, drift determinism, and the blur-kernel bank's normalization.
"""

import numpy as np
import pytest

from dove_tpu.data.blur_kernels import random_mixed_kernel
from dove_tpu.data.degradation import (
    DegradationsWithShuffle,
    RandomBlur,
    RandomJPEGCompression,
    RandomNoise,
    RandomResize,
    RandomVideoCompression,
)

ALL_KERNELS = [
    "iso", "aniso", "generalized_iso", "generalized_aniso",
    "plateau_iso", "plateau_aniso", "sinc",
]


@pytest.fixture
def clip():
    rng = np.random.default_rng(0)
    return (rng.random((4, 24, 32, 3)) * 0.8 + 0.1).astype(np.float32)


@pytest.mark.parametrize("ktype", ALL_KERNELS)
def test_blur_kernels_normalized(ktype):
    rng = np.random.default_rng(7)
    k = random_mixed_kernel(rng, [ktype], [1.0], kernel_size=13)
    assert k.shape == (13, 13)
    np.testing.assert_allclose(k.sum(), 1.0, atol=1e-6)
    if ktype != "sinc":  # sinc kernels legitimately ring negative
        assert k.min() >= 0.0


def test_random_blur_shape_and_determinism(clip):
    op = RandomBlur({
        "kernel_size": [7, 9],
        "kernel_list": ["iso", "aniso"],
        "kernel_prob": [0.6, 0.4],
    })
    out = op(clip, np.random.default_rng(3))
    assert out.shape == clip.shape
    assert not np.array_equal(out, clip)  # prob defaults to 1: always blurs
    out2 = op(clip, np.random.default_rng(3))
    np.testing.assert_array_equal(out, out2)


def test_random_resize_updown_and_target(clip):
    op = RandomResize({
        "resize_opt": ["bilinear"], "resize_prob": [1.0],
        "resize_mode_prob": [0.0, 1.0, 0.0],  # always "down"
        "resize_scale": (0.5, 0.5),
    })
    rng = np.random.default_rng(1)
    out = op(clip, rng)
    assert out.shape[0] == clip.shape[0] and out.shape[3] == 3
    assert out.shape[1] < clip.shape[1]
    # datasets point the op at the per-crop LQ size (reference
    # real_sr_dataset.py:253-256)
    op.set_target_size((12, 16))
    out_t = op(clip, np.random.default_rng(2))
    assert out_t.shape == (4, 12, 16, 3)


def test_random_noise_changes_frames_in_range(clip):
    op = RandomNoise({
        "noise_type": ["gaussian"], "noise_prob": [1.0],
        "gaussian_sigma": (5.0, 10.0), "gaussian_gray_noise_prob": 0.0,
    })
    out = op(clip, np.random.default_rng(5))
    assert out.shape == clip.shape
    assert not np.array_equal(out, clip)
    assert np.isfinite(out).all()


def test_jpeg_roundtrip_stays_in_range(clip):
    op = RandomJPEGCompression({"quality": (30, 50), "quality_step": 3})
    out = op(clip, np.random.default_rng(4))
    assert out.shape == clip.shape
    assert 0.0 <= out.min() and out.max() <= 1.0
    # low quality must actually degrade
    assert np.abs(out - clip).mean() > 1e-3


def test_video_compression_preserves_geometry(clip):
    op = RandomVideoCompression({
        "codec": ["mpeg4"], "codec_prob": [1.0],
        "bitrate": (1e4, 1e5),
    })
    out = op(clip, np.random.default_rng(6))
    assert out.shape == clip.shape
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_mjpeg_rate_control_tracks_bitrate(clip):
    """The rate-targeted MJPEG fallback (VERDICT r4 item 7) must (a) honor
    the byte budget when it is reachable, (b) degrade monotonically as the
    budget shrinks, (c) bottom out gracefully (q=2 floor) below it."""
    op = RandomVideoCompression({
        "codec": ["libx264"], "codec_prob": [1.0], "bitrate": (1e4, 1e5),
    })
    F = clip.shape[0]
    out_hi, nb_hi = op._mjpeg_roundtrip(clip, 3_000_000, return_bytes=True)
    out_lo, nb_lo = op._mjpeg_roundtrip(clip, 300_000, return_bytes=True)
    assert out_hi.shape == clip.shape and out_lo.shape == clip.shape
    # achieved bytes within budget (when above the q=2 floor)
    assert nb_hi <= 3_000_000 / 8 * (F / 25.0)
    assert nb_lo < nb_hi
    err_hi = np.abs(out_hi - clip).mean()
    err_lo = np.abs(out_lo - clip).mean()
    assert err_lo > err_hi > 0
    # floor: an impossible budget returns the q=2 encode, not a crash
    out_floor = op._mjpeg_roundtrip(clip, 1_000)
    assert out_floor.shape == clip.shape
    # sampled non-mpeg4 codec routes to the rate-targeted path (no av here)
    from dove_tpu.data import degradation as deg

    if not deg._have_av():
        routed = op(clip, np.random.default_rng(3))
        assert routed.shape == clip.shape


def test_shuffle_order_is_rng_driven(clip):
    spec = [
        {"type": "RandomBlur", "params": {
            "kernel_size": [7], "kernel_list": ["iso"], "kernel_prob": [1.0],
        }},
        {"type": "RandomNoise", "params": {
            "noise_type": ["gaussian"], "noise_prob": [1.0],
            "gaussian_sigma": (20.0, 20.0), "gaussian_gray_noise_prob": 0.0,
        }},
    ]
    op = DegradationsWithShuffle(spec)
    out_a = op(clip, np.random.default_rng(11))
    out_b = op(clip, np.random.default_rng(11))
    np.testing.assert_array_equal(out_a, out_b)  # seeded determinism
    # different seeds explore different orders/params
    out_c = op(clip, np.random.default_rng(12))
    assert not np.array_equal(out_a, out_c)
    # set_target_size finds no resize op here
    assert op.set_target_size((8, 8)) is False


def test_compression_backend_recorded(clip, caplog):
    """The active video-compression backend is queryable and, when the cv2
    fallback is in use, loudly warned about exactly once (VERDICT r3 #5:
    training must record WHICH path synthesized its MPEG artifacts)."""
    import logging

    from dove_tpu.data import degradation as deg

    backend = deg.compression_backend()
    assert backend == (
        "pyav" if deg._have_av() else "cv2-mp4v+rate-mjpeg-fallback"
    )

    if not deg._have_av():
        deg._BACKEND_WARNED = False  # reset the once-latch for the test
        op = deg.RandomVideoCompression({
            "codec": ["mpeg4"], "codec_prob": [1.0],
            "bitrate": [1e4, 1e5]})
        frames = np.tile(clip[:2], (1, 1, 1, 1))
        with caplog.at_level(logging.WARNING, "dove_tpu.data.degradation"):
            op(frames, np.random.default_rng(0))
            op(frames, np.random.default_rng(1))
        banners = [r for r in caplog.records if "FALLBACK" in r.message]
        assert len(banners) == 1  # loud, but once


def test_degradation_gap_metrics():
    """The block-DCT band-energy + blockiness metrics behave as designed
    (the committed DEGRADATION_BACKEND.json rows rest on them)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    import degradation_backend_report as rep

    clip_ = rep.make_clip(frames=4, size=64)
    bands = rep.dct_band_energy(clip_)
    assert abs(sum(bands.values()) - 1.0) < 1e-6
    # hard-quantized blocks: energy collapses into the low band and the
    # block-boundary gradient ratio rises (base: smooth ramp, so the
    # blockiness denominator is interior gradient of the ramp, not zero)
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) / 64.0
    smooth = np.broadcast_to(
        (0.3 * xx + 0.2 * yy)[None, :, :, None], (4, 64, 64, 3)).copy()
    blocky = smooth.reshape(4, 8, 8, 8, 8, 3).mean(axis=(2, 4), keepdims=True)
    blocky = np.broadcast_to(
        blocky, smooth.reshape(4, 8, 8, 8, 8, 3).shape).reshape(4, 64, 64, 3)
    bands_s = rep.dct_band_energy(smooth)
    bands_b = rep.dct_band_energy(blocky)
    assert bands_b["dct_low"] >= bands_s["dct_low"]
    assert rep.blockiness(blocky) > rep.blockiness(smooth) * 2
