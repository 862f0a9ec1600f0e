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
