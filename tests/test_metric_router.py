"""Metric registry routing (eval/metrics.py get_metric).

Native metrics resolve to callables; weights-gated ones raise actionable
errors naming the env knob to set (the reference relies on pyiqa's model
zoo; this framework gates on exported weights the same way its external
evals gate on checkouts).
"""

import numpy as np
import pytest

from dove_tpu.eval.metrics import get_metric


def test_native_metrics_compute():
    rng = np.random.default_rng(0)
    # clips [F, H, W, 3], frames >= the 11x11 SSIM window
    a = rng.random((2, 32, 32, 3)).astype(np.float32)
    b = np.clip(a + 0.05, 0, 1).astype(np.float32)
    psnr = get_metric("psnr")
    ssim = get_metric("SSIM")  # case-insensitive
    assert psnr(a, a) > psnr(a, b) > 20
    assert 0 < ssim(a, b) <= ssim(a, a) <= 1.0


@pytest.mark.parametrize(
    "name", ["lpips", "dists", "clipiqa", "niqe", "maniqa", "musiq", "ewarp"]
)
def test_gated_metrics_raise_actionable_errors(name, monkeypatch):
    for var in ("DOVE_LPIPS_WEIGHTS", "DOVE_DISTS_WEIGHTS",
                "DOVE_CLIP_WEIGHTS", "DOVE_NIQE_PARAMS",
                "DOVE_MANIQA_WEIGHTS", "DOVE_MUSIQ_WEIGHTS",
                "DOVE_RAFT_WEIGHTS"):
        monkeypatch.delenv(var, raising=False)
    with pytest.raises(NotImplementedError) as e:
        fn = get_metric(name)
        # some metrics defer the weights check to first call
        fn(np.zeros((8, 8, 3), np.float32), np.zeros((8, 8, 3), np.float32))
    # the message must point at a concrete remedy (env var / loader)
    assert "DOVE_" in str(e.value) or "weight" in str(e.value).lower()


def test_unknown_metric_rejected():
    with pytest.raises((ValueError, KeyError, NotImplementedError)):
        get_metric("no_such_metric")
