"""Golden-value and algebra tests for the diffusion schedule.

Golden alpha-bar values were computed once at float128 precision from the
published CogVideoX schedule construction (scaled-linear betas -> cumprod ->
SNR shift -> zero-terminal-SNR rescale); see docstring in
dove_tpu/ops/scheduler.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dove_tpu.config import SchedulerConfig
from dove_tpu.ops.scheduler import Schedule, make_alphas_cumprod

# (snr_shift_scale) -> {timestep: alpha_bar}
GOLDEN = {
    1.0: {
        0: 0.999150000000,
        1: 0.998233446140,
        399: 0.393544057504,
        500: 0.241018782757,
        998: 0.000000196789,
        999: 0.0,
    },
    3.0: {
        0: 0.997454327643,
        1: 0.994800626427,
        399: 0.178615234118,
        500: 0.095328100863,
        998: 0.000000062308,
        999: 0.0,
    },
}


@pytest.mark.parametrize("snr_shift", [1.0, 3.0])
def test_alpha_bar_golden(snr_shift):
    cfg = SchedulerConfig(snr_shift_scale=snr_shift)
    table = make_alphas_cumprod(cfg)
    assert table.shape == (1000,)
    for t, expected in GOLDEN[snr_shift].items():
        assert table[t] == pytest.approx(expected, abs=1e-9), f"t={t}"


def test_terminal_snr_is_zero():
    table = make_alphas_cumprod(SchedulerConfig())
    assert table[-1] == pytest.approx(0.0, abs=1e-12)


def test_add_noise_get_velocity_roundtrip():
    """get_velocity(v_true, z_t, t) must recover x0 exactly (the DOVE trick)."""
    sched = Schedule.create()
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 8, 8)), dtype=jnp.float32)
    eps = jnp.asarray(rng.standard_normal((2, 4, 8, 8)), dtype=jnp.float32)
    t = jnp.array([399, 399])

    z_t = sched.add_noise(x0, eps, t)
    v_true = sched.get_velocity(x0, eps, t)  # true velocity target
    x0_rec = sched.get_velocity(v_true, z_t, t)  # DOVE's reuse as x0 formula
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-5)


def test_scalar_timestep_and_dtype():
    sched = Schedule.create()
    x = jnp.ones((1, 3, 4, 4), dtype=jnp.bfloat16)
    z = sched.add_noise(x, x, 399)
    assert z.dtype == jnp.bfloat16
    expected = np.sqrt(0.393544057504) + np.sqrt(1 - 0.393544057504)
    assert float(z[0, 0, 0, 0]) == pytest.approx(expected, rel=1e-2)
