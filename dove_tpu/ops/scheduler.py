"""Diffusion schedule algebra for one-step DOVE inference/training.

DOVE only uses two pieces of the CogVideoX scheduler (SURVEY.md §2.2 — reference
usage: /root/reference/inference_script.py:449-493):

  * ``add_noise(x, eps, t)   = sqrt(abar_t) * x + sqrt(1-abar_t) * eps``
  * ``get_velocity(v, z, t)  = sqrt(abar_t) * z - sqrt(1-abar_t) * v``
    (DOVE calls it with (pred_velocity, noisy_latent) so the result IS x-hat_0)

The alpha-bar table reproduces CogVideoX's schedule construction: scaled-linear
betas -> cumprod -> SNR shift -> zero-terminal-SNR rescale. Everything is
precomputed host-side in float64 and used as an fp32 constant table; the gather
at a (possibly traced) integer timestep is jit-friendly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dove_tpu.config import SchedulerConfig


def _make_betas(cfg: SchedulerConfig) -> np.ndarray:
    n = cfg.num_train_timesteps
    if cfg.beta_schedule == "scaled_linear":
        return (
            np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, n, dtype=np.float64)
            ** 2
        )
    if cfg.beta_schedule == "linear":
        return np.linspace(cfg.beta_start, cfg.beta_end, n, dtype=np.float64)
    raise ValueError(f"Unsupported beta_schedule: {cfg.beta_schedule}")


def _rescale_zero_terminal_snr(alphas_cumprod: np.ndarray) -> np.ndarray:
    """Shift+scale sqrt(abar) so the final timestep has exactly zero SNR.

    Algorithm from "Common Diffusion Noise Schedules and Sample Steps are
    Flawed" (Lin et al.), applied to alpha-bar directly as CogVideoX does.
    """
    abar_sqrt = np.sqrt(alphas_cumprod)
    a0, aT = abar_sqrt[0], abar_sqrt[-1]
    abar_sqrt = (abar_sqrt - aT) * (a0 / (a0 - aT))
    return abar_sqrt**2


def make_alphas_cumprod(cfg: SchedulerConfig) -> np.ndarray:
    """Full alpha-bar table, shape (num_train_timesteps,), float64."""
    betas = _make_betas(cfg)
    alphas_cumprod = np.cumprod(1.0 - betas)
    # SNR shift (CogVideoX): abar <- abar / (s + (1-s)*abar)
    s = cfg.snr_shift_scale
    alphas_cumprod = alphas_cumprod / (s + (1.0 - s) * alphas_cumprod)
    if cfg.rescale_betas_zero_snr:
        alphas_cumprod = _rescale_zero_terminal_snr(alphas_cumprod)
    return alphas_cumprod


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Schedule:
    """Precomputed alpha-bar table with the two DOVE ops as jit-safe methods."""

    alphas_cumprod: jnp.ndarray  # (T,), float32

    def tree_flatten(self):
        return (self.alphas_cumprod,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def create(cls, cfg: SchedulerConfig | None = None) -> "Schedule":
        cfg = cfg or SchedulerConfig()
        return cls(jnp.asarray(make_alphas_cumprod(cfg), dtype=jnp.float32))

    def _coeffs(self, t: jnp.ndarray, ndim: int, dtype) -> tuple[jnp.ndarray, jnp.ndarray]:
        abar = self.alphas_cumprod[t]
        sqrt_abar = jnp.sqrt(abar).astype(dtype)
        sqrt_1m = jnp.sqrt(1.0 - abar).astype(dtype)
        shape = (-1,) + (1,) * (ndim - 1)
        return sqrt_abar.reshape(shape), sqrt_1m.reshape(shape)

    def add_noise(self, sample: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """z_t = sqrt(abar_t) x_0 + sqrt(1-abar_t) eps.  t: int array (B,) or scalar."""
        t = jnp.atleast_1d(jnp.asarray(t))
        a, b = self._coeffs(t, sample.ndim, sample.dtype)
        return a * sample + b * noise

    def get_velocity(self, sample: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """v = sqrt(abar_t) * noise - sqrt(1-abar_t) * sample.

        DOVE's one-step trick calls this as get_velocity(v_pred, z_t, t), which
        evaluates to sqrt(abar_t) z_t - sqrt(1-abar_t) v_pred = x-hat_0.
        """
        t = jnp.atleast_1d(jnp.asarray(t))
        a, b = self._coeffs(t, sample.ndim, sample.dtype)
        return a * noise - b * sample

    def velocity_to_x0(self, v_pred: jnp.ndarray, z_t: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """Explicitly-named alias for the one-step denoise formula."""
        return self.get_velocity(v_pred, z_t, t)
