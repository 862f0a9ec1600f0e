"""Torch oracle: CogVideoXDPMScheduler subset (alpha-bar table + velocity).

The reference uses exactly two scheduler methods (SURVEY.md §2.2):
``add_noise`` (/root/reference/inference_script.py:457) and ``get_velocity``
reused as the x-hat_0 formula (:491). This oracle reproduces the published
schedule construction: scaled-linear betas in float64, the SNR-shift
transform, and the zero-terminal-SNR rescale.
"""

from __future__ import annotations

import torch


class SchedulerOracle:
    def __init__(self, num_train_timesteps=1000, beta_start=0.00085,
                 beta_end=0.012, snr_shift_scale=1.0,
                 rescale_betas_zero_snr=True):
        betas = torch.linspace(beta_start ** 0.5, beta_end ** 0.5,
                               num_train_timesteps, dtype=torch.float64) ** 2
        alphas_cumprod = torch.cumprod(1.0 - betas, dim=0)
        # SNR shift: SNR' = SNR / s  <=>  a' = a / (s + (1 - s) a)
        alphas_cumprod = alphas_cumprod / (
            snr_shift_scale + (1 - snr_shift_scale) * alphas_cumprod)
        if rescale_betas_zero_snr:
            alphas_cumprod = self._rescale_zero_terminal_snr(alphas_cumprod)
        self.alphas_cumprod = alphas_cumprod

    @staticmethod
    def _rescale_zero_terminal_snr(alphas_cumprod: torch.Tensor) -> torch.Tensor:
        ab_sqrt = alphas_cumprod.sqrt()
        ab0, abT = ab_sqrt[0].clone(), ab_sqrt[-1].clone()
        ab_sqrt = (ab_sqrt - abT) * (ab0 / (ab0 - abT))
        return ab_sqrt ** 2

    def _coeffs(self, t: torch.Tensor, like: torch.Tensor):
        a = self.alphas_cumprod.to(like.dtype)[t].flatten()
        sqrt_a = a ** 0.5
        sqrt_1ma = (1 - a) ** 0.5
        while sqrt_a.ndim < like.ndim:
            sqrt_a = sqrt_a.unsqueeze(-1)
            sqrt_1ma = sqrt_1ma.unsqueeze(-1)
        return sqrt_a, sqrt_1ma

    def add_noise(self, sample, noise, t):
        sqrt_a, sqrt_1ma = self._coeffs(t, sample)
        return sqrt_a * sample + sqrt_1ma * noise

    def get_velocity(self, sample, noise, t):
        sqrt_a, sqrt_1ma = self._coeffs(t, sample)
        return sqrt_a * noise - sqrt_1ma * sample
