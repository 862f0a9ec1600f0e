#!/usr/bin/env python
"""Generate committed golden parity fixtures from the torch oracles.

Usage (CPU, no TPU needed):

    python tests/oracles/make_golden.py [--out tests/fixtures/golden]

Writes, per variant ("15" = CogVideoX1.5 style with RoPE + patch_size_t=2,
"2b" = CogVideoX-2B style with sincos pos-embed + conv patchify):

    <out>/<variant>/vae.safetensors          diffusers-named VAE state dict
    <out>/<variant>/transformer.safetensors  diffusers-named DiT state dict
    <out>/<variant>/golden.npz               inputs + oracle outputs + sha256

The fixtures are consumed by tests/test_parity_golden.py, which converts the
state dicts through dove_tpu.weights.convert_{vae,dit} (the same code path
released checkpoints take) and asserts >50 dB agreement of the JAX forward
passes — executing SURVEY.md §7's parity gates against an implementation
derived independently from the published torch semantics.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from tests.oracles.torch_dit import (  # noqa: E402
    CogVideoXTransformer3DModel,
    get_3d_rotary_pos_embed_slice,
)
from tests.oracles.torch_sched import SchedulerOracle  # noqa: E402
from tests.oracles.torch_vae import AutoencoderKLCogVideoX  # noqa: E402


def _sha256(arr: np.ndarray) -> str:
    return hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()


def seeded_init(model: torch.nn.Module, seed: int) -> None:
    """Deterministic, norm-affine-exercising weight fill."""
    gen = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for name, p in sorted(sd.items()):
        if p.ndim >= 2:
            fan_in = int(np.prod(p.shape[1:]))
            p.copy_(torch.randn(p.shape, generator=gen) * (0.5 / fan_in ** 0.5))
        elif name.endswith(".bias") or name == "bias":
            p.copy_(torch.randn(p.shape, generator=gen) * 0.05)
        else:  # 1-D norm scales: keep near 1 so activations stay tame
            p.copy_(1.0 + torch.randn(p.shape, generator=gen) * 0.2)
    model.load_state_dict(sd)


def save_safetensors(sd: dict[str, torch.Tensor], path: Path) -> None:
    from safetensors.torch import save_file

    save_file({k: v.contiguous() for k, v in sd.items()}, str(path))


def make_inputs(cfg, geometry=(9, 64, 64)) -> dict[str, np.ndarray]:
    """MUST match scripts/parity_check.py:make_inputs conventions."""
    rng = np.random.default_rng(20260816)
    F, H, W = geometry
    Fl = cfg.vae.latent_frames(F)
    h, w = H // cfg.vae.spatial_scale, W // cfg.vae.spatial_scale
    C = cfg.vae.latent_channels
    pt = cfg.dit.patch_size_t or 1
    Fp = Fl + (-Fl) % pt
    return {
        "input_video": rng.uniform(-1, 1, (1, F, H, W, 3)).astype(np.float32),
        "input_latent": rng.normal(0, 1, (1, Fl, h, w, C)).astype(np.float32),
        "dit_latent": rng.normal(
            0, 1, (1, Fp, cfg.dit.in_channels, h, w)).astype(np.float32),
        "text_embeds": rng.normal(
            0, 1, (1, cfg.dit.max_text_seq_length, cfg.dit.text_embed_dim)
        ).astype(np.float32),
        "timestep": np.asarray(399, np.int64),
    }


def generate(variant: str, out_dir: Path) -> None:
    from dove_tpu import config as cfg_mod

    if variant == "15":
        cfg = cfg_mod.tiny_test()
    else:  # 2B style: conv patchify + sincos pos-embed, no RoPE
        base = cfg_mod.tiny_test()
        cfg = cfg_mod.PipelineConfig(
            dit=cfg_mod.DiTConfig(
                num_layers=2, num_attention_heads=4, attention_head_dim=16,
                in_channels=8, out_channels=8, text_embed_dim=32,
                max_text_seq_length=7, time_embed_dim=16,
                patch_size_t=None, patch_bias=True,
                use_rotary_positional_embeddings=False,
                # LATENT-unit sample grid (diffusers convention), matched
                # to geometry a's actual latents (F9->3, 64px->8 latent) so
                # geometry a exercises the stored-table branch and
                # geometry b the recompute-on-mismatch branch — the two
                # code paths of CogVideoXPatchEmbed.forward.
                sample_height=8, sample_width=8, sample_frames=9,
            ),
            vae=base.vae,
            scheduler=cfg_mod.SchedulerConfig(snr_shift_scale=3.0),
        )

    out_dir.mkdir(parents=True, exist_ok=True)
    torch.set_grad_enabled(False)

    vae = AutoencoderKLCogVideoX(cfg.vae).eval()
    seeded_init(vae, seed=11 if variant == "15" else 13)
    dit = CogVideoXTransformer3DModel(cfg.dit).eval()
    seeded_init(dit, seed=21 if variant == "15" else 23)
    sched = SchedulerOracle(
        num_train_timesteps=cfg.scheduler.num_train_timesteps,
        beta_start=cfg.scheduler.beta_start,
        beta_end=cfg.scheduler.beta_end,
        snr_shift_scale=cfg.scheduler.snr_shift_scale,
        rescale_betas_zero_snr=cfg.scheduler.rescale_betas_zero_snr,
    )

    def run_oracles(inputs: dict[str, np.ndarray], last_tap: bool):
        out: dict[str, np.ndarray] = {}

        # VAE: dove_tpu convention is channels-last video [B,F,H,W,3]
        video = torch.from_numpy(
            inputs["input_video"]).permute(0, 4, 1, 2, 3)
        moments = vae.encode(video)  # [B, 2C, F', h, w]
        out["vae_moments"] = moments.permute(0, 2, 3, 4, 1).numpy()
        latent = torch.from_numpy(
            inputs["input_latent"]).permute(0, 4, 1, 2, 3)
        out["vae_decode_out"] = vae.decode(
            latent).permute(0, 2, 3, 4, 1).numpy()

        # DiT at t=399 with the reference's rope prep (slice grid)
        z = torch.from_numpy(inputs["dit_latent"])
        text = torch.from_numpy(inputs["text_embeds"])
        t = torch.full((1,), int(inputs["timestep"]), dtype=torch.long)
        rope = None
        if cfg.dit.use_rotary_positional_embeddings:
            p, pt = cfg.dit.patch_size, cfg.dit.patch_size_t or 1
            grid_h, grid_w = z.shape[3] // p, z.shape[4] // p
            rope = get_3d_rotary_pos_embed_slice(
                cfg.dit.attention_head_dim, (grid_h, grid_w),
                z.shape[1] // pt, max_size=(grid_h, grid_w),
                theta=cfg.dit.rope_theta)
        tap: dict = {}
        pred = dit(z, text, t, image_rotary_emb=rope, block0_tap=tap)
        out["dit_out"] = pred.numpy()
        out["dit_block0_out"] = tap["hidden"].numpy()
        if last_tap:  # per-block localization taps (VERDICT r4 item 8)
            n = len(dit.transformer_blocks)
            out["dit_blocklast_out"] = tap[f"hidden_{n - 1}"].numpy()

        # Scheduler
        out["sched_alphas"] = sched.alphas_cumprod.float().numpy()
        out["sched_x0"] = sched.get_velocity(
            pred.float(), torch.from_numpy(inputs["dit_latent"]), t).numpy()
        # deterministic "noise": the frame-reversed latent (no RNG
        # convention needs to match across frameworks this way)
        noise = torch.from_numpy(inputs["dit_latent"][:, ::-1].copy())
        out["sched_add_noise"] = sched.add_noise(
            torch.from_numpy(inputs["dit_latent"]), noise, t).numpy()
        return out

    save_safetensors(vae.state_dict(), out_dir / "vae.safetensors")
    save_safetensors(dit.state_dict(), out_dir / "transformer.safetensors")

    # Geometry a: the original fixture. Geometry b (golden_g2.npz): odd
    # pixel-frame count whose latent count is even, non-square, odd DiT
    # grid dims — the shape classes that have bitten (DMA width alignment,
    # odd-frame temporal pooling), plus the sincos recompute branch for
    # the 2b variant (actual grid != sample grid) and a final-block tap.
    geoms = {"": (9, 64, 64),
             "_g2": (13, 48, 80) if variant == "15" else (13, 32, 48)}
    for suffix, geometry in geoms.items():
        inputs = make_inputs(cfg, geometry)
        out = run_oracles(inputs, last_tap=bool(suffix))
        meta = {
            "source": "tests/oracles torch re-implementation",
            "variant": variant,
            "geometry": list(geometry),
            "torch": torch.__version__,
            "timestep": int(inputs["timestep"]),
            "sha256": {k: _sha256(v) for k, v in {**inputs, **out}.items()},
        }
        np.savez_compressed(out_dir / f"golden{suffix}.npz",
                            meta=json.dumps(meta), **inputs, **out)
    total = sum(f.stat().st_size for f in out_dir.iterdir())
    print(f"[{variant}] wrote {out_dir} ({total / 1e6:.2f} MB): "
          f"{', '.join(sorted(out))}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(
        Path(__file__).resolve().parents[1] / "fixtures" / "golden"))
    args = ap.parse_args()
    for variant in ("15", "2b"):
        generate(variant, Path(args.out) / variant)


if __name__ == "__main__":
    main()
