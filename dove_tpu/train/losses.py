"""Training losses for the two DOVE fine-tuning stages.

Stage 1 (latent): MSE between the one-step x-hat_0 latent and the HQ latent
(reference: lora_one_s1_trainer.py:116-209). Stage 2 (pixel): decode x-hat_0
frame-by-frame WITH gradients and combine pixel MSE + perceptual (DISTS/LPIPS,
optionally edge-weighted) + temporal frame-difference L1
(reference: lora_one_s2_trainer.py:124-297).

All functions are pure: (params, batch, rngs) -> (loss, aux dict), composable
under jit/grad/remat and mesh shardings.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from dove_tpu.config import PipelineConfig
from dove_tpu.models import vae as vae_mod
from dove_tpu.models.dit import dit_forward
from dove_tpu.ops.scheduler import Schedule


def one_step_x0_latent(
    cfg: PipelineConfig,
    schedule: Schedule,
    dit_params: Any,
    lq_latent: jnp.ndarray,  # [B, F', h, w, C] scaled latent
    text_embeds: jnp.ndarray,  # [B, L, text_dim]
    rng: jax.Array | None,
    remat: bool = True,
    attention_backend: str | None = None,
    bounded_logits: bool = False,
    dit_fn: Any | None = None,
) -> jnp.ndarray:
    """Shared one-step denoise core: returns x-hat_0 in [B, F', h, w, C]
    (patch_size_t padding applied and stripped internally).

    dit_fn: optional replacement forward ``(params, z, text, t) -> v_pred``
    (e.g. the tensor-parallel shard_map wrapper from dove_tpu/parallel/tp.py,
    which bakes in remat/backend/bounded_logits); default is dit_forward."""
    B = lq_latent.shape[0]
    pt = cfg.dit.patch_size_t
    ncopy = 0
    if pt is not None:
        # (pt - F % pt) % pt: equal to the reference's F % pt at pt=2
        # (lora_one_s1_trainer.py:135, asserted pt==2-only), correct for any
        ncopy = (pt - lq_latent.shape[1] % pt) % pt
        if ncopy:
            first = jnp.repeat(lq_latent[:, :1], ncopy, axis=1)
            lq_latent = jnp.concatenate([first, lq_latent], axis=1)

    z = jnp.transpose(lq_latent, (0, 1, 4, 2, 3))  # -> [B, F, C, h, w]

    if cfg.noise_step != 0 and rng is not None:
        noise = jax.random.normal(rng, z.shape, jnp.float32).astype(z.dtype)
        t_add = jnp.full((B,), cfg.noise_step, jnp.int32)
        z = schedule.add_noise(z, noise, t_add)

    t_sr = jnp.full((B,), cfg.sr_noise_step, jnp.int32)
    if dit_fn is not None:
        v_pred = dit_fn(dit_params, z, text_embeds, t_sr)
    else:
        v_pred = dit_forward(
            dit_params, cfg.dit, z, text_embeds, t_sr,
            remat=remat, attention_backend=attention_backend,
            bounded_logits=bounded_logits,
        )
    x0 = schedule.velocity_to_x0(v_pred, z, t_sr)
    if ncopy:
        x0 = x0[:, ncopy:]
    return jnp.transpose(x0, (0, 1, 3, 4, 2))  # -> [B, F', h, w, C]


def stage1_loss(
    cfg: PipelineConfig,
    schedule: Schedule,
    dit_params: Any,
    batch: dict[str, jnp.ndarray],
    rng: jax.Array,
    **fwd_kwargs,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Latent-space MSE. batch: lq_latent/hq_latent [B, F', h, w, C] (already
    VAE-encoded and scaled), prompt_embeds [B, L, text_dim]."""
    x0 = one_step_x0_latent(
        cfg, schedule, dit_params, batch["lq_latent"], batch["prompt_embeds"],
        rng, **fwd_kwargs,
    )
    loss = jnp.mean(
        (x0.astype(jnp.float32) - batch["hq_latent"].astype(jnp.float32)) ** 2
    )
    return loss, {"loss_mse": loss}


def frame_difference_l1(video: jnp.ndarray) -> jnp.ndarray:
    """Temporal difference map, [B, F-1, H, W, C]."""
    return video[:, 1:] - video[:, :-1]


def sobel_edges(frames: jnp.ndarray) -> jnp.ndarray:
    """Sobel gradient magnitude per channel (EdgeDetectionModel analog,
    reference finetune/utils/metric_utils.py:210-241). frames: [B, H, W, C]."""
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    ky = kx.T
    C = frames.shape[-1]
    def conv(img, k):
        kernel = k[:, :, None, None] * jnp.eye(C, dtype=jnp.float32)
        return jax.lax.conv_general_dilated(
            img.astype(jnp.float32), kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    gx = conv(frames, kx)
    gy = conv(frames, ky)
    return jnp.sqrt(gx * gx + gy * gy + 1e-12)


def make_perceptual_fn(
    kind: str = "dists",
    edge_aware: bool = False,
    weights_path: str | None = None,
):
    """Build the stage-2 per-frame perceptual loss (reference
    lora_one_s2_trainer.py:240-277): DISTS or LPIPS averaged over frames,
    optionally doubled with the Sobel-edge-map variant ("ea_" weights).

    Without a pretrained weight file, falls back to randomly initialized VGG
    features with uniform heads — still a meaningful (if weaker) perceptual
    prior, and keeps the training path runnable everywhere.
    """
    from dove_tpu.eval import vgg as vgg_mod

    if weights_path:
        sd = vgg_mod._read_state_dict(weights_path)
        vgg = vgg_mod.vgg16_from_torch_sd(sd)
    else:
        vgg = vgg_mod.init_vgg16(jax.random.PRNGKey(0))
    if kind == "dists":
        alpha, beta = vgg_mod.init_dists_weights()
        if weights_path and "alpha" in sd:
            chans = [3] + [c for c, _ in vgg_mod.VGG16_STAGES]
            import numpy as np

            af = np.asarray(sd["alpha"]).reshape(-1)
            bf = np.asarray(sd["beta"]).reshape(-1)
            alpha, beta, off = [], [], 0
            for c in chans:
                alpha.append(jnp.asarray(af[off : off + c], jnp.float32))
                beta.append(jnp.asarray(bf[off : off + c], jnp.float32))
                off += c

        def frame_d(x, y):  # [N, H, W, 3] in [0, 1]
            return jnp.mean(vgg_mod.dists_distance(vgg, alpha, beta, x, y))
    elif kind == "lpips":
        lins = [jnp.ones((c,), jnp.float32) for c, _ in vgg_mod.VGG16_STAGES]
        if weights_path:
            lins = [
                jnp.asarray(sd[f"lins.{k}.model.1.weight"][:, :, 0, 0][0], jnp.float32)
                if f"lins.{k}.model.1.weight" in sd else lins[k]
                for k in range(5)
            ]

        def frame_d(x, y):  # lpips wants [-1, 1]
            return jnp.mean(
                vgg_mod.lpips_distance(vgg, lins, x * 2 - 1, y * 2 - 1)
            )
    else:
        raise ValueError(f"unknown perceptual kind: {kind}")

    def perceptual(pred: jnp.ndarray, hq: jnp.ndarray) -> jnp.ndarray:
        """pred, hq: [B, F, H, W, 3] fp32 already mapped to [0, 1] -> scalar."""
        B, F = pred.shape[:2]
        x = pred.reshape((B * F,) + pred.shape[2:])
        y = hq.reshape((B * F,) + hq.shape[2:])
        loss = frame_d(x, y)
        if edge_aware:
            loss = (loss + frame_d(sobel_edges(x), sobel_edges(y))) * 0.5
        return loss

    return perceptual


def stage2_loss(
    cfg: PipelineConfig,
    schedule: Schedule,
    dit_params: Any,
    vae_params: Any,
    batch: dict[str, jnp.ndarray],
    rng: jax.Array,
    *,
    pixel_weight: float = 1.0,
    perceptual_weight: float = 1.0,
    frame_diff_weight: float = 1.0,
    perceptual_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] | None = None,
    **fwd_kwargs,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Pixel-space composite loss. batch: lq_latent [B,F',h,w,C] (scaled),
    hq_video [B, F, H, W, 3] in [-1,1], prompt_embeds.

    The decode runs with gradients; callers should remat the decoder (handled
    by the per-frame chunked decode being inside this traced fn).
    """
    x0 = one_step_x0_latent(
        cfg, schedule, dit_params, batch["lq_latent"], batch["prompt_embeds"],
        rng, **fwd_kwargs,
    )
    z = x0 / jnp.asarray(cfg.vae.scaling_factor, x0.dtype)
    # Per-frame decode WITH gradients (reference lora_one_s2_trainer.py:228-233):
    # stage 2 treats every frame as an independent 1-frame video, so pixel and
    # latent frame counts match exactly and decode memory stays bounded.
    B, Fl = z.shape[:2]
    z_frames = z.reshape((B * Fl, 1) + z.shape[2:])
    # remat follows the trainer's gradient_checkpointing flag (fwd_kwargs):
    # per-resnet checkpointing in the decode backward keeps ONE block's
    # activations live instead of the whole decoder's (~4x lower step temps,
    # docs/reports/TRAIN_AOT.json) — the published S2 recipe needs it to
    # fit a 16 GB chip.
    pred = vae_mod.decode(
        cfg.vae, vae_params, z_frames,
        remat=bool(fwd_kwargs.get("remat")),
    )  # [B*F, 1, H, W, 3]
    pred = pred.reshape((B, Fl) + pred.shape[2:])  # [B, F, H, W, 3], [-1,1]
    hq = batch["hq_video"].astype(pred.dtype)

    # Reference computes ALL loss terms in [0, 1] after clamp
    # (lora_one_s2_trainer.py:147,228-235: (x/2+0.5).clamp(0,1) on both pred
    # and GT). This fixes both the pixel/frame-diff term scale relative to the
    # perceptual term and the gradient of out-of-range pixels.
    pf = jnp.clip(pred.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)
    hf = jnp.clip(hq.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)

    loss_pixel = jnp.mean((pf - hf) ** 2)
    aux = {"loss_pixel": loss_pixel}
    total = pixel_weight * loss_pixel

    if perceptual_fn is not None and perceptual_weight > 0:
        loss_perc = perceptual_fn(pf, hf)
        aux["loss_perceptual"] = loss_perc
        total = total + perceptual_weight * loss_perc

    if frame_diff_weight > 0 and pred.shape[1] > 1:
        loss_fd = jnp.mean(
            jnp.abs(frame_difference_l1(pf) - frame_difference_l1(hf))
        )
        aux["loss_frame_diff"] = loss_fd
        total = total + frame_diff_weight * loss_fd

    aux["loss"] = total
    return total, aux
