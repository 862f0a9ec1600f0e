#!/usr/bin/env python
"""AOT feasibility of the PUBLISHED training recipes on a virtual v5e-8 mesh.

VERDICT r4 item 5: prove (without 8 real chips) that the reference's S1/S2
recipes — /root/reference/finetune/train_ddp_one_s1.sh:7-96 (SFT, 25x320x640,
batch 2, adamw, gradient checkpointing) and train_ddp_one_s2.sh (LoRA
pixel-space stage) — compile as ONE jitted train step under real shardings
and fit per-chip HBM. The probe builds the REAL Trainer (same registry,
mesh, optimizer, loss and step-construction code the production entry point
uses), zeros-initializes the 5B trees (identical shapes/shardings; zeros
pages are free on CPU), AOT-compiles the step with
``jit(...).lower(...).compile()`` and reports ``memory_analysis()`` per
device.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/probe_train_memory.py [--configs s1_sft_fsdp8,...] \
            [--out docs/reports/TRAIN_AOT.json]

Caveats (stated, not hidden): the numbers come from the CPU backend's
compiled-memory accounting on a virtual 8-device mesh — fusion/layout
decisions differ from the TPU backend, so treat totals as estimates with
margin, not guarantees. The serving-side equivalents of these numbers
(scripts/probe_memory.py) have tracked real on-chip behavior within ~15%.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")


def zeros_like_init(init_fn):
    """Shape-faithful zero init: the AOT probe needs shapes/dtypes, not
    entropy, and materializing 5B of zeros is copy-on-write-free on CPU."""

    def f(key, cfg, dtype, **kw):
        shapes = jax.eval_shape(lambda k: init_fn(k, cfg, dtype, **kw), key)
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    return f


def build_trainer(stage: int, training_type: str, fsdp: int, tp: int,
                  data_parallel: int, optimizer: str, rank: int,
                  resolution: tuple[int, int, int], batch_size: int,
                  tmp: Path):
    from dove_tpu import config as cfg_mod
    from dove_tpu.train import trainer as tr
    from dove_tpu.train.args import Args

    args = Args(
        model_path=tmp / "nonexistent",  # no checkpoint -> init path
        model_name=f"dove-s{stage}",
        training_type=training_type,
        output_dir=tmp / "out",
        report_to=None,
        train_resolution=resolution,
        batch_size=batch_size,
        gradient_checkpointing=True,
        mixed_precision="bf16",
        optimizer=optimizer,
        fsdp=fsdp,
        tensor_parallel=tp,
        data_parallel=data_parallel,
        rank=rank,
        lora_alpha=rank,
        allow_random_perceptual=True,  # probe: no DISTS weights in-env
        # published S2 loss terms (train_ddp_one_s2.sh:92-94)
        use_perceptual_loss=stage == 2,
        dists_weight=1.0 if stage == 2 else 0.0,
        frame_diff_weight=1.0 if stage == 2 else 0.0,
    )
    cls = tr.get_model_cls(args.model_name, args.training_type)
    trainer = cls(args, pipeline_config=cfg_mod.cogvideox1_5_5b())

    # swap the random initializers for zero fills (shapes identical)
    real_dit, real_vae = tr.init_dit_params, tr.init_vae_params
    tr.init_dit_params = zeros_like_init(real_dit)
    tr.init_vae_params = zeros_like_init(real_vae)
    try:
        trainer.load_components()
    finally:
        tr.init_dit_params, tr.init_vae_params = real_dit, real_vae
    trainer.prepare_optimizer(total_steps=10_000)
    return trainer


def probe(trainer, latent: bool = False) -> dict:
    from dove_tpu.parallel import mesh as mesh_mod

    a = trainer.args
    F, H, W = a.train_resolution
    B = a.batch_size
    bs = mesh_mod.batch_sharding(trainer.mesh)
    cfgd = trainer.config.dit
    cfgv = trainer.config.vae

    def sds(shape):
        return jax.ShapeDtypeStruct(shape, jnp.float32, sharding=bs)

    if latent:
        # is_latent / is_cache training (reference real_sr_dataset.py:173-
        # 207: latents cached under cache/video_latent/, trainer consumes
        # them directly) — the VAE encode leaves the step, so per-chip
        # temps are the DiT fwd/bwd alone. Same hyperparameters otherwise.
        Fl = cfgv.latent_frames(F)
        h, w = H // cfgv.spatial_scale, W // cfgv.spatial_scale
        lat = (B, Fl, h, w, cfgv.latent_channels)
        batch = {
            "lq_latent": sds(lat),
            "hq_latent": sds(lat),
            "prompt_embeds": sds(
                (B, cfgd.max_text_seq_length, cfgd.text_embed_dim)),
        }
    else:
        batch = {
            "lq_video": sds((B, F, H, W, 3)),
            "hq_video": sds((B, F, H, W, 3)),
            "prompt_embeds": sds(
                (B, cfgd.max_text_seq_length, cfgd.text_embed_dim)),
        }
    rng = jax.random.PRNGKey(0)
    step = trainer.build_train_step()
    if hasattr(step, "lower"):
        lowerable = step
    else:  # stage-2 wraps the jitted base step in a host-side coin flip
        lowerable = trainer.__class__.__mro__[1].build_train_step(trainer)

    t0 = time.time()
    with trainer.mesh:
        compiled = lowerable.lower(
            trainer.trainable_params(), trainer.opt_state,
            trainer.frozen_params(), batch, rng,
        ).compile()
    compile_s = time.time() - t0

    m = compiled.memory_analysis()
    n_dev = len(jax.devices())
    params_bytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves(
            (trainer.trainable_params(), trainer.frozen_params()))
    )
    opt_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(trainer.opt_state)
    )
    cost = compiled.cost_analysis() or {}
    g = 1 << 30
    per_chip_total = (
        m.argument_size_in_bytes + m.temp_size_in_bytes
        + m.output_size_in_bytes
    )
    return {
        "mesh": dict(zip(trainer.mesh.axis_names,
                         (int(s) for s in trainer.mesh.devices.shape))),
        "resolution": list(a.train_resolution),
        "batch_size": B,
        "optimizer": a.optimizer,
        "training_type": a.training_type,
        "global_params_plus_frozen_gib": round(params_bytes / g, 2),
        "global_opt_state_gib": round(opt_bytes / g, 2),
        "per_chip_args_gib": round(m.argument_size_in_bytes / g, 2),
        "per_chip_temp_gib": round(m.temp_size_in_bytes / g, 2),
        "per_chip_output_gib": round(m.output_size_in_bytes / g, 2),
        "per_chip_total_gib": round(per_chip_total / g, 2),
        "fits_16g_v5e": bool(per_chip_total < 16 * g),
        "flops_per_step_global": float(cost.get("flops", 0.0)) * n_dev,
        "aot_compile_s": round(compile_s, 1),
    }


CONFIGS = {
    # published S1 recipe (train_ddp_one_s1.sh): SFT 5B, 25x320x640, bs2,
    # adamw, grad ckpt, --is_latent false (in-step no-grad VAE encode of
    # both 25x320x640 videos — the reference's own hardware for this is
    # 4xA100-80GB, README.md:173). Sharding candidates on a v5e-8:
    "s1_sft_fsdp8": dict(stage=1, training_type="sft", fsdp=8, tp=1,
                         data_parallel=1),
    "s1_sft_dp2_fsdp4": dict(stage=1, training_type="sft", fsdp=4, tp=1,
                             data_parallel=2),
    # same recipe trained from the latent cache (--is_latent true /
    # --is_cache true, reference real_sr_dataset.py:173-207 — identical
    # hyperparameters, VAE encode amortized into the cache pass): the
    # v5e-feasible configuration.
    "s1_sft_latent_fsdp8": dict(stage=1, training_type="sft", fsdp=8, tp=1,
                                data_parallel=1, latent=True),
    "s1_sft_latent_dp2_fsdp4": dict(stage=1, training_type="sft", fsdp=4,
                                    tp=1, data_parallel=2, latent=True),
    "s1_sft_latent_tp4_dp2": dict(stage=1, training_type="sft", fsdp=1,
                                  tp=4, data_parallel=2, latent=True),
    # LoRA r=128 variant of the same step (the reference script ships the
    # LoRA block commented out; measured for the mixed path)
    "s1_lora_latent_fsdp8": dict(stage=1, training_type="lora", fsdp=8,
                                 tp=1, data_parallel=1, latent=True),
    # published S2 recipe (train_ddp_one_s2.sh): SFT pixel-space stage,
    # 2x320x640, per-frame decode-with-grad — the memory-heavy loss; the
    # lq encode is per-frame and the decode-with-grad is the point, so
    # there is no latent-cache variant of this stage
    "s2_sft_dp2_fsdp4": dict(stage=2, training_type="sft", fsdp=4, tp=1,
                             data_parallel=2),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=",".join(CONFIGS))
    ap.add_argument("--resolution", default="25x320x640")
    ap.add_argument("--s2_resolution", default="2x320x640",
                    help="stage-2 geometry (train_ddp_one_s2.sh:31)")
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--optimizer", default="adamw")
    ap.add_argument("--rank", type=int, default=128)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import tempfile

    rows = {}
    if args.out and Path(args.out).exists():
        # merge-friendly: partial sweeps (one config at a time) accumulate
        rows = json.loads(Path(args.out).read_text()).get("rows", {})
    for name in args.configs.split(","):
        spec = CONFIGS[name]
        res = args.s2_resolution if spec["stage"] == 2 else args.resolution
        resolution = tuple(int(x) for x in res.split("x"))
        print(f"== {name} {spec} {resolution}", file=sys.stderr, flush=True)
        with tempfile.TemporaryDirectory() as td:
            try:
                trainer = build_trainer(
                    spec["stage"], spec["training_type"], spec["fsdp"],
                    spec["tp"], spec["data_parallel"], args.optimizer,
                    args.rank, resolution, args.batch_size, Path(td),
                )
                rows[name] = probe(trainer, latent=spec.get("latent", False))
                rows[name]["batch_inputs"] = (
                    "cached latents (is_latent/is_cache)"
                    if spec.get("latent") else "raw videos (in-step encode)"
                )
                del trainer
            except Exception as e:  # record instead of aborting the sweep
                rows[name] = {"error": f"{type(e).__name__}: {e}"}
            print(json.dumps({name: rows[name]}), file=sys.stderr, flush=True)

    out = {
        "host": "virtual 8-device CPU mesh (xla_force_host_platform_"
                "device_count) — CPU-backend memory accounting, see "
                "script header caveats",
        "recipe": "train_ddp_one_s1.sh / train_ddp_one_s2.sh parameters",
        "rows": rows,
    }
    print(json.dumps(out, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
