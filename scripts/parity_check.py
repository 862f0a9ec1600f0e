#!/usr/bin/env python
"""Numerical-parity harness: dove_tpu (JAX) vs PyTorch/diffusers goldens.

SURVEY.md §7 gates phases 3-4 on PSNR > 50 dB parity against the released
checkpoints. This tool makes that a one-command check once fixtures exist:

  1. On ANY machine with torch + diffusers + the released checkpoint, dump
     golden activations (fixed inputs, per-module outputs):

        python scripts/parity_dump_torch.py --model_path <ckpt> \
            --out fixtures_torch.npz

  2. Here, compare our JAX implementations module by module:

        python scripts/parity_check.py --check fixtures_torch.npz \
            --model_path <ckpt>

Self-test mode (no torch/diffusers/checkpoint needed — validates the harness
and documents the fixture format):

        python scripts/parity_check.py --make_fixtures /tmp/fx.npz --preset tiny
        python scripts/parity_check.py --check /tmp/fx.npz --preset tiny

Fixture format (single .npz; all arrays float32, dove_tpu conventions):
  meta            JSON string: {"preset"/"model_path", "timestep", notes}
  input_video     [1, F, H, W, 3] in [-1, 1]        (VAE encoder input)
  vae_moments     [1, F', h, w, 2C] mean|logvar      (encoder output)
  input_latent    [1, F', h, w, C] unscaled          (VAE decoder input)
  vae_decode_out  [1, F, H, W, 3] in [-1, 1]         (decoder output)
  dit_latent      [1, Fp, C, h, w]                   (DiT input, Fp % pt == 0)
  text_embeds     [1, L, text_dim]                   (T5 features)
  timestep        [] int                             (399 for DOVE)
  dit_out         [1, Fp, C, h, w]                   (velocity prediction)
  dit_block0_out  [1, S_vid, dim]                    (video tokens after block 0)
  sched_alphas    [num_train_timesteps]              (alpha-bar table)
  sched_x0        [1, Fp, C, h, w]                   (velocity_to_x0 of dit_out)

Conventions at risk that this harness pins down (VERDICT.md round 1):
  * causal 3D conv padding + cached-state chunking (vae_moments/vae_decode),
  * 3D RoPE "slice" grid (reference inference_script.py:364-392) via dit_out,
  * qk-layernorm/adaLN ordering via dit_block0_out,
  * the zero-terminal-SNR rescaled alpha-bar table via sched_alphas.
Known documented deviation: the feathered TILED VAE paths align sampling and
placement strides exactly (VAEConfig.tile_geometry) where diffusers drifts by
the rounding gap — fixtures therefore use UNTILED encode/decode.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax

# Honor JAX_PLATFORMS=cpu explicitly: the site TPU plugin overrides the env
# var after parsing (forces "axon,cpu"), so without this the tiny-preset
# self-tests silently run through the remote TPU tunnel — minutes of remote
# compile for fixtures a CPU computes in seconds (and chip contention).
import os as _os

if _os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

PSNR_BAR_DB = 50.0


# ---------------------------------------------------------------------------
# Fixed inputs (deterministic; both dump sides store inputs IN the fixture,
# so the check never regenerates them)
# ---------------------------------------------------------------------------

def make_inputs(cfg, geometry=(9, 64, 64)) -> dict[str, np.ndarray]:
    rng = np.random.default_rng(20260816)
    F, H, W = geometry
    Fl = cfg.vae.latent_frames(F)  # (F-1)//4 + 1
    h, w = H // cfg.vae.spatial_scale, W // cfg.vae.spatial_scale
    C = cfg.vae.latent_channels
    pt = cfg.dit.patch_size_t or 1
    Fp = Fl + (-Fl) % pt  # pad to patch_size_t multiple
    return {
        "input_video": rng.uniform(-1, 1, (1, F, H, W, 3)).astype(np.float32),
        "input_latent": rng.normal(0, 1, (1, Fl, h, w, C)).astype(np.float32),
        "dit_latent": rng.normal(0, 1, (1, Fp, cfg.dit.in_channels, h, w)).astype(
            np.float32
        ),
        "text_embeds": rng.normal(
            0, 1, (1, cfg.dit.max_text_seq_length, cfg.dit.text_embed_dim)
        ).astype(np.float32),
        "timestep": np.asarray(399, np.int64),
    }


# ---------------------------------------------------------------------------
# JAX forward passes (shared by --make_fixtures and --check)
# ---------------------------------------------------------------------------

def load_models(args):
    import jax.numpy as jnp

    from dove_tpu import config as cfg_mod

    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[args.dtype]
    if args.model_path:
        cfg = cfg_mod.pipeline_config_from_pretrained(args.model_path)
        from dove_tpu import weights

        dit_params = weights.load_dit(args.model_path, cfg.dit, dtype)
        vae_params = weights.load_vae(args.model_path, cfg.vae, dtype)
    else:
        import jax

        preset = {
            "tiny": cfg_mod.tiny_test,
            "cogvideox1.5-5b": cfg_mod.cogvideox1_5_5b,
            "cogvideox-2b": cfg_mod.cogvideox_2b,
        }[args.preset]
        cfg = preset()
        from dove_tpu.models.dit import init_dit_params
        from dove_tpu.models.vae import init_vae_params

        dit_params = init_dit_params(jax.random.PRNGKey(0), cfg.dit, dtype)
        vae_params = init_vae_params(jax.random.PRNGKey(1), cfg.vae, dtype)
    if args.quantize == "int8":
        # measure the int8 serving mode's drift against bf16/torch goldens
        from dove_tpu.ops.quant import quantize_dit, quantize_vae

        dit_params = quantize_dit(dit_params)
        vae_params = quantize_vae(vae_params)
    return cfg, dit_params, vae_params


def jax_outputs(cfg, dit_params, vae_params, inputs) -> dict[str, np.ndarray]:
    import jax
    import jax.numpy as jnp

    from dove_tpu.models import dit as dit_mod
    from dove_tpu.models import vae as vae_mod
    from dove_tpu.ops.rope import rope_3d
    from dove_tpu.ops.scheduler import Schedule

    dtype = jax.tree.leaves(dit_params)[0].dtype
    video = jnp.asarray(inputs["input_video"], dtype)
    latent = jnp.asarray(inputs["input_latent"], dtype)
    z = jnp.asarray(inputs["dit_latent"], dtype)
    text = jnp.asarray(inputs["text_embeds"], dtype)
    t = jnp.asarray([int(inputs["timestep"])], jnp.int32)

    out: dict[str, np.ndarray] = {}
    out["vae_moments"] = np.asarray(
        jax.jit(lambda v: vae_mod.encode_moments(cfg.vae, vae_params, v))(video),
        np.float32,
    )
    out["vae_decode_out"] = np.asarray(
        jax.jit(lambda l: vae_mod.decode(cfg.vae, vae_params, l))(latent),
        np.float32,
    )
    out["dit_out"] = np.asarray(
        jax.jit(
            lambda zz, tt: dit_mod.dit_forward(dit_params, cfg.dit, zz, text, tt)
        )(z, t),
        np.float32,
    )

    # Block-prefix taps: patchify + temb + rope, then the first n blocks
    # with per-layer params — localizes a numerics break to a block range
    # (block0 = the original tap; blocklast = the full pre-norm stack).
    def blocks_prefix(zz, tt, n_blocks: int):
        t_feat = dit_mod._timestep_embedding(
            tt, cfg.dit.hidden_dim, cfg.dit.flip_sin_to_cos, cfg.dit.freq_shift
        ).astype(zz.dtype)
        temb = dit_mod._linear(dit_params["time_embedding"]["linear_1"], t_feat)
        temb = jax.nn.silu(temb)
        temb = dit_mod._linear(dit_params["time_embedding"]["linear_2"], temb)
        hidden = dit_mod.patchify(cfg.dit, dit_params["patch_embed"], zz)
        encoder = dit_mod._linear(
            dit_params["patch_embed"]["text_proj"], text.astype(zz.dtype)
        )
        pt = cfg.dit.patch_size_t or 1
        grid = (
            zz.shape[1] // pt,
            zz.shape[3] // cfg.dit.patch_size,
            zz.shape[4] // cfg.dit.patch_size,
        )
        if cfg.dit.use_rotary_positional_embeddings:
            rope = rope_3d(
                cfg.dit.attention_head_dim, *grid, cfg.dit.rope_theta,
            )
        else:
            rope = None
            if "pos_embedding" in dit_params["patch_embed"]:
                # mirror models/dit.py: stored table at the sample grid,
                # recompute for any other geometry (diffusers semantics)
                sample_grid = (
                    (cfg.dit.sample_frames - 1)
                    // cfg.dit.temporal_compression_ratio + 1,
                    cfg.dit.sample_height // cfg.dit.patch_size,
                    cfg.dit.sample_width // cfg.dit.patch_size,
                )
                if grid == sample_grid:
                    pos = dit_params["patch_embed"]["pos_embedding"]
                    joint = jnp.concatenate([encoder, hidden], axis=1)
                    joint = joint + pos[:, : joint.shape[1]].astype(zz.dtype)
                    encoder = joint[:, : encoder.shape[1]]
                    hidden = joint[:, encoder.shape[1]:]
                else:
                    from dove_tpu.ops.sincos import get_3d_sincos_pos_embed

                    pos = get_3d_sincos_pos_embed(
                        cfg.dit.hidden_dim, grid[2], grid[1], grid[0],
                        cfg.dit.spatial_interpolation_scale,
                        cfg.dit.temporal_interpolation_scale,
                    ).reshape(1, -1, cfg.dit.hidden_dim)
                    hidden = hidden + jnp.asarray(pos, zz.dtype)
        for i in range(n_blocks):
            layer = jax.tree.map(lambda x: x[i], dit_params["blocks"])
            hidden, encoder = dit_mod._block(
                cfg.dit, layer, hidden, encoder, temb, rope, None, False,
                None, None,  # tp_axis, sp: single-device semantics
            )
        return hidden

    n_layers = jax.tree.leaves(dit_params["blocks"])[0].shape[0]
    out["dit_block0_out"] = np.asarray(
        jax.jit(lambda zz, tt: blocks_prefix(zz, tt, 1))(z, t), np.float32)
    out["dit_blocklast_out"] = np.asarray(
        jax.jit(lambda zz, tt: blocks_prefix(zz, tt, n_layers))(z, t),
        np.float32)

    schedule = Schedule.create(cfg.scheduler)
    out["sched_alphas"] = np.asarray(schedule.alphas_cumprod, np.float32)
    out["sched_x0"] = np.asarray(
        schedule.velocity_to_x0(
            jnp.asarray(out["dit_out"], jnp.float32),
            jnp.asarray(inputs["dit_latent"], jnp.float32),
            t,
        ),
        np.float32,
    )
    return out


# ---------------------------------------------------------------------------
# Comparison report
# ---------------------------------------------------------------------------

def _sha256(arr: np.ndarray) -> str:
    import hashlib

    return hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()


def _aux_outputs(args, fx: dict) -> dict[str, np.ndarray]:
    """Optional fixture sections beyond the VAE/DiT/scheduler core:
    T5 goldens (t5_ids/t5_out, from parity_dump_torch.py --t5) need a
    --model_path with a text_encoder; RAFT goldens (raft_images/raft_flow)
    need DOVE_RAFT_WEIGHTS. Sections absent from the fixture are skipped."""
    import os

    out: dict[str, np.ndarray] = {}
    if "t5_out" in fx and args.model_path:
        from pathlib import Path as _P

        if (_P(args.model_path) / "text_encoder").exists():
            import jax.numpy as jnp

            from dove_tpu.models.t5 import load_t5, t5_encode

            params, t5_cfg = load_t5(args.model_path, dtype=jnp.float32)
            out["t5_out"] = np.asarray(
                t5_encode(params, t5_cfg, jnp.asarray(fx["t5_ids"], jnp.int32)),
                np.float32,
            )
    if "raft_flow" in fx and os.environ.get("DOVE_RAFT_WEIGHTS"):
        import jax.numpy as jnp

        from dove_tpu.models.raft import load_raft, raft_flow

        params = load_raft(os.environ["DOVE_RAFT_WEIGHTS"])
        pair = fx["raft_images"]  # [2, 3, H, W] in [0, 255] (torch side)
        img1 = jnp.asarray(pair[:1].transpose(0, 2, 3, 1) / 255.0)
        img2 = jnp.asarray(pair[1:].transpose(0, 2, 3, 1) / 255.0)
        flow = raft_flow(params, img1, img2, iters=12)  # [1, H, W, 2]
        out["raft_flow"] = np.asarray(
            flow.transpose(0, 3, 1, 2), np.float32
        )
    return out


def compare(name: str, ours: np.ndarray, golden: np.ndarray, bar_db: float):
    ours = np.asarray(ours, np.float64)
    golden = np.asarray(golden, np.float64)
    if ours.shape != golden.shape:
        return {"module": name, "status": "SHAPE_MISMATCH",
                "ours": list(ours.shape), "golden": list(golden.shape)}
    rng_span = float(golden.max() - golden.min()) or 1.0
    mse = float(np.mean((ours - golden) ** 2))
    psnr = 200.0 if mse == 0 else 10.0 * np.log10(rng_span**2 / mse)
    max_abs = float(np.max(np.abs(ours - golden)))
    denom = np.maximum(np.abs(golden), 1e-6)
    rel = float(np.median(np.abs(ours - golden) / denom))
    return {
        "module": name,
        "psnr_db": round(float(psnr), 2),
        "max_abs": max_abs,
        "median_rel": rel,
        "status": "PASS" if psnr >= bar_db else "FAIL",
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--make_fixtures", type=str, default=None,
                    help="write a self-generated fixture npz (JAX side)")
    ap.add_argument("--check", type=str, default=None,
                    help="fixture npz to compare against")
    ap.add_argument("--model_path", type=str, default=None)
    ap.add_argument("--preset", type=str, default="tiny",
                    choices=["tiny", "cogvideox1.5-5b", "cogvideox-2b"])
    ap.add_argument("--dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--quantize", type=str, default=None, choices=["int8"],
                    help="check the int8 serving mode against the goldens "
                         "(quantifies quantization drift per module)")
    ap.add_argument("--psnr_bar", type=float, default=PSNR_BAR_DB)
    ap.add_argument("--report", type=str, default=None,
                    help="also write the JSON report here")
    args = ap.parse_args(argv)
    if not args.make_fixtures and not args.check:
        ap.error("need --make_fixtures and/or --check")

    cfg, dit_params, vae_params = load_models(args)
    inputs = make_inputs(cfg)

    if args.make_fixtures:
        outs = jax_outputs(cfg, dit_params, vae_params, inputs)
        meta = {
            "source": "dove_tpu-jax",
            "model_path": args.model_path,
            "preset": None if args.model_path else args.preset,
            "dtype": args.dtype,
            "timestep": int(inputs["timestep"]),
            "sha256": {
                k: _sha256(v) for k, v in {**inputs, **outs}.items()
            },
        }
        np.savez(args.make_fixtures, meta=json.dumps(meta), **inputs, **outs)
        print(f"wrote fixtures to {args.make_fixtures} "
              f"({', '.join(sorted(outs))})")

    if args.check:
        fx = dict(np.load(args.check, allow_pickle=False))
        meta = json.loads(str(fx.pop("meta"))) if "meta" in fx else {}
        if meta.get("versions"):
            print(f"fixture versions: {meta['versions']}", file=sys.stderr)
        # integrity: every stored array must match its recorded checksum
        for name, want in (meta.get("sha256") or {}).items():
            if name in fx and _sha256(fx[name]) != want:
                raise SystemExit(
                    f"fixture array '{name}' fails its sha256 checksum — "
                    f"the file is corrupted or was regenerated with "
                    f"different inputs; re-dump with parity_dump_torch.py"
                )
        fixture_inputs = {k: fx[k] for k in inputs if k in fx}
        missing = [k for k in inputs if k not in fx]
        if missing:
            raise SystemExit(f"fixture missing input arrays: {missing}")
        ours = jax_outputs(cfg, dit_params, vae_params, fixture_inputs)
        ours.update(_aux_outputs(args, fx))
        rows = []
        for name, mine in sorted(ours.items()):
            if name not in fx:
                rows.append({"module": name, "status": "NOT_IN_FIXTURE"})
                continue
            rows.append(compare(name, mine, fx[name], args.psnr_bar))
        report = {
            "fixture": args.check,
            "fixture_meta": meta,
            "psnr_bar_db": args.psnr_bar,
            "modules": rows,
            "pass": all(r.get("status") == "PASS" for r in rows),
        }
        print(json.dumps(report, indent=2))
        if args.report:
            Path(args.report).write_text(json.dumps(report, indent=2))
        if not report["pass"]:
            raise SystemExit(1)


if __name__ == "__main__":
    main()
