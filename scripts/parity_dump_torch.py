#!/usr/bin/env python
"""Golden-activation dumper for the parity harness — TORCH SIDE.

Run this on any machine that has torch + diffusers + the released DOVE /
CogVideoX checkpoint (it deliberately imports nothing from dove_tpu):

    python scripts/parity_dump_torch.py --model_path <ckpt_dir> \
        --out fixtures_torch.npz [--device cuda] [--dtype float32]

Then compare on the TPU side with:

    python scripts/parity_check.py --check fixtures_torch.npz \
        --model_path <ckpt_dir>

Inputs are generated from a fixed NumPy seed AND stored in the fixture, so
the check side never regenerates them. All arrays are stored in dove_tpu
conventions (channels-last video/moments/latents; DiT tensors [B, F, C, h, w])
— see the format table in scripts/parity_check.py.

Module taps mirror the reference's usage exactly:
  * VAE encode/decode:  vae.encode(...).latent_dist.parameters, vae.decode
    (raw, unscaled latents on both sides — no scaling_factor anywhere);
  * DiT full forward: transformer(hidden, text, t=399, image_rotary_emb)
    with the reference's rope prep (inference_script.py:364-392, 460-489:
    get_3d_rotary_pos_embed(grid_type="slice", max_size=grid));
  * DiT block 0: forward hook on transformer_blocks[0];
  * scheduler: alphas_cumprod table and get_velocity(pred, latent, t) — the
    reference's x-hat_0 formula (inference_script.py:491).
"""

from __future__ import annotations

import argparse
import json

import numpy as np
import torch


def make_inputs(vae_cfg, tf_cfg) -> dict[str, np.ndarray]:
    """MUST match scripts/parity_check.py:make_inputs bit for bit."""
    rng = np.random.default_rng(20260816)
    F, H, W = 9, 64, 64
    t_ratio = int(vae_cfg.temporal_compression_ratio)
    spatial = 2 ** (len(vae_cfg.block_out_channels) - 1)
    Fl = (F - 1) // t_ratio + 1
    h, w = H // spatial, W // spatial
    C = int(vae_cfg.latent_channels)
    pt = getattr(tf_cfg, "patch_size_t", None) or 1
    Fp = Fl + (-Fl) % pt
    in_ch = int(tf_cfg.in_channels)
    L = int(tf_cfg.max_text_seq_length)
    text_dim = int(getattr(tf_cfg, "text_embed_dim", 4096))
    return {
        "input_video": rng.uniform(-1, 1, (1, F, H, W, 3)).astype(np.float32),
        "input_latent": rng.normal(0, 1, (1, Fl, h, w, C)).astype(np.float32),
        "dit_latent": rng.normal(0, 1, (1, Fp, in_ch, h, w)).astype(np.float32),
        "text_embeds": rng.normal(0, 1, (1, L, text_dim)).astype(np.float32),
        "timestep": np.asarray(399, np.int64),
    }


def _sha256(arr: np.ndarray) -> str:
    import hashlib

    return hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()


def _versions() -> dict:
    """Record the dump environment so the check side can flag drift.

    KNOWN-GOOD pins (the combination this harness was authored against —
    newer diffusers occasionally changes CogVideoX internals):
      torch>=2.4, diffusers==0.31.*, numpy>=1.26, transformers>=4.44.
    """
    vs = {"numpy": np.__version__, "torch": torch.__version__}
    for mod in ("diffusers", "transformers"):
        try:
            vs[mod] = __import__(mod).__version__
        except Exception:
            vs[mod] = None
    return vs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--device", default="cpu")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--t5", action="store_true",
                    help="also dump T5 text-encoder goldens (t5_ids/t5_out) "
                         "from <model_path>/text_encoder + /tokenizer")
    ap.add_argument("--raft_repo", default=None,
                    help="path to a checkout containing the torch RAFT "
                         "(e.g. the DOVE repo's basicsr/dove/archs dir); "
                         "enables raft_flow goldens with --raft_weights")
    ap.add_argument("--raft_weights", default=None,
                    help="raft-things.pth for the RAFT golden section")
    args = ap.parse_args()

    from diffusers import AutoencoderKLCogVideoX, CogVideoXTransformer3DModel
    from diffusers.models.embeddings import get_3d_rotary_pos_embed
    from diffusers.schedulers import CogVideoXDPMScheduler

    dtype = {"float32": torch.float32, "bfloat16": torch.bfloat16}[args.dtype]
    dev = torch.device(args.device)

    vae = AutoencoderKLCogVideoX.from_pretrained(
        args.model_path, subfolder="vae", torch_dtype=dtype
    ).to(dev).eval()
    transformer = CogVideoXTransformer3DModel.from_pretrained(
        args.model_path, subfolder="transformer", torch_dtype=dtype
    ).to(dev).eval()
    scheduler = CogVideoXDPMScheduler.from_pretrained(
        args.model_path, subfolder="scheduler"
    )

    inputs = make_inputs(vae.config, transformer.config)
    out: dict[str, np.ndarray] = {}

    with torch.no_grad():
        # --- VAE encode: ours is [B,F,H,W,3]; diffusers wants [B,3,F,H,W]
        video = torch.from_numpy(inputs["input_video"]).permute(0, 4, 1, 2, 3)
        moments = vae.encode(video.to(dev, dtype)).latent_dist.parameters
        out["vae_moments"] = (
            moments.float().permute(0, 2, 3, 4, 1).cpu().numpy()
        )
        vae._clear_fake_context_parallel_cache() if hasattr(
            vae, "_clear_fake_context_parallel_cache") else None

        # --- VAE decode (raw latent, no scaling): [B,F',h,w,C] -> [B,C,F',h,w]
        latent = torch.from_numpy(inputs["input_latent"]).permute(0, 4, 1, 2, 3)
        decoded = vae.decode(latent.to(dev, dtype)).sample
        out["vae_decode_out"] = (
            decoded.float().permute(0, 2, 3, 4, 1).cpu().numpy()
        )

        # --- DiT forward at t=399 with the reference's rope prep
        tf_cfg = transformer.config
        z = torch.from_numpy(inputs["dit_latent"]).to(dev, dtype)  # [B,F,C,h,w]
        text = torch.from_numpy(inputs["text_embeds"]).to(dev, dtype)
        t = torch.full((1,), int(inputs["timestep"]), dtype=torch.long,
                       device=dev)
        rope = None
        if tf_cfg.use_rotary_positional_embeddings:
            p = tf_cfg.patch_size
            grid_h, grid_w = z.shape[3] // p, z.shape[4] // p
            pt = getattr(tf_cfg, "patch_size_t", None)
            base_frames = (
                z.shape[1] if pt is None else (z.shape[1] + pt - 1) // pt
            )
            rope = get_3d_rotary_pos_embed(
                embed_dim=tf_cfg.attention_head_dim,
                crops_coords=None,
                grid_size=(grid_h, grid_w),
                temporal_size=base_frames,
                grid_type="slice",
                max_size=(grid_h, grid_w),
                device=dev,
            )

        block0_tap = {}

        def hook(_mod, _inp, output):
            # CogVideoXBlock returns (hidden_states, encoder_hidden_states)
            block0_tap["hidden"] = output[0].detach()

        handle = transformer.transformer_blocks[0].register_forward_hook(hook)
        pred = transformer(
            hidden_states=z,
            encoder_hidden_states=text,
            timestep=t,
            image_rotary_emb=rope,
            return_dict=False,
        )[0]
        handle.remove()
        out["dit_out"] = pred.float().cpu().numpy()
        out["dit_block0_out"] = block0_tap["hidden"].float().cpu().numpy()

        # --- scheduler: alpha-bar table + the x-hat_0-via-get_velocity trick
        out["sched_alphas"] = (
            scheduler.alphas_cumprod.float().cpu().numpy().astype(np.float32)
        )
        x0 = scheduler.get_velocity(
            pred.float().cpu(),
            torch.from_numpy(inputs["dit_latent"]),
            t.cpu(),
        )
        out["sched_x0"] = x0.numpy().astype(np.float32)

    # --- optional T5 text-encoder goldens --------------------------------
    if args.t5:
        from transformers import AutoTokenizer, T5EncoderModel

        tok = AutoTokenizer.from_pretrained(f"{args.model_path}/tokenizer")
        t5 = T5EncoderModel.from_pretrained(
            f"{args.model_path}/text_encoder", torch_dtype=dtype
        ).to(dev).eval()
        L = int(getattr(tf_cfg, "max_text_seq_length", 226))
        prompts = ["", "a cat playing piano on a rainy stage"]
        ids = tok(prompts, padding="max_length", max_length=L,
                  truncation=True, add_special_tokens=True,
                  return_tensors="pt").input_ids
        with torch.no_grad():
            # reference convention: input_ids only, no attention mask
            # (lora_one_s1_trainer.py:83, inference_script.py:440)
            feats = t5(ids.to(dev))[0]
        out["t5_ids"] = ids.cpu().numpy().astype(np.int32)
        out["t5_out"] = feats.float().cpu().numpy()

    # --- optional RAFT goldens -------------------------------------------
    if args.raft_weights:
        import sys as _sys

        if args.raft_repo:
            _sys.path.insert(0, args.raft_repo)
        from raft import RAFT  # the torch RAFT module in --raft_repo

        class _A:  # RAFT's argparse shim
            small = False
            mixed_precision = False
            alternate_corr = False

        raft = RAFT(_A())
        sd = torch.load(args.raft_weights, map_location="cpu")
        raft.load_state_dict(
            {k.replace("module.", ""): v for k, v in sd.items()}
        )
        raft = raft.to(dev).eval()
        rng = np.random.default_rng(20260816 + 1)
        pair = rng.random((2, 3, 64, 96), np.float32) * 255.0
        with torch.no_grad():
            _, flow = raft(
                torch.from_numpy(pair[:1]).to(dev),
                torch.from_numpy(pair[1:]).to(dev),
                iters=12, test_mode=True,
            )
        out["raft_images"] = pair
        out["raft_flow"] = flow.cpu().numpy()

    meta = {
        "source": "torch-diffusers",
        "model_path": args.model_path,
        "dtype": args.dtype,
        "timestep": int(inputs["timestep"]),
        "versions": _versions(),
        "sha256": {k: _sha256(v) for k, v in {**inputs, **out}.items()},
    }
    np.savez(args.out, meta=json.dumps(meta), **inputs, **out)
    print(f"wrote golden fixtures to {args.out} ({', '.join(sorted(out))})")


if __name__ == "__main__":
    main()
