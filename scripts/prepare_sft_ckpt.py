#!/usr/bin/env python
"""Package a training run into a deployable diffusers-layout model folder.

Reference workflow (finetune/scripts/prepare_sft_ckpt.py:8-107): merge the
distributed checkpoint, rename weights to diffusers names, and graft the new
transformer onto a copy of the base CogVideoX folder. Here orbax already
stores consolidated (logically global) arrays, so the steps are: restore the
checkpoint -> export diffusers-layout transformer safetensors (SFT) or
peft-layout LoRA weights -> copy the base model's other components.

    python scripts/prepare_sft_ckpt.py \
        --run_dir train_results/s1 --step 10000 \
        --base_model pretrained_models/CogVideoX1.5-5B \
        --output_dir pretrained_models/DOVE-s1 \
        --training_type lora --model_name dove-s1
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", required=True)
    ap.add_argument("--step", type=int, default=None,
                    help="checkpoint step (default: newest)")
    ap.add_argument("--base_model", default=None,
                    help="base CogVideoX folder to graft onto (SFT)")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--training_type", choices=["lora", "sft"], default="sft")
    ap.add_argument("--base_preset", default="cogvideox1.5-5b")
    ap.add_argument("--rank", type=int, default=128)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from dove_tpu import config as cfg_mod
    from dove_tpu.train import checkpointing as ckpt

    run_dir = Path(args.run_dir)
    if args.step is not None:
        step, path = args.step, run_dir / f"checkpoint-{args.step}"
    else:
        latest = ckpt.latest_checkpoint(run_dir)
        if latest is None:
            sys.exit(f"no checkpoints under {run_dir}")
        step, path = latest
    print(f"restoring step {step} from {path}")

    if args.base_model and (Path(args.base_model) / "transformer" / "config.json").exists():
        cfg = cfg_mod.pipeline_config_from_pretrained(args.base_model)
    else:
        cfg = {
            "cogvideox1.5-5b": cfg_mod.cogvideox1_5_5b,
            "cogvideox-2b": cfg_mod.cogvideox_2b,
            "tiny": cfg_mod.tiny_test,
        }[args.base_preset]()

    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    if args.training_type == "lora":
        trainable = ckpt.restore_subtree(path, "trainable")
        ckpt.export_lora_safetensors(
            trainable, out_dir / "pytorch_lora_weights.safetensors"
        )
        print(f"wrote {out_dir / 'pytorch_lora_weights.safetensors'}")
        return

    trainable = ckpt.restore_subtree(path, "trainable")
    base_cfg = (
        Path(args.base_model) / "transformer" / "config.json"
        if args.base_model else None
    )
    ckpt.export_dit_safetensors(
        trainable, out_dir / "transformer",
        patch_size_t=cfg.dit.patch_size_t,
        base_config=base_cfg if base_cfg and base_cfg.exists() else None,
    )
    print(f"wrote {out_dir / 'transformer'}")

    if args.base_model:
        base = Path(args.base_model)
        for sub in ("vae", "scheduler", "tokenizer", "text_encoder"):
            src = base / sub
            dst = out_dir / sub
            if src.exists() and not dst.exists():
                shutil.copytree(src, dst)
                print(f"copied {sub}/ from base model")
        for f in ("model_index.json",):
            if (base / f).exists():
                shutil.copy(base / f, out_dir / f)


if __name__ == "__main__":
    main()
