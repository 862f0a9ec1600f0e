"""Training configuration schema (pydantic) + argparse bridge.

Mirrors the reference's ~70-field Args surface
(/root/reference/finetune/schemas/args.py:10-318) with TPU-native
substitutions: the accelerate/DeepSpeed/NCCL knobs (zero stage, nccl_timeout,
pin_memory) become mesh/sharding knobs (``data_parallel``, ``fsdp`` —
SURVEY.md §2.7's mapping table). Cross-field validators reproduce the
reference's checks (train_resolution format, validation requirements).
"""

from __future__ import annotations

import argparse
import datetime
from pathlib import Path
from typing import Any, List, Literal, Optional, Tuple

from pydantic import BaseModel, ValidationInfo, field_validator, model_validator


class Args(BaseModel):
    """All knobs for DOVE stage-1/stage-2 training."""

    ########## Model ##########
    model_path: Path
    model_name: str = "dove-s1"  # registry key: dove-s1 | dove-s2
    model_type: Literal["real-sr", "real-sr-image-video"] = "real-sr"
    training_type: Literal["lora", "sft"] = "lora"
    # architecture preset used when model_path has no transformer/config.json
    base_preset: str = "cogvideox1.5-5b"

    ########## Output ##########
    output_dir: Path = Path(
        "train_results/{:%Y-%m-%d-%H-%M-%S}".format(datetime.datetime.now())
    )
    # "wandb" writes a W&B-offline-layout run dir (train/tracking.py):
    # history/summary/config/media in wandb schemas + tfevents, importable
    # with `wandb sync --sync-tensorboard` (reference: trainer.py:485-493)
    report_to: Optional[Literal["tensorboard", "jsonl", "wandb", "all"]] = "jsonl"
    tracker_name: str = "VSR"

    ########## Data ##########
    data_root: Path = Path(".")
    image_data_root: Optional[Path] = None
    caption_column: Optional[Path] = None
    image_column: Optional[Path] = None
    video_column: Path = Path("videos.txt")

    ########## Training ##########
    resume_from_checkpoint: Optional[Path] = None
    seed: Optional[int] = 42
    train_epochs: int = 1
    train_steps: Optional[int] = None
    checkpointing_steps: int = 200
    checkpointing_limit: int = 10
    batch_size: int = 1
    gradient_accumulation_steps: int = 1
    train_resolution: Tuple[int, int, int] = (25, 320, 640)  # (F, H, W)
    # The reference accepts crop_mode but implements only random_crop
    # (real_sr_dataset.py:246-273 raises NotImplementedError otherwise);
    # we validate it up front instead of failing mid-epoch.
    crop_mode: Literal["random_crop"] = "random_crop"
    mixed_precision: Literal["no", "fp16", "bf16"] = "bf16"

    learning_rate: float = 2e-5
    optimizer: str = "adamw"
    beta1: float = 0.9
    beta2: float = 0.95
    beta3: float = 0.9999  # CAME confidence EMA (reference schemas/args.py)
    epsilon: float = 1e-8
    weight_decay: float = 1e-4
    max_grad_norm: float = 1.0

    lr_scheduler: str = "constant_with_warmup"
    lr_warmup_steps: int = 100
    lr_num_cycles: int = 1
    lr_power: float = 1.0

    num_workers: int = 8
    gradient_checkpointing: bool = True
    enable_slicing: bool = True
    enable_tiling: bool = False
    stastic_frequency: int = 100  # (sic) reference spelling, kept for parity

    ########## Parallelism (TPU mesh; replaces DDP/ZeRO/NCCL) ##########
    data_parallel: int = 0  # 0 = all devices on the data axis
    fsdp: int = 1  # size of the "model" axis (param/optimizer sharding)
    # Megatron-style tensor parallelism for the DiT over the "model" axis
    # (parallel/tp.py): shards the per-step DiT compute, not just storage.
    # Mutually exclusive with fsdp>1 (both own the "model" axis).
    tensor_parallel: int = 1
    # run jax.distributed.initialize() at startup (multi-node analog of the
    # reference's `accelerate launch --multi_gpu` over NCCL)
    multihost: bool = False

    ########## LoRA ##########
    rank: int = 128
    lora_alpha: int = 64
    target_modules: List[str] = ["to_q", "to_k", "to_v", "to_out.0"]

    ########## Validation ##########
    do_validation: bool = False
    validation_steps: Optional[int] = None
    validation_dir: Optional[Path] = None
    validation_videos: Optional[str] = None
    validation_ref_videos: Optional[str] = None
    gen_fps: int = 16
    num_inference_steps: int = 1
    eval_metric_list: str = ""  # e.g. "psnr,ssim"

    ########## SR specifics ##########
    is_latent: bool = False
    is_prompt_latent: bool = False
    is_cache: bool = True
    prompt_cache: str = "prompt_embeddings"
    empty_prompt: bool = True
    empty_ratio: float = 1.0
    sr_noise_step: int = 399
    noise_step: int = 0
    degradation_config: str = "configs/degradation.yaml"
    image_ratio: float = 0.0  # stage 2: probability of training on the image pair
    # Optical-flow toolkit (reference args.py:100-101). Like the reference,
    # use_optical_flow only LOADS the frozen RAFT (models/flow_fusion.py is
    # the consumer library; no released recipe wires it into a loss).
    use_optical_flow: bool = False
    is_learnable_fuse: bool = False
    raft_weights: Optional[Path] = None  # raft-things.pth (torch state dict)

    ########## Stage-2 losses ##########
    use_perceptual_loss: bool = False
    # Explicit opt-in to train the perceptual term on RANDOM VGG features
    # when no pretrained DISTS/LPIPS weights are available (otherwise error).
    allow_random_perceptual: bool = False
    ea_dists_weight: float = 0.0
    dists_weight: float = 0.0
    ea_lpips_weight: float = 0.0
    lpips_weight: float = 0.0
    frame_diff_weight: float = 0.0

    @field_validator("train_resolution", mode="before")
    @classmethod
    def _parse_resolution(cls, v: Any) -> Tuple[int, int, int]:
        if isinstance(v, str):
            parts = v.split("x")
            if len(parts) != 3:
                raise ValueError(
                    "train_resolution must be FxHxW, e.g. 25x320x640"
                )
            return tuple(int(p) for p in parts)  # type: ignore[return-value]
        return tuple(v)  # type: ignore[return-value]

    @field_validator("train_resolution")
    @classmethod
    def _check_resolution(cls, v: Tuple[int, int, int]) -> Tuple[int, int, int]:
        f, h, w = v
        if h % 16 or w % 16:
            raise ValueError(f"H and W must be multiples of 16, got {h}x{w}")
        return v

    @model_validator(mode="after")
    def _check_frame_rule(self) -> "Args":
        # Stage 2 encodes PER FRAME (each frame an independent 1-frame clip,
        # reference lora_one_s2_trainer.py:141-145), so any F >= 1 is legal —
        # the published S2 recipe is 2x320x640 (train_ddp_one_s2.sh:31).
        # Clip-level encode (stage 1) needs the causal-VAE frame rule.
        f = self.train_resolution[0]
        if not self.model_name.endswith("s2") and (f - 1) % 4 != 0:
            raise ValueError(
                f"frames must satisfy (F-1)%4==0 for clip-level VAE encode, "
                f"got {f} (stage-2 trainers encode per frame and accept any F)"
            )
        return self

    @model_validator(mode="after")
    def _check_validation(self) -> "Args":
        if self.do_validation and not self.validation_dir:
            raise ValueError("do_validation requires validation_dir")
        if self.model_type == "real-sr-image-video" and self.image_column is None:
            raise ValueError("real-sr-image-video needs image_column")
        for name in ("sr_noise_step", "noise_step"):
            t = getattr(self, name)
            if not 0 <= t < 1000:  # CogVideoX scheduler table length
                raise ValueError(
                    f"{name}={t} outside [0, 1000) — the traced scheduler "
                    "gather would silently clamp it"
                )
        if self.tensor_parallel > 1 and self.fsdp > 1:
            raise ValueError(
                "tensor_parallel and fsdp both shard over the 'model' mesh "
                "axis — use one (tensor_parallel already shards the DiT "
                "params and optimizer moments like fsdp does)"
            )
        return self

    # ------------------------------------------------------------------
    # argparse bridge (reference: Args.parse_args)
    # ------------------------------------------------------------------

    @classmethod
    def parse_args(cls, argv: list[str] | None = None) -> "Args":
        parser = argparse.ArgumentParser(description="DOVE-TPU training")
        for name, field in cls.model_fields.items():
            arg = f"--{name}"
            ann = str(field.annotation)
            if field.annotation is bool or ann == "<class 'bool'>":
                parser.add_argument(
                    arg, type=lambda s: s.lower() in ("1", "true", "yes"),
                    default=None,
                )
            elif "List" in ann or "list" in ann:
                parser.add_argument(arg, nargs="*", default=None)
            else:
                parser.add_argument(arg, type=str, default=None)
        ns = parser.parse_args(argv)
        overrides = {k: v for k, v in vars(ns).items() if v is not None}
        return cls(**overrides)

    def dump_yaml(self, path: str | Path) -> None:
        import yaml

        data = {
            k: (str(v) if isinstance(v, Path) else v)
            for k, v in self.model_dump().items()
        }
        Path(path).write_text(yaml.safe_dump(data, sort_keys=False))
