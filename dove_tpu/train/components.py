"""Typed Components / State bags — reference public-API parity.

The reference exposes two pydantic bags (`finetune/schemas/components.py`,
`finetune/schemas/state.py`) that its Trainer fills in `load_components` /
`_init_distributed` and that user code reads (`trainer.components.transformer`,
`trainer.state.weight_dtype`, ...).  In this framework the same capability
lives in functional form — param *trees* instead of nn.Modules, a PRNG key
instead of a torch.Generator, a jax mesh instead of DeepSpeed — so the bags
here are typed, read-only VIEWS assembled from the live Trainer attributes
(`Trainer.components` / `Trainer.state` properties).  Field names follow the
reference one-for-one; the docstrings say what each maps to on TPU.

Reference: finetune/schemas/components.py:6-28, finetune/schemas/state.py:9-30.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any

__all__ = ["Components", "State"]


@dataclasses.dataclass(frozen=True)
class Components:
    """Model pieces (reference Components, components.py:6-28).

    torch nn.Modules become JAX param trees + the pure functions in
    ``dove_tpu.models``; fields the reference keeps for other model families
    (tokenizer_2/3, text_encoder_2/3, unet) stay ``None`` for DOVE exactly as
    they do upstream.
    """

    pipeline_cls: type | None = None      # DovePipeline
    tokenizer: Any = None                 # dove_tpu.models.t5.T5Tokenizer | None
    tokenizer_2: Any = None
    tokenizer_3: Any = None
    text_encoder: Any = None              # T5 PromptEncoder | None (empty-prompt path)
    text_encoder_2: Any = None
    text_encoder_3: Any = None
    vae: Any = None                       # VAE param tree
    transformer: Any = None               # DiT base param tree
    unet: Any = None                      # no unet model family in DOVE
    scheduler: Any = None                 # ops.scheduler.Schedule (alpha-bar algebra)


@dataclasses.dataclass(frozen=True)
class State(object):
    """Run state (reference State, state.py:9-30), TPU equivalents:

    * ``weight_dtype``: a jnp dtype (torch.dtype upstream);
    * ``generator``: the trainer's jax PRNG key (torch.Generator upstream);
    * ``using_deepspeed`` -> ``using_fsdp``: parameter/optimizer sharding is a
      NamedSharding tree over the mesh's "model" axis, the ZeRO-2/3 analog.
      The reference name is kept as an alias property so user code reading
      ``state.using_deepspeed`` keeps working.
    """

    train_frames: int = 0
    train_height: int = 0
    train_width: int = 0
    transformer_config: dict[str, Any] | None = None
    weight_dtype: Any = None
    num_trainable_parameters: int = 0
    overwrote_max_train_steps: bool = False
    num_update_steps_per_epoch: int = 0
    total_batch_size_count: int = 0
    generator: Any = None
    validation_videos: list[str] = dataclasses.field(default_factory=list)
    validation_ref_videos: list[Path | None] = dataclasses.field(default_factory=list)
    validation_prompts: list[Path | None] = dataclasses.field(default_factory=list)
    validation_images: list[Path | None] = dataclasses.field(default_factory=list)
    using_fsdp: bool = False

    @property
    def using_deepspeed(self) -> bool:  # reference-name alias
        return self.using_fsdp
