"""LoRA as a functional parameter-tree overlay.

The reference trains LoRA adapters on the DiT attention projections
(target_modules=["to_q","to_k","to_v","to_out.0"], trainer.py:308-345) via
peft. Here LoRA is a small separate pytree {target: {"A": [L, in, r],
"B": [L, r, out]}} (stacked over the scanned layer axis); ``apply_lora``
produces the effective DiT tree with W + scale * A@B fused — a pure function,
so ``jax.grad`` w.r.t. the LoRA tree alone gives adapter training for free.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from dove_tpu.config import DiTConfig

TARGETS = ("to_q", "to_k", "to_v", "to_out")


def init_lora_params(
    key: jax.Array,
    cfg: DiTConfig,
    rank: int = 128,
    dtype=jnp.float32,
) -> dict[str, Any]:
    """A ~ N(0, 1/r) (kaiming-ish), B = 0 so training starts at identity."""
    d = cfg.hidden_dim
    L = cfg.num_layers
    tree: dict[str, Any] = {}
    for i, t in enumerate(TARGETS):
        k = jax.random.fold_in(key, i)
        tree[t] = {
            "A": jax.random.normal(k, (L, d, rank), dtype) / math.sqrt(d),
            "B": jnp.zeros((L, rank, d), dtype),
        }
    return tree


def apply_lora(
    dit_params: dict[str, Any],
    lora: dict[str, Any],
    scale: float = 1.0,
) -> dict[str, Any]:
    """Effective params: attention kernels get += scale * A @ B (per layer)."""
    attn = dict(dit_params["blocks"]["attn1"])
    for t, ab in lora.items():
        base = attn[t]["kernel"]  # [L, in, out]
        delta = jnp.einsum(
            "lir,lro->lio", ab["A"].astype(jnp.float32), ab["B"].astype(jnp.float32)
        ) * scale
        attn[t] = {**attn[t], "kernel": (base.astype(jnp.float32) + delta).astype(base.dtype)}
    blocks = {**dit_params["blocks"], "attn1": attn}
    return {**dit_params, "blocks": blocks}


def lora_param_count(lora: dict[str, Any]) -> int:
    return sum(x.size for x in jax.tree.leaves(lora))
