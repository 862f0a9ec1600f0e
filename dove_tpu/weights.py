"""Checkpoint loading: released diffusers safetensors -> dove_tpu param trees.

The reference consumes the published CogVideoX/DOVE checkpoints through
diffusers ``from_pretrained`` (SURVEY.md §2.2). Here we read the same
safetensors shards directly and convert:

  * torch Linear [out, in]      -> JAX kernel [in, out]
  * torch Conv2d [O, I, kH, kW] -> [kH, kW, I, O]
  * torch Conv3d [O, I, kT, kH, kW] -> [kT, kH, kW, I, O]
  * per-layer transformer blocks  -> stacked along a leading layer axis
    (the DiT runs its block stack under lax.scan).

Key names below mirror the diffusers module paths so parity against the
released weights is auditable key-by-key.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Callable

import jax.numpy as jnp
import numpy as np

from dove_tpu.config import DiTConfig, VAEConfig

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Raw tensor loading
# ---------------------------------------------------------------------------

def load_safetensors_dir(subdir: str | Path) -> dict[str, np.ndarray]:
    """Load all tensors from a diffusers model subfolder (sharded or single).

    bf16 tensors are returned as ml_dtypes bfloat16 numpy arrays.
    """
    from safetensors import safe_open

    subdir = Path(subdir)
    index_files = sorted(subdir.glob("*.safetensors.index.json"))
    if len(index_files) > 1:
        # fp32 + fp16 variant checkpoints each ship their own index; which
        # one a bare glob picks is filesystem-order dependent — make the
        # caller choose
        raise ValueError(
            f"{subdir} has {len(index_files)} shard indexes "
            f"({[f.name for f in index_files]}) — keep one variant or load "
            "its shards explicitly"
        )
    if index_files:
        index = json.loads(index_files[0].read_text())
        shard_names = sorted(set(index["weight_map"].values()))
        files = [subdir / s for s in shard_names]
    else:
        files = sorted(subdir.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no safetensors files under {subdir}")

    tensors: dict[str, np.ndarray] = {}
    for f in files:
        with safe_open(str(f), framework="np") as fp:
            for k in fp.keys():
                if k in tensors:  # un-indexed variant files overlap keys
                    raise ValueError(
                        f"duplicate tensor {k!r} across files in {subdir} "
                        "(multiple precision variants?) — keep one variant"
                    )
                tensors[k] = fp.get_tensor(k)
    return tensors


def _linear(t: dict[str, np.ndarray], prefix: str, dtype) -> Params:
    p = {"kernel": jnp.asarray(t[f"{prefix}.weight"].T, dtype)}
    if f"{prefix}.bias" in t:
        p["bias"] = jnp.asarray(t[f"{prefix}.bias"], dtype)
    return p


def _ln(t: dict[str, np.ndarray], prefix: str, dtype) -> Params:
    return {
        "scale": jnp.asarray(t[f"{prefix}.weight"], dtype),
        "bias": jnp.asarray(t[f"{prefix}.bias"], dtype),
    }


def _conv3d(t: dict[str, np.ndarray], prefix: str, dtype) -> Params:
    w = t[f"{prefix}.weight"]
    p = {"kernel": jnp.asarray(np.transpose(w, (2, 3, 4, 1, 0)), dtype)}
    if f"{prefix}.bias" in t:
        p["bias"] = jnp.asarray(t[f"{prefix}.bias"], dtype)
    return p


def _conv2d(t: dict[str, np.ndarray], prefix: str, dtype) -> Params:
    w = t[f"{prefix}.weight"]
    p = {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), dtype)}
    if f"{prefix}.bias" in t:
        p["bias"] = jnp.asarray(t[f"{prefix}.bias"], dtype)
    return p


# ---------------------------------------------------------------------------
# DiT
# ---------------------------------------------------------------------------

def convert_dit(
    tensors: dict[str, np.ndarray], cfg: DiTConfig, dtype=jnp.bfloat16
) -> Params:
    """diffusers CogVideoXTransformer3DModel state dict -> dove_tpu DiT tree."""

    # Blocks assemble HOST-SIDE (numpy views) and transfer once per stacked
    # leaf: materializing per-layer device arrays and a device-side stack
    # simultaneously would hold ~2x the block weights in HBM (~20 GB at 5B
    # bf16 — more than a v5e chip) before anything runs.
    def np_leaf(prefix: str, kind: str) -> Params:
        if kind == "linear":
            p = {"kernel": tensors[f"{prefix}.weight"].T}
            if f"{prefix}.bias" in tensors:
                p["bias"] = tensors[f"{prefix}.bias"]
            return p
        return {
            "scale": tensors[f"{prefix}.weight"],
            "bias": tensors[f"{prefix}.bias"],
        }

    def block(i: int) -> Params:
        b = f"transformer_blocks.{i}"
        return {
            "norm1": {
                "linear": np_leaf(f"{b}.norm1.linear", "linear"),
                "norm": np_leaf(f"{b}.norm1.norm", "ln"),
            },
            "attn1": {
                "to_q": np_leaf(f"{b}.attn1.to_q", "linear"),
                "to_k": np_leaf(f"{b}.attn1.to_k", "linear"),
                "to_v": np_leaf(f"{b}.attn1.to_v", "linear"),
                "to_out": np_leaf(f"{b}.attn1.to_out.0", "linear"),
                "norm_q": np_leaf(f"{b}.attn1.norm_q", "ln"),
                "norm_k": np_leaf(f"{b}.attn1.norm_k", "ln"),
            },
            "norm2": {
                "linear": np_leaf(f"{b}.norm2.linear", "linear"),
                "norm": np_leaf(f"{b}.norm2.norm", "ln"),
            },
            "ff": {
                "net_0_proj": np_leaf(f"{b}.ff.net.0.proj", "linear"),
                "net_2": np_leaf(f"{b}.ff.net.2", "linear"),
            },
        }

    blocks = [block(i) for i in range(cfg.num_layers)]
    import jax

    stacked = jax.tree.map(
        lambda *xs: jnp.asarray(np.stack(xs), dtype), *blocks
    )

    if cfg.patch_size_t is None:
        proj = _conv2d(tensors, "patch_embed.proj", dtype)
    else:
        proj = _linear(tensors, "patch_embed.proj", dtype)

    patch_embed: Params = {
        "proj": proj,
        "text_proj": _linear(tensors, "patch_embed.text_proj", dtype),
    }
    if "patch_embed.pos_embedding" in tensors:
        patch_embed["pos_embedding"] = jnp.asarray(
            tensors["patch_embed.pos_embedding"], dtype
        )
    elif not cfg.use_rotary_positional_embeddings:
        from dove_tpu.ops.sincos import get_3d_sincos_pos_embed

        t_frames = (cfg.sample_frames - 1) // cfg.temporal_compression_ratio + 1
        pos = get_3d_sincos_pos_embed(
            cfg.hidden_dim,
            cfg.sample_width // cfg.patch_size,
            cfg.sample_height // cfg.patch_size,
            t_frames,
            cfg.spatial_interpolation_scale,
            cfg.temporal_interpolation_scale,
        ).reshape(1, -1, cfg.hidden_dim)
        text_zeros = np.zeros((1, cfg.max_text_seq_length, cfg.hidden_dim))
        patch_embed["pos_embedding"] = jnp.asarray(
            np.concatenate([text_zeros, pos], axis=1), dtype
        )

    return {
        "patch_embed": patch_embed,
        "time_embedding": {
            "linear_1": _linear(tensors, "time_embedding.linear_1", dtype),
            "linear_2": _linear(tensors, "time_embedding.linear_2", dtype),
        },
        "blocks": stacked,
        "norm_final": _ln(tensors, "norm_final", dtype),
        "norm_out": {
            "linear": _linear(tensors, "norm_out.linear", dtype),
            "norm": _ln(tensors, "norm_out.norm", dtype),
        },
        "proj_out": _linear(tensors, "proj_out", dtype),
    }


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def convert_vae(
    tensors: dict[str, np.ndarray], cfg: VAEConfig, dtype=jnp.bfloat16
) -> Params:
    """diffusers AutoencoderKLCogVideoX state dict -> dove_tpu VAE tree."""

    def gn_or_spatial(prefix: str, spatial: bool) -> Params:
        if not spatial:
            return _ln(tensors, prefix, dtype)
        return {
            "norm_layer": _ln(tensors, f"{prefix}.norm_layer", dtype),
            "conv_y": _conv3d(tensors, f"{prefix}.conv_y.conv", dtype),
            "conv_b": _conv3d(tensors, f"{prefix}.conv_b.conv", dtype),
        }

    def resnet(prefix: str, spatial: bool) -> Params:
        p = {
            "norm1": gn_or_spatial(f"{prefix}.norm1", spatial),
            "conv1": _conv3d(tensors, f"{prefix}.conv1.conv", dtype),
            "norm2": gn_or_spatial(f"{prefix}.norm2", spatial),
            "conv2": _conv3d(tensors, f"{prefix}.conv2.conv", dtype),
        }
        if f"{prefix}.conv_shortcut.weight" in tensors:
            p["conv_shortcut"] = _conv3d(tensors, f"{prefix}.conv_shortcut", dtype)
        return p

    n = len(cfg.block_out_channels)

    down_blocks = []
    for i in range(n):
        bp: Params = {
            "resnets": [
                resnet(f"encoder.down_blocks.{i}.resnets.{j}", False)
                for j in range(cfg.layers_per_block)
            ]
        }
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in tensors:
            bp["downsampler"] = {
                "conv": _conv2d(tensors, f"encoder.down_blocks.{i}.downsamplers.0.conv", dtype)
            }
        down_blocks.append(bp)

    encoder = {
        "conv_in": _conv3d(tensors, "encoder.conv_in.conv", dtype),
        "down_blocks": down_blocks,
        "mid_block": {
            "resnets": [resnet(f"encoder.mid_block.resnets.{j}", False) for j in range(2)]
        },
        "norm_out": _ln(tensors, "encoder.norm_out", dtype),
        "conv_out": _conv3d(tensors, "encoder.conv_out.conv", dtype),
    }

    up_blocks = []
    for i in range(n):
        bp = {
            "resnets": [
                resnet(f"decoder.up_blocks.{i}.resnets.{j}", True)
                for j in range(cfg.layers_per_block + 1)
            ]
        }
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in tensors:
            bp["upsampler"] = {
                "conv": _conv2d(tensors, f"decoder.up_blocks.{i}.upsamplers.0.conv", dtype)
            }
        up_blocks.append(bp)

    decoder = {
        "conv_in": _conv3d(tensors, "decoder.conv_in.conv", dtype),
        "mid_block": {
            "resnets": [resnet(f"decoder.mid_block.resnets.{j}", True) for j in range(2)]
        },
        "up_blocks": up_blocks,
        "norm_out": gn_or_spatial("decoder.norm_out", True),
        "conv_out": _conv3d(tensors, "decoder.conv_out.conv", dtype),
    }

    return {"encoder": encoder, "decoder": decoder}


# ---------------------------------------------------------------------------
# LoRA fusion (peft-format adapters, target q/k/v/out like the reference)
# ---------------------------------------------------------------------------

_LORA_KEY = re.compile(
    r"transformer_blocks\.(\d+)\.attn1\.(to_q|to_k|to_v|to_out\.0)\."
    r"lora_([AB])\.weight$"
)


def fuse_lora_into_dit(
    params: Params,
    lora_tensors: dict[str, np.ndarray],
    scale: float = 1.0,
) -> Params:
    """Fuse peft LoRA weights (W += scale * B @ A) into a converted DiT tree.

    Mirrors the reference's load_lora_weights + fuse_lora
    (/root/reference/inference_script.py:616-621). Expects diffusers-exported
    ``pytorch_lora_weights.safetensors`` naming; a leading "transformer." on
    keys is tolerated.
    """
    import jax

    deltas: dict[tuple[int, str], dict[str, np.ndarray]] = {}
    for key, val in lora_tensors.items():
        key = key.removeprefix("transformer.")
        m = _LORA_KEY.search(key)
        if not m:
            continue
        layer, target, ab = int(m.group(1)), m.group(2), m.group(3)
        deltas.setdefault((layer, target), {})[ab] = np.asarray(val, np.float32)

    if not deltas:
        raise ValueError("no recognizable LoRA keys found")

    name_map = {"to_q": "to_q", "to_k": "to_k", "to_v": "to_v", "to_out.0": "to_out"}
    blocks = params["blocks"]
    new_attn = dict(blocks["attn1"])
    n_layers = int(new_attn["to_q"]["kernel"].shape[0])

    # Assemble all layer deltas per target into ONE host array and add once:
    # per-layer .at[i].add dispatches each rewrite the whole stacked [L, in,
    # out] kernel (~170 copies of GB-scale buffers for a 42-layer adapter).
    per_target: dict[str, np.ndarray] = {}
    for (layer, target), ab in sorted(deltas.items()):
        if "A" not in ab or "B" not in ab:
            raise ValueError(
                f"incomplete LoRA pair for layer {layer} {target}: found "
                f"only lora_{'A' if 'A' in ab else 'B'}"
            )
        if layer >= n_layers:
            # JAX scatter would DROP the out-of-bounds update silently
            raise ValueError(
                f"LoRA adapter targets transformer_blocks.{layer} but the "
                f"model has {n_layers} layers — adapter/model mismatch"
            )
        A, B = ab["A"], ab["B"]  # A: [r, in], B: [out, r] (torch layout)
        delta = (B @ A).T * scale  # -> [in, out] JAX layout
        ours = name_map[target]
        if ours not in per_target:
            kern = new_attn[ours]["kernel"]
            per_target[ours] = np.zeros(kern.shape, np.float32)
        per_target[ours][layer] += delta

    for ours, delta_stack in per_target.items():
        kern = new_attn[ours]["kernel"]
        upd = kern + jnp.asarray(delta_stack, kern.dtype)
        new_attn[ours] = {**new_attn[ours], "kernel": upd}

    new_blocks = {**blocks, "attn1": new_attn}
    return {**params, "blocks": new_blocks}


def load_dit(model_dir: str | Path, cfg: DiTConfig, dtype=jnp.bfloat16) -> Params:
    return convert_dit(load_safetensors_dir(Path(model_dir) / "transformer"), cfg, dtype)


def load_vae(model_dir: str | Path, cfg: VAEConfig, dtype=jnp.bfloat16) -> Params:
    return convert_vae(load_safetensors_dir(Path(model_dir) / "vae"), cfg, dtype)


def load_prompt_embedding(path: str | Path, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Load a cached T5 prompt embedding (e.g. the empty-prompt file shipped
    with the reference at pretrained_models/prompt_embeddings/e3b0c4...safetensors)."""
    from safetensors import safe_open

    with safe_open(str(path), framework="np") as fp:
        emb = fp.get_tensor("prompt_embedding")
    return jnp.asarray(emb, dtype)
