"""Checkpoint save / rotate / resume (orbax) + export to deployable formats.

Replaces the reference's accelerate/DeepSpeed checkpoint machinery
(``accelerator.save_state`` into ``checkpoint-{step}`` dirs with rotation,
resume by parsing the step from the dir name — reference:
finetune/utils/checkpointing.py:15-57, trainer.py:1002-1014) and its
post-training converters (``zero_to_fp32.py`` shard merging +
``prepare_sft_ckpt.py`` repackaging) with TPU-native equivalents:

  * orbax ``StandardCheckpointer`` persists the (possibly mesh-sharded)
    train state; sharded arrays save/restore natively, so there is no
    "merge ZeRO shards" post-pass at all;
  * ``export_dit_safetensors`` converts a trained DiT params tree back to the
    diffusers checkpoint layout (torch [out, in] ordering, per-layer block
    names, bf16) so our checkpoints load in the reference stack and vice
    versa — the ``prepare_sft_ckpt`` analog;
  * ``export_lora_safetensors`` writes peft-format adapter weights.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any

import numpy as np

CHECKPOINT_PREFIX = "checkpoint-"


# ---------------------------------------------------------------------------
# Save / restore / rotate / resume
# ---------------------------------------------------------------------------

def save_checkpoint(
    output_dir: str | Path,
    step: int,
    state: Any,
    *,
    limit: int | None = None,
) -> Path:
    """Save `state` (pytree: params/opt_state/step/...) to checkpoint-{step}."""
    import orbax.checkpoint as ocp

    output_dir = Path(output_dir)
    path = (output_dir / f"{CHECKPOINT_PREFIX}{step}").resolve()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    if limit:
        rotate_checkpoints(output_dir, limit)
    return path


def restore_checkpoint(path: str | Path, template: Any) -> Any:
    """Restore a checkpoint into the structure/shardings of `template`."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(Path(path).resolve(), template)


def restore_subtree(path: str | Path, key: str) -> Any:
    """Restore one top-level entry (e.g. "trainable") without knowing the
    rest of the saved structure (used by the export/packaging CLI)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        full = ckptr.restore(Path(path).resolve())
    return full[key]


def list_checkpoints(output_dir: str | Path) -> list[tuple[int, Path]]:
    out = []
    for p in Path(output_dir).glob(f"{CHECKPOINT_PREFIX}*"):
        m = re.fullmatch(rf"{CHECKPOINT_PREFIX}(\d+)", p.name)
        if m and p.is_dir():
            out.append((int(m.group(1)), p))
    return sorted(out)


def rotate_checkpoints(output_dir: str | Path, limit: int) -> None:
    """Keep only the newest `limit` checkpoint dirs."""
    import shutil

    ckpts = list_checkpoints(output_dir)
    for _, path in ckpts[: max(len(ckpts) - limit, 0)]:
        shutil.rmtree(path, ignore_errors=True)


def latest_checkpoint(output_dir: str | Path) -> tuple[int, Path] | None:
    """(step, path) of the newest checkpoint, for resume."""
    ckpts = list_checkpoints(output_dir)
    return ckpts[-1] if ckpts else None


# ---------------------------------------------------------------------------
# Export: dove_tpu params tree -> diffusers-layout safetensors
# ---------------------------------------------------------------------------

def _t(x) -> np.ndarray:
    return np.asarray(x)


def _put_linear(out: dict, prefix: str, p: dict) -> None:
    out[f"{prefix}.weight"] = _t(p["kernel"]).T
    if "bias" in p:
        out[f"{prefix}.bias"] = _t(p["bias"])


def _put_ln(out: dict, prefix: str, p: dict) -> None:
    out[f"{prefix}.weight"] = _t(p["scale"])
    out[f"{prefix}.bias"] = _t(p["bias"])


def dit_state_dict(params: dict, patch_size_t: int | None = 2) -> dict[str, np.ndarray]:
    """Flatten a dove_tpu DiT tree to diffusers CogVideoXTransformer3DModel
    key names (inverse of dove_tpu.weights.convert_dit)."""
    out: dict[str, np.ndarray] = {}
    pe = params["patch_embed"]
    if patch_size_t is None:
        out["patch_embed.proj.weight"] = _t(pe["proj"]["kernel"]).transpose(3, 2, 0, 1)
        out["patch_embed.proj.bias"] = _t(pe["proj"]["bias"])
    else:
        _put_linear(out, "patch_embed.proj", pe["proj"])
    _put_linear(out, "patch_embed.text_proj", pe["text_proj"])
    if "pos_embedding" in pe:
        out["patch_embed.pos_embedding"] = _t(pe["pos_embedding"])
    _put_linear(out, "time_embedding.linear_1", params["time_embedding"]["linear_1"])
    _put_linear(out, "time_embedding.linear_2", params["time_embedding"]["linear_2"])

    blocks = params["blocks"]
    num_layers = _t(blocks["attn1"]["to_q"]["kernel"]).shape[0]

    def layer(tree: dict, i: int) -> dict:
        import jax

        return jax.tree.map(lambda x: _t(x)[i], tree)

    for i in range(num_layers):
        b = layer(blocks, i)
        pfx = f"transformer_blocks.{i}"
        _put_linear(out, f"{pfx}.norm1.linear", b["norm1"]["linear"])
        _put_ln(out, f"{pfx}.norm1.norm", b["norm1"]["norm"])
        for t in ("to_q", "to_k", "to_v"):
            _put_linear(out, f"{pfx}.attn1.{t}", b["attn1"][t])
        _put_linear(out, f"{pfx}.attn1.to_out.0", b["attn1"]["to_out"])
        _put_ln(out, f"{pfx}.attn1.norm_q", b["attn1"]["norm_q"])
        _put_ln(out, f"{pfx}.attn1.norm_k", b["attn1"]["norm_k"])
        _put_linear(out, f"{pfx}.norm2.linear", b["norm2"]["linear"])
        _put_ln(out, f"{pfx}.norm2.norm", b["norm2"]["norm"])
        _put_linear(out, f"{pfx}.ff.net.0.proj", b["ff"]["net_0_proj"])
        _put_linear(out, f"{pfx}.ff.net.2", b["ff"]["net_2"])

    _put_ln(out, "norm_final", params["norm_final"])
    _put_linear(out, "norm_out.linear", params["norm_out"]["linear"])
    _put_ln(out, "norm_out.norm", params["norm_out"]["norm"])
    _put_linear(out, "proj_out", params["proj_out"])
    return out


def export_dit_safetensors(
    params: dict,
    out_dir: str | Path,
    *,
    patch_size_t: int | None = 2,
    base_config: str | Path | None = None,
    max_shard_bytes: int = 5 * 1024**3,
) -> None:
    """Write diffusers-layout ``diffusion_pytorch_model-*.safetensors`` (+
    index json) so the exported model drops into a CogVideoX folder — the
    ``prepare_sft_ckpt.py`` equivalent."""
    from safetensors.numpy import save_file

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    sd = dit_state_dict(params, patch_size_t)

    shards: list[dict[str, np.ndarray]] = [{}]
    sizes = [0]
    for k, v in sd.items():
        if sizes[-1] + v.nbytes > max_shard_bytes and shards[-1]:
            shards.append({})
            sizes.append(0)
        shards[-1][k] = v
        sizes[-1] += v.nbytes

    n = len(shards)
    weight_map = {}
    total = 0
    for i, shard in enumerate(shards):
        name = (
            "diffusion_pytorch_model.safetensors"
            if n == 1
            else f"diffusion_pytorch_model-{i + 1:05d}-of-{n:05d}.safetensors"
        )
        save_file({k: np.ascontiguousarray(v) for k, v in shard.items()},
                  str(out_dir / name))
        for k, v in shard.items():
            weight_map[k] = name
            total += v.nbytes
    if n > 1:
        index = {"metadata": {"total_size": total}, "weight_map": weight_map}
        (out_dir / "diffusion_pytorch_model.safetensors.index.json").write_text(
            json.dumps(index, indent=2)
        )
    if base_config is not None:
        import shutil

        shutil.copy(base_config, out_dir / "config.json")


def export_lora_safetensors(lora: dict, out_path: str | Path) -> None:
    """Write a peft/diffusers-format ``pytorch_lora_weights.safetensors``.

    Our LoRA tree is {target: {"A": [L, in, r], "B": [L, r, out]}}; peft keys
    are per-layer ``transformer.transformer_blocks.{i}.attn1.{t}.lora_A.weight``
    with torch [r, in] / [out, r] layouts.
    """
    from safetensors.numpy import save_file

    name_map = {"to_q": "to_q", "to_k": "to_k", "to_v": "to_v", "to_out": "to_out.0"}
    sd: dict[str, np.ndarray] = {}
    for ours, ab in lora.items():
        A = _t(ab["A"])  # [L, in, r]
        B = _t(ab["B"])  # [L, r, out]
        target = name_map[ours]
        for i in range(A.shape[0]):
            pfx = f"transformer.transformer_blocks.{i}.attn1.{target}"
            sd[f"{pfx}.lora_A.weight"] = np.ascontiguousarray(A[i].T)  # [r, in]
            sd[f"{pfx}.lora_B.weight"] = np.ascontiguousarray(B[i].T)  # [out, r]
    Path(out_path).parent.mkdir(parents=True, exist_ok=True)
    save_file(sd, str(out_path))
