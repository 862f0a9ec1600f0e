"""Tensor-parallel (Megatron-style) DiT serving over a mesh axis.

The existing multi-chip serving modes scale THROUGHPUT: independent chunks /
tiles shard over the mesh "data" axis with zero model-internal collectives
(dove_tpu/parallel/mesh.py). This module scales LATENCY: one DiT pass spreads
over the "model" axis by sharding each transformer block's matmuls —

  * column-parallel (output dim sharded):  attn to_q/to_k/to_v, ff net_0_proj
  * row-parallel    (input  dim sharded):  attn to_out,         ff net_2

so each device owns heads/tp attention heads and ff_dim/tp MLP channels, and
exactly TWO psums per block (after to_out and net_2 — models/dit.py
``_linear_psum``) ride the ICI. Everything else (LayerNorms, adaLN, patchify,
RoPE) is replicated compute: a few percent of the FLOPs.

The implementation is ``jax.shard_map`` over the serving mesh: the param tree
is placed with the PartitionSpec tree from :func:`dit_tp_specs`, activations
enter replicated (or sharded over "data" when a chunk batch rides along), and
the body is the UNMODIFIED ``dit_forward`` with ``tp_axis`` set — the Pallas
flash-attention kernel runs per shard on its local heads, which GSPMD could
not partition through a custom call.

When the batch CANNOT shard over the residual data axes (single-clip
latency: B=1 on a data x model mesh), those axes carry SEQUENCE parallelism
instead (``dit_forward(sp=...)``): each shard computes its token slice of
the attention core (+out-proj) and the MLP and all-gathers — attention
output rows depend only on their own query row, so K/V stay full and no
ring pass is needed. ~75% of block FLOPs (S^2 attention + MLP) then scale
over BOTH mesh axes.

Exactness: splitting a contraction reorders floating-point accumulation, so
TP output matches single-device output to dtype tolerance, not bit-for-bit
(the bf16-path PSNR>50dB parity bar applies at tp=1). The int8 serving mode
additionally computes its dynamic per-tensor activation scale per shard for
the two row-parallel inputs (a strictly local-range, usually tighter, scale).

No reference analog: the reference serves single-GPU per process
(/root/reference/inference_script.py); this is TPU-first headroom
(SURVEY.md §2.7 "optional headroom").
"""

from __future__ import annotations

import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dove_tpu.config import DiTConfig
from dove_tpu.models.dit import dit_forward

# Linear layers inside params["blocks"] by parallel style.
_COL_PARALLEL = ("to_q", "to_k", "to_v", "net_0_proj")  # shard output dim
_ROW_PARALLEL = ("to_out", "net_2")  # shard input dim


def validate_tp(cfg: DiTConfig, tp: int) -> None:
    """TP degree must evenly split heads and both matmul widths."""
    bad = {
        "num_attention_heads": cfg.num_attention_heads % tp,
        "hidden_dim": cfg.hidden_dim % tp,
        "ff_dim": cfg.ff_dim % tp,
    }
    if any(bad.values()):
        raise ValueError(
            f"tensor_parallel={tp} must divide "
            f"heads={cfg.num_attention_heads}, hidden={cfg.hidden_dim}, "
            f"ff={cfg.ff_dim} (remainders {bad})"
        )


def dit_tp_specs(params: Any, axis: str = "model") -> Any:
    """PartitionSpec tree for a DiT param tree (bf16 or int8-quantized).

    Column-parallel leaves shard their LAST dim (kernel/kernel_q [L, in,
    out], kernel_scale [L, 1, out], bias [L, out] all carry the output
    channel last); row-parallel kernels shard dim -2 (the input dim) and
    keep their per-output-channel scale + bias replicated. Everything else
    is replicated.
    """

    def spec(path, leaf) -> P:
        keys = [getattr(e, "key", None) for e in path]
        ndim = getattr(leaf, "ndim", 0)
        if "blocks" not in keys or ndim == 0:
            return P()
        layer, leafname = keys[-2], keys[-1]
        if layer in _COL_PARALLEL:
            return P(*([None] * (ndim - 1)), axis)
        if layer in _ROW_PARALLEL and leafname in ("kernel", "kernel_q",
                                                   "kernel_w8"):
            return P(*([None] * (ndim - 2)), axis, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_dit_tp(
    params: Any, mesh: Mesh, axis: str = "model", donate: bool = True
) -> Any:
    """Place a DiT param tree on the mesh with TP shardings.

    ``donate=True`` frees each source buffer as its shards land (a 5B tree
    cannot exist twice on a 16 GB chip). A donated jit identity — the
    replication path's trick — does NOT work here: XLA refuses to alias a
    whole buffer to a per-device shard of a different size, so we use
    device_put's own donation, which copies then releases.
    """
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s), dit_tp_specs(params, axis),
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(params, shardings, donate=donate)


def _path_key(entry) -> Any:
    """Normalize a tree-path entry (DictKey/GetAttrKey/SequenceKey) to its
    plain key so param paths and optimizer-state paths compare equal."""
    for attr in ("key", "name", "idx"):
        if hasattr(entry, attr):
            return getattr(entry, attr)
    return str(entry)


def opt_state_tp_specs(opt_state: Any, params: Any, axis: str = "model") -> Any:
    """PartitionSpec tree for an optimizer state over TP-sharded params.

    Optimizer moments that mirror a param (same trailing tree path AND same
    shape — adam/adamw mu/nu, CAME m) take that param's TP spec so the jitted
    update step never reshards 5B-scale moments against 5B-scale grads.
    Everything else — counts, factored CAME row/col stats (param shape with a
    dim removed, O(sqrt) size), 8-bit block-quantized moments (reshaped) —
    replicates: correct for any optimizer, and small by construction for the
    states that actually reshape.
    """
    pspecs = dit_tp_specs(params, axis)
    pleaves = jax.tree_util.tree_flatten_with_path(params)[0]
    sleaves = jax.tree_util.tree_flatten_with_path(
        pspecs, is_leaf=lambda x: isinstance(x, P)
    )[0]
    by_path: dict[tuple, tuple[tuple, P]] = {}
    for (ppath, pleaf), (_, spec) in zip(pleaves, sleaves):
        key = tuple(_path_key(e) for e in ppath)
        by_path[key] = (tuple(pleaf.shape), spec)

    def assign(path, leaf) -> P:
        shape = tuple(getattr(leaf, "shape", ()))
        key = tuple(_path_key(e) for e in path)
        for start in range(len(key)):
            hit = by_path.get(key[start:])
            if hit is not None and hit[0] == shape:
                return hit[1]
        return P()

    return jax.tree_util.tree_map_with_path(assign, opt_state)


def shard_opt_state_tp(
    opt_state: Any, params: Any, mesh: Mesh, axis: str = "model"
) -> Any:
    """Place a freshly-initialized optimizer state on the mesh with
    param-matched TP shardings (see :func:`opt_state_tp_specs`)."""
    shardings = jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        opt_state_tp_specs(opt_state, params, axis),
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(opt_state, shardings)


def make_tp_dit(
    mesh: Mesh,
    cfg: DiTConfig,
    axis: str = "model",
    *,
    attention_backend: str | None = None,
    bounded_logits: bool = False,
    remat: bool = False,
) -> Callable:
    """A drop-in DiT forward ``(params, latent, text, timestep) -> velocity``
    that runs tensor-parallel over ``mesh[axis]``.

    Batch handling: if the batch divides the mesh's residual data axes (the
    chunk-parallel serving case, B == data), it shards over them; otherwise
    the batch is replicated there and the residual axis instead carries
    SEQUENCE parallelism (dit_forward's ``sp``): each shard computes its
    token slice of the attention core + MLP and all-gathers — the
    single-clip latency case keeps every chip busy.
    """
    tp = mesh.shape[axis]
    validate_tp(cfg, tp)
    data_axes = tuple(
        a for a in mesh.axis_names if a != axis and mesh.shape[a] > 1
    )
    dp = math.prod(mesh.shape[a] for a in data_axes) if data_axes else 1

    def call(
        params: Any,
        latent: jnp.ndarray,
        text_embeds: jnp.ndarray,
        timestep: jnp.ndarray,
    ) -> jnp.ndarray:
        sp = None
        if data_axes and latent.shape[0] % dp == 0:
            bspec = P(data_axes if len(data_axes) > 1 else data_axes[0])
        else:
            bspec = P()
            if data_axes:  # token-shard over the idle axis/axes
                sp = (
                    data_axes if len(data_axes) > 1 else data_axes[0], dp
                )

        def body(p, z, text, t):
            return dit_forward(
                p, cfg, z, text, t,
                attention_backend=attention_backend,
                remat=remat, bounded_logits=bounded_logits, tp_axis=axis,
                sp=sp,
            )

        fn = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(dit_tp_specs(params, axis), bspec, bspec, bspec),
            out_specs=bspec,
            # the body psums partial row-parallel products that enter
            # "replicated" — the varying-manual-axes checker can't see that
            check_vma=False,
        )
        return fn(params, latent, text_embeds, timestep)

    return call
