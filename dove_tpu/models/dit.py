"""CogVideoX Transformer3D ("DiT") — TPU-native JAX implementation.

Functionally equivalent to diffusers' ``CogVideoXTransformer3DModel`` as used
by the reference (forward call at /root/reference/inference_script.py:483-489,
config fields per SURVEY.md §2.2), re-designed for XLA:

  * all block parameters are stacked along a leading layer axis and the block
    stack runs under ``lax.scan`` — one compiled block body instead of 42
    unrolled copies, with optional ``jax.checkpoint`` rematerialisation;
  * attention uses fp32-softmax XLA attention or the custom Pallas flash
    kernel (dove_tpu/ops/attention.py);
  * LayerNorms/adaLN math in fp32, matmuls in the model dtype (bf16 on TPU);
  * static shapes: one jit per (frames, height, width) tile geometry.

Architecture (1.5-5B): 3D patchify (p=2, p_t=2) as a single linear, T5 text
projection, joint [text|video] token sequence, 42 blocks of
adaLN-zero -> qk-layernorm full attention with 3D RoPE on the video segment ->
adaLN-zero -> GELU-tanh MLP, final norm + adaLN + linear unpatchify.

Parameter tree layout mirrors the diffusers checkpoint naming (see
dove_tpu/weights.py) with torch [out,in] weights transposed to JAX [in,out]
"kernel" convention.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from einops import rearrange

from dove_tpu.config import DiTConfig
from dove_tpu.ops.attention import full_attention
from dove_tpu.ops.rope import apply_rotary, rope_3d

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Primitive layers (functional)
# ---------------------------------------------------------------------------

def _linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    if "kernel_q" in p:  # int8 W8A8 serving mode (ops/quant.py)
        from dove_tpu.ops.quant import qlinear

        return qlinear(p, x)
    if "kernel_w8" in p:  # weight-only int8 (W8A16): int8 storage halves
        # residency; dequantize into the bf16 matmul, activations exact
        w = p["kernel_w8"].astype(x.dtype) * p["kernel_scale"].astype(x.dtype)
        y = x @ w
        if "bias" in p:
            y = y + p["bias"].astype(x.dtype)
        return y
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _linear_psum(p: Params, x: jnp.ndarray, tp_axis: str) -> jnp.ndarray:
    """Row-parallel linear under tensor parallelism (Megatron-style).

    The kernel's INPUT dim is sharded over ``tp_axis`` (each shard sees the
    x slice produced by its column-parallel predecessor), so the local
    matmul yields a partial sum — reduce over the axis, then add the
    replicated bias once. int8 kernels dequantize per shard (the per-output
    -channel scale is replicated; only the dynamic activation scale becomes
    per-shard) before the reduction."""
    if "kernel_q" in p:
        from dove_tpu.ops.quant import qlinear

        y = qlinear({k: v for k, v in p.items() if k != "bias"}, x)
    elif "kernel_w8" in p:
        w = p["kernel_w8"].astype(x.dtype) * p["kernel_scale"].astype(x.dtype)
        y = x @ w
    else:
        y = x @ p["kernel"].astype(x.dtype)
    y = jax.lax.psum(y, tp_axis)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _layer_norm(x: jnp.ndarray, eps: float, p: Params | None = None) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if p is not None:
        y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _timestep_embedding(t: jnp.ndarray, dim: int, flip_sin_to_cos: bool, freq_shift: float) -> jnp.ndarray:
    """Sinusoidal timestep features, shape [B, dim], fp32."""
    half = dim // 2
    exponent = -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / (half - freq_shift)
    emb = t.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    return jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)


def _adaln_modulation(p: Params, temb: jnp.ndarray, n_chunks: int) -> list[jnp.ndarray]:
    """linear(silu(temb)) split into n_chunks of [B, 1, dim]."""
    h = _linear(p["linear"], jax.nn.silu(temb))
    return [c[:, None, :] for c in jnp.split(h, n_chunks, axis=-1)]


# ---------------------------------------------------------------------------
# Patchify / unpatchify
# ---------------------------------------------------------------------------

def patchify(cfg: DiTConfig, p_embed: Params, latent: jnp.ndarray) -> jnp.ndarray:
    """latent [B, F, C, H, W] -> video tokens [B, S_vid, dim].

    Token order: F-major, then H, then W. Feature order within a patch:
    (C, p_t, p_h, p_w) with C slowest — matches the released checkpoints.
    """
    p = cfg.patch_size
    if cfg.patch_size_t is None:
        # CogVideoX-1.0 style: conv2d patchify per frame (kernel [p,p,C,dim]).
        x = rearrange(latent, "b f c h w -> (b f) h w c")
        x = jax.lax.conv_general_dilated(
            x.astype(p_embed["proj"]["kernel"].dtype),
            p_embed["proj"]["kernel"],
            window_strides=(p, p),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if "bias" in p_embed["proj"]:
            x = x + p_embed["proj"]["bias"]
        return rearrange(x, "(b f) h w d -> b (f h w) d", b=latent.shape[0])
    pt = cfg.patch_size_t
    tokens = rearrange(
        latent,
        "b (f pt) c (h p1) (w p2) -> b (f h w) (c pt p1 p2)",
        pt=pt, p1=p, p2=p,
    )
    return _linear(p_embed["proj"], tokens)


def unpatchify(
    cfg: DiTConfig, tokens: jnp.ndarray, frames: int, height: int, width: int
) -> jnp.ndarray:
    """video tokens [B, S_vid, C*pt*p*p] -> latent [B, F, C_out, H, W]."""
    p = cfg.patch_size
    pt = cfg.patch_size_t or 1
    return rearrange(
        tokens,
        "b (f h w) (c pt p1 p2) -> b (f pt) c (h p1) (w p2)",
        f=frames // pt, h=height // p, w=width // p, pt=pt, p1=p, p2=p,
    )


# ---------------------------------------------------------------------------
# Transformer block (scanned)
# ---------------------------------------------------------------------------

def _token_shard(
    fn,
    x: jnp.ndarray,
    sp: tuple[str | tuple[str, ...], int],
    axis: int,
    out_axis: int,
) -> jnp.ndarray:
    """Sequence parallelism over manual mesh axes (inside shard_map).

    Token rows are independent under ``fn`` (attention output rows depend
    only on their own query row; MLP rows are per-token), so each shard
    computes its token slice of ``x`` and the slices all-gather back.
    Zero-pads the token dim to the shard count; padded rows are discarded
    after the gather, so they are redundant compute only. ``sp`` is
    (axis name or tuple of names, total size); with several names the flat
    shard index is row-major over them, matching all_gather's tuple order."""
    from dove_tpu.ops.pallas.flash_attention import _pad_to

    name, n = sp
    names = (name,) if isinstance(name, str) else tuple(name)
    S = x.shape[axis]
    pad = (-S) % n
    if pad:
        x = _pad_to(x, axis, n)
    chunk = (S + pad) // n
    i = jax.lax.axis_index(names[0])
    for nm in names[1:]:
        i = i * jax.lax.psum(1, nm) + jax.lax.axis_index(nm)
    xl = jax.lax.dynamic_slice_in_dim(x, i * chunk, chunk, axis)
    y = jax.lax.all_gather(fn(xl), names, axis=out_axis, tiled=True)
    if pad:
        y = jax.lax.slice_in_dim(y, 0, S, axis=out_axis)
    return y


def _attention(
    cfg: DiTConfig,
    p: Params,
    hidden: jnp.ndarray,
    encoder: jnp.ndarray,
    rope: tuple[jnp.ndarray, jnp.ndarray] | None,
    backend: str | None,
    bounded_logits: bool,
    tp_axis: str | None,
    sp: tuple[str, int] | None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Joint attention over [text | video]; returns (video_out, text_out)."""
    text_len = encoder.shape[1]
    x = jnp.concatenate([encoder, hidden], axis=1)
    B, S, _ = x.shape
    D = cfg.attention_head_dim

    # Under tensor parallelism the q/k/v kernels are sharded on their output
    # dim, so each shard owns heads_local = heads / tp — derive the head
    # count from the projection, not the (global) config.
    q = _linear(p["to_q"], x)
    H = q.shape[-1] // D
    q = q.reshape(B, S, H, D).transpose(0, 2, 1, 3)
    k = _linear(p["to_k"], x).reshape(B, S, H, D).transpose(0, 2, 1, 3)
    v = _linear(p["to_v"], x).reshape(B, S, H, D).transpose(0, 2, 1, 3)

    q = _layer_norm(q, cfg.qk_norm_eps, p["norm_q"])
    k = _layer_norm(k, cfg.qk_norm_eps, p["norm_k"])

    if rope is not None:
        cos, sin = rope
        q = jnp.concatenate(
            [q[:, :, :text_len], apply_rotary(q[:, :, text_len:], cos, sin)], axis=2
        )
        k = jnp.concatenate(
            [k[:, :, :text_len], apply_rotary(k[:, :, text_len:], cos, sin)], axis=2
        )

    # qk-layernorm bounds per-head logits (|s| <= ~8 * max|gamma_q||gamma_k|)
    # ONLY while the gains stay near their pretrained ~1 magnitude — true at
    # inference, not guaranteed mid-training where gamma is trainable. The
    # running-max-free flash variant is therefore inference-opt-in.
    def core(qc: jnp.ndarray) -> jnp.ndarray:
        # attention + out-projection for a [B, H, Sq, D] query slice
        # (K/V stay full — the kernel takes Sq != Skv by design)
        o = full_attention(qc, k, v, backend=backend, bounded_logits=bounded_logits)
        o = o.transpose(0, 2, 1, 3).reshape(B, qc.shape[2], H * D)
        if tp_axis is None:
            return _linear(p["to_out"], o)
        # row-parallel: local heads' slice of the out-proj + psum (on the
        # token slice under sp — the psum volume drops by the sp degree)
        return _linear_psum(p["to_out"], o, tp_axis)

    out = core(q) if sp is None else _token_shard(core, q, sp, 2, 1)
    return out[:, text_len:], out[:, :text_len]


def _feed_forward(
    cfg: DiTConfig,
    p: Params,
    x: jnp.ndarray,
    tp_axis: str | None,
    sp: tuple[str, int] | None,
) -> jnp.ndarray:
    def core(xc: jnp.ndarray) -> jnp.ndarray:
        h = _linear(p["net_0_proj"], xc)
        h = jax.nn.gelu(h, approximate=True)
        if tp_axis is None:
            return _linear(p["net_2"], h)
        return _linear_psum(p["net_2"], h, tp_axis)

    return core(x) if sp is None else _token_shard(core, x, sp, 1, 1)


def _block(
    cfg: DiTConfig,
    p: Params,
    hidden: jnp.ndarray,
    encoder: jnp.ndarray,
    temb: jnp.ndarray,
    rope: tuple[jnp.ndarray, jnp.ndarray] | None,
    backend: str | None,
    bounded_logits: bool,
    tp_axis: str | None,
    sp: tuple[str, int] | None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    eps = cfg.norm_eps
    # adaLN-zero #1 -> attention
    shift, scale, gate, e_shift, e_scale, e_gate = _adaln_modulation(
        p["norm1"], temb, 6
    )
    n_hidden = _layer_norm(hidden, eps, p["norm1"]["norm"]) * (1 + scale) + shift
    n_encoder = _layer_norm(encoder, eps, p["norm1"]["norm"]) * (1 + e_scale) + e_shift
    attn_h, attn_e = _attention(
        cfg, p["attn1"], n_hidden, n_encoder, rope, backend, bounded_logits,
        tp_axis, sp,
    )
    hidden = hidden + gate * attn_h
    encoder = encoder + e_gate * attn_e

    # adaLN-zero #2 -> feed-forward over the joint sequence
    shift, scale, gate, e_shift, e_scale, e_gate = _adaln_modulation(
        p["norm2"], temb, 6
    )
    n_hidden = _layer_norm(hidden, eps, p["norm2"]["norm"]) * (1 + scale) + shift
    n_encoder = _layer_norm(encoder, eps, p["norm2"]["norm"]) * (1 + e_scale) + e_shift
    ff = _feed_forward(
        cfg, p["ff"], jnp.concatenate([n_encoder, n_hidden], axis=1), tp_axis,
        sp,
    )
    text_len = encoder.shape[1]
    hidden = hidden + gate * ff[:, text_len:]
    encoder = encoder + e_gate * ff[:, :text_len]
    return hidden, encoder


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------

def dit_forward(
    params: Params,
    cfg: DiTConfig,
    latent: jnp.ndarray,
    text_embeds: jnp.ndarray,
    timestep: jnp.ndarray,
    *,
    attention_backend: str | None = None,
    remat: bool = False,
    bounded_logits: bool = False,
    tp_axis: str | None = None,
    sp: tuple[str, int] | None = None,
) -> jnp.ndarray:
    """One DiT pass.

    Args:
      latent: [B, F, C, H, W] noisy latent, F divisible by patch_size_t.
      text_embeds: [B, L_text, text_embed_dim] T5 features (pre-projection).
      timestep: [B] int32 diffusion timesteps.
      bounded_logits: inference-only fast path — skip the flash kernel's
        online-softmax running max (safe only with frozen, near-unit
        qk-layernorm gains; never enable during training).
      tp_axis: mesh axis name for Megatron-style tensor parallelism — the
        caller runs this function under ``jax.shard_map`` with the attention
        q/k/v + MLP-in kernels sharded on their OUTPUT dim and the
        out-proj + MLP-out kernels on their INPUT dim over that axis
        (dove_tpu/parallel/tp.py builds the specs); the two row-parallel
        linears psum over it. None = single-device semantics.
      sp: (mesh axis name or tuple of names, total size) for sequence
        parallelism over further manual axes whose shards would otherwise
        compute redundantly (the
        batch is replicated there): the attention core + out-proj and the
        MLP token-shard over it and all-gather back (attention rows depend
        only on their own query row — K/V stay full, no ring needed).
        Composes with tp_axis; parallel/tp.py enables it automatically for
        the single-clip serving case.
    Returns:
      velocity prediction, [B, F, C_out, H, W].
    """
    B, F, _, Hh, Ww = latent.shape
    dtype = latent.dtype

    # Timestep conditioning
    t_feat = _timestep_embedding(
        timestep, cfg.hidden_dim, cfg.flip_sin_to_cos, cfg.freq_shift
    ).astype(dtype)
    temb = _linear(params["time_embedding"]["linear_1"], t_feat)
    temb = jax.nn.silu(temb)
    temb = _linear(params["time_embedding"]["linear_2"], temb)

    # Token embeddings
    hidden = patchify(cfg, params["patch_embed"], latent)
    encoder = _linear(params["patch_embed"]["text_proj"], text_embeds.astype(dtype))

    if cfg.use_rotary_positional_embeddings:
        pt = cfg.patch_size_t or 1
        rope = rope_3d(
            cfg.attention_head_dim,
            F // pt,
            Hh // cfg.patch_size,
            Ww // cfg.patch_size,
            cfg.rope_theta,
        )
    else:
        rope = None
        if "pos_embedding" in params["patch_embed"]:
            # diffusers semantics (CogVideoXPatchEmbed.forward): the stored
            # sincos table is valid ONLY at the config's sample grid; any
            # other geometry recomputes the table for the ACTUAL grid.
            # (Slicing the sample-grid table by sequence length — the
            # pre-round-5 behavior — walks w-major through the WRONG grid
            # whenever serving geometry != sample geometry, e.g. 2B at VSR
            # latents vs its 60x90 sample grid.) Shapes are static under
            # jit, so the numpy recompute constant-folds at trace time.
            grid = (F, Hh // cfg.patch_size, Ww // cfg.patch_size)
            sample_grid = (
                (cfg.sample_frames - 1) // cfg.temporal_compression_ratio + 1,
                cfg.sample_height // cfg.patch_size,
                cfg.sample_width // cfg.patch_size,
            )
            if grid == sample_grid:
                pos = params["patch_embed"]["pos_embedding"]
                joint = jnp.concatenate([encoder, hidden], axis=1)
                joint = joint + pos[:, : joint.shape[1]].astype(dtype)
                encoder = joint[:, : encoder.shape[1]]
                hidden = joint[:, encoder.shape[1]:]
            else:
                from dove_tpu.ops.sincos import get_3d_sincos_pos_embed

                pos = get_3d_sincos_pos_embed(
                    cfg.hidden_dim, grid[2], grid[1], grid[0],
                    cfg.spatial_interpolation_scale,
                    cfg.temporal_interpolation_scale,
                ).reshape(1, -1, cfg.hidden_dim)
                hidden = hidden + jnp.asarray(pos, dtype)

    # Scanned block stack
    block_fn = _block
    if remat:
        block_fn = jax.checkpoint(
            _block,
            policy=jax.checkpoint_policies.nothing_saveable,
            static_argnums=(0, 6, 7, 8, 9),
        )

    def scan_body(carry, layer_params):
        h, e = carry
        h, e = block_fn(
            cfg, layer_params, h, e, temb, rope, attention_backend,
            bounded_logits, tp_axis, sp,
        )
        return (h, e), None

    (hidden, encoder), _ = jax.lax.scan(scan_body, (hidden, encoder), params["blocks"])

    # Final norm (+ adaLN) and projection
    if cfg.use_rotary_positional_embeddings:
        joint = jnp.concatenate([encoder, hidden], axis=1)
        joint = _layer_norm(joint, cfg.norm_eps, params["norm_final"])
        hidden = joint[:, encoder.shape[1]:]
    else:
        hidden = _layer_norm(hidden, cfg.norm_eps, params["norm_final"])

    shift, scale = _adaln_modulation(params["norm_out"], temb, 2)
    hidden = _layer_norm(hidden, cfg.norm_eps, params["norm_out"].get("norm")) * (
        1 + scale
    ) + shift
    hidden = _linear(params["proj_out"], hidden)

    return unpatchify(cfg, hidden, F, Hh, Ww)


# ---------------------------------------------------------------------------
# Initialization (random weights; released checkpoints load via weights.py)
# ---------------------------------------------------------------------------

def _init_linear(key, d_in: int, d_out: int, bias: bool = True, dtype=jnp.float32, scale: float | None = None) -> Params:
    k = scale if scale is not None else (1.0 / math.sqrt(d_in))
    p = {"kernel": jax.random.uniform(key, (d_in, d_out), dtype, -k, k)}
    if bias:
        p["bias"] = jnp.zeros((d_out,), dtype)
    return p


def _init_ln(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_dit_params(key: jax.Array, cfg: DiTConfig, dtype=jnp.float32) -> Params:
    """Random parameter tree with the exact structure the loader produces."""
    dim = cfg.hidden_dim
    pt = cfg.patch_size_t
    keys = iter(jax.random.split(key, 16 + cfg.num_layers * 16))

    def nk():
        return next(keys)

    if pt is None:
        proj = {
            "kernel": jax.random.normal(
                nk(), (cfg.patch_size, cfg.patch_size, cfg.in_channels, dim), dtype
            ) * 0.02,
            "bias": jnp.zeros((dim,), dtype),
        }
    else:
        proj = _init_linear(
            nk(), cfg.in_channels * pt * cfg.patch_size**2, dim, cfg.patch_bias, dtype
        )

    patch_embed: Params = {
        "proj": proj,
        "text_proj": _init_linear(nk(), cfg.text_embed_dim, dim, True, dtype),
    }
    if not cfg.use_rotary_positional_embeddings:
        # Fixed 3D sincos table over the full sample grid (text part zeros).
        from dove_tpu.ops.sincos import get_3d_sincos_pos_embed

        t_frames = (cfg.sample_frames - 1) // cfg.temporal_compression_ratio + 1
        pos = get_3d_sincos_pos_embed(
            dim,
            cfg.sample_width // cfg.patch_size,
            cfg.sample_height // cfg.patch_size,
            t_frames,
            cfg.spatial_interpolation_scale,
            cfg.temporal_interpolation_scale,
        ).reshape(1, -1, dim)
        text_zeros = jnp.zeros((1, cfg.max_text_seq_length, dim), jnp.float32)
        patch_embed["pos_embedding"] = jnp.concatenate(
            [text_zeros, jnp.asarray(pos, jnp.float32)], axis=1
        ).astype(dtype)

    def init_block(k):
        ks = jax.random.split(k, 8)
        return {
            "norm1": {"linear": _init_linear(ks[0], cfg.time_embed_dim, 6 * dim, True, dtype),
                      "norm": _init_ln(dim, dtype)},
            "attn1": {
                "to_q": _init_linear(ks[1], dim, dim, cfg.attention_bias, dtype),
                "to_k": _init_linear(ks[2], dim, dim, cfg.attention_bias, dtype),
                "to_v": _init_linear(ks[3], dim, dim, cfg.attention_bias, dtype),
                "to_out": _init_linear(ks[4], dim, dim, True, dtype),
                "norm_q": _init_ln(cfg.attention_head_dim, dtype),
                "norm_k": _init_ln(cfg.attention_head_dim, dtype),
            },
            "norm2": {"linear": _init_linear(ks[5], cfg.time_embed_dim, 6 * dim, True, dtype),
                      "norm": _init_ln(dim, dtype)},
            "ff": {
                "net_0_proj": _init_linear(ks[6], dim, cfg.ff_dim, True, dtype),
                "net_2": _init_linear(ks[7], cfg.ff_dim, dim, True, dtype),
            },
        }

    block_keys = jax.random.split(nk(), cfg.num_layers)
    blocks = [init_block(k) for k in block_keys]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    out_dim = cfg.out_channels * (pt or 1) * cfg.patch_size**2
    return {
        "patch_embed": patch_embed,
        "time_embedding": {
            "linear_1": _init_linear(nk(), dim, cfg.time_embed_dim, True, dtype),
            "linear_2": _init_linear(nk(), cfg.time_embed_dim, cfg.time_embed_dim, True, dtype),
        },
        "blocks": stacked,
        "norm_final": _init_ln(dim, dtype),
        "norm_out": {
            "linear": _init_linear(nk(), cfg.time_embed_dim, 2 * dim, True, dtype),
            "norm": _init_ln(dim, dtype),
        },
        "proj_out": _init_linear(nk(), dim, out_dim, True, dtype),
    }


def param_count(params: Params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))
