"""Joint text-video attention for the CogVideoX DiT.

The DiT concatenates [text_tokens, video_tokens] into one sequence and runs
full (non-causal) self-attention with per-head LayerNorm on q/k and rotary
embeddings applied only to the video segment (reference behavior via
diffusers' CogVideoXAttnProcessor; SURVEY.md §2.2).

Backends:
  * "xla":   fp32-softmax einsum attention. Exact, O(S^2) memory; fine for
             small/medium tiles and as the CPU test oracle.
  * "flash": custom Pallas TPU flash attention (dove_tpu/ops/pallas), O(S)
             memory — required for 720p tiles where S ~ 18k and a naive
             logits matrix would not fit HBM.
  * "flash-qk8": flash with per-tensor int8 QK^T on the MXU's int8 path —
             the int8 serving mode's attention (inference-only; ~7e-3 rel
             err, in line with that mode's W8A8 linears).
Selection is automatic (flash on TPU for long sequences) but overridable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _naive_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q,k,v: [B, H, S, D]. fp32 logits + softmax, output in input dtype."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    probs = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


def _flash_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def full_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    backend: str | None = None,
    bounded_logits: bool = False,
) -> jnp.ndarray:
    """Full bidirectional attention. q,k,v: [B, H, S, D] -> [B, H, S, D].

    bounded_logits: promise that |q.k/sqrt(D)| stays well inside fp32 exp
    range — lets the flash kernel drop its online-softmax running max (the
    DiT's qk-layernorm guarantees this; see flash_attention docstring)."""
    if backend is None:
        # key the threshold on the LONGER side: under sequence parallelism
        # the query is a slice (Sq = S/sp) but K/V stay full, and the naive
        # path's logits buffer is O(Sq * Skv) — a short q must not fall back
        # to materializing rows against an 18k-token K
        s_max = max(q.shape[-2], k.shape[-2])
        backend = "flash" if (_flash_available() and s_max >= 2048) else "xla"
    if backend in ("flash", "flash-qk8"):
        from dove_tpu.ops.pallas.flash_attention import (
            DEFAULT_BLOCK_K, DEFAULT_BLOCK_Q, flash_attention,
        )

        return flash_attention(
            q, k, v, None, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K, bounded_logits,
            backend == "flash-qk8",
        )
    if backend == "xla":
        return _naive_attention(q, k, v)
    raise ValueError(f"unknown attention backend: {backend}")
