"""E*warp — optical-flow warping error for temporal-consistency evaluation.

The reference computes this through an external RAFT checkout
(finetune/scripts/eval_ewarp.py + vendored finetune/utils/RAFT). Here the
metric is native: RAFT flow (dove_tpu/models/raft.py) + backward warping with
a forward-backward-consistency occlusion mask.

E*warp = mean_t mean_px[valid] || I_t - warp(I_{t+1}, F_{t->t+1}) ||^2,
reported x1e-3 like the published tables.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from dove_tpu.models.raft import raft_flow, warp


def occlusion_mask(
    flow_fwd: jnp.ndarray, flow_bwd: jnp.ndarray, alpha1=0.01, alpha2=0.5
) -> jnp.ndarray:
    """Forward-backward consistency: valid where |F_fwd + warp(F_bwd)|^2 is
    small relative to the flow magnitudes. Returns [B, H, W, 1] float mask."""
    bwd_warped = warp(flow_bwd, flow_fwd)
    diff = jnp.sum((flow_fwd + bwd_warped) ** 2, axis=-1, keepdims=True)
    mag = jnp.sum(flow_fwd**2 + bwd_warped**2, axis=-1, keepdims=True)
    return (diff < alpha1 * mag + alpha2).astype(jnp.float32)


def ewarp_clip(
    raft_params,
    frames: np.ndarray,  # [F, H, W, 3] float in [0, 1]
    iters: int = 12,
    use_occlusion: bool = True,
) -> float:
    """Warping error of one clip (x1e-3)."""
    frames = jnp.asarray(frames, jnp.float32)
    F, H, W, _ = frames.shape
    pad_h = (-H) % 8
    pad_w = (-W) % 8
    if pad_h or pad_w:
        frames = jnp.pad(frames, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                         mode="edge")
    prev = frames[:-1]
    nxt = frames[1:]
    flow_fwd = raft_flow(raft_params, prev, nxt, iters)
    if use_occlusion:
        flow_bwd = raft_flow(raft_params, nxt, prev, iters)
        mask = occlusion_mask(flow_fwd, flow_bwd)
    else:
        mask = jnp.ones(prev.shape[:3] + (1,), jnp.float32)
    warped = warp(nxt, flow_fwd)
    if pad_h or pad_w:
        warped = warped[:, :H, :W]
        prev = prev[:, :H, :W]
        mask = mask[:, :H, :W]
    err = jnp.sum(((prev - warped) ** 2) * mask) / (
        jnp.sum(mask) * 3.0 + 1e-8
    )
    return float(err) * 1000.0
