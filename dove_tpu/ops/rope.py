"""3D rotary positional embeddings for the CogVideoX DiT.

Semantics mirror diffusers' ``get_3d_rotary_pos_embed(..., grid_type="slice")``
as used by the reference at /root/reference/inference_script.py:364-392: the
head dim D splits into (D/4 temporal, 3D/8 height, 3D/8 width) bands, each a
standard 1D rotary table over integer grid positions, broadcast over the
(T, H, W) token grid and flattened in T-major, then H, then W order — matching
the DiT's patchify token order. Frequencies are repeated in interleaved pairs
(cos0, cos0, cos1, cos1, ...) and rotation acts on interleaved (even, odd)
lanes.

Everything is computed in float32 on host/device at trace time; for a fixed
tile geometry the tables are compile-time constants folded by XLA.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _rope_1d(dim: int, length: int, theta: float) -> tuple[np.ndarray, np.ndarray]:
    """1D rotary tables (cos, sin), each (length, dim), pairs interleaved."""
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    angles = np.outer(np.arange(length, dtype=np.float64), freqs)  # (L, dim/2)
    cos = np.repeat(np.cos(angles), 2, axis=1).astype(np.float32)
    sin = np.repeat(np.sin(angles), 2, axis=1).astype(np.float32)
    return cos, sin


@functools.lru_cache(maxsize=64)
def _rope_3d_np(
    head_dim: int,
    num_frames: int,
    grid_h: int,
    grid_w: int,
    theta: float,
) -> tuple[np.ndarray, np.ndarray]:
    dim_t = head_dim // 4
    dim_h = head_dim // 8 * 3
    dim_w = head_dim // 8 * 3
    assert dim_t + dim_h + dim_w == head_dim, "head_dim must be divisible by 8"

    cos_t, sin_t = _rope_1d(dim_t, num_frames, theta)
    cos_h, sin_h = _rope_1d(dim_h, grid_h, theta)
    cos_w, sin_w = _rope_1d(dim_w, grid_w, theta)

    def combine(t: np.ndarray, h: np.ndarray, w: np.ndarray) -> np.ndarray:
        t3 = np.broadcast_to(t[:, None, None, :], (num_frames, grid_h, grid_w, dim_t))
        h3 = np.broadcast_to(h[None, :, None, :], (num_frames, grid_h, grid_w, dim_h))
        w3 = np.broadcast_to(w[None, None, :, :], (num_frames, grid_h, grid_w, dim_w))
        return np.concatenate([t3, h3, w3], axis=-1).reshape(-1, head_dim)

    return combine(cos_t, cos_h, cos_w), combine(sin_t, sin_h, sin_w)


def rope_3d(
    head_dim: int,
    num_frames: int,
    grid_h: int,
    grid_w: int,
    theta: float = 10000.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(cos, sin) tables of shape (T*H*W, head_dim) for the video token grid.

    ``num_frames`` is the number of *temporal patches* (latent frames divided by
    patch_size_t); grid_h/grid_w are latent H/W divided by patch_size. The
    NumPy tables are host-cached; the jnp conversion is a trace-time constant.
    """
    cos, sin = _rope_3d_np(head_dim, num_frames, grid_h, grid_w, theta)
    return jnp.asarray(cos), jnp.asarray(sin)


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate interleaved (even, odd) pairs: out = x*cos + rot(x)*sin.

    x: [..., S, D]; cos/sin: [S, D]. Computed in fp32, cast back to x.dtype.
    """
    xf = x.astype(jnp.float32)
    x2 = xf.reshape(*xf.shape[:-1], -1, 2)
    rotated = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(xf.shape)
    out = xf * cos + rotated * sin
    return out.astype(x.dtype)
