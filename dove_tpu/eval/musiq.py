"""MUSIQ no-reference IQA — native JAX implementation.

The reference scores ``musiq`` through pyiqa
(/root/reference/eval_metrics.py:100-152); pyiqa wraps google-research's
MUSIQ (Ke et al., "MUSIQ: Multi-scale Image Quality Transformer", ICCV
2021). Implemented here from the paper:

  * multi-scale input: the native-resolution image plus aspect-ratio-
    preserved (ARP) resizes with longer side 224 and 384 — 3 "scales";
  * 32x32 non-overlapping patches from each scale (zero-padded to full
    patches), linearly projected to D=384;
  * hash-based 2D spatial embedding: a patch at grid cell (i, j) of an
    (n_rows, n_cols) grid indexes a learned G x G (G=10) table at
    (floor(i*G/n_rows), floor(j*G/n_cols)) — resolution-independent;
  * a learned per-scale embedding added to every patch of that scale
    (index 0 = native resolution, then ascending ARP longer sides);
  * CLS token + 14-layer pre-LN transformer (D=384, 6 heads, MLP 1152);
  * final LayerNorm, single-logit head on the CLS token (koniq-10k
    regression — higher is better).

Weights-gated like the other learned metrics: set ``DOVE_MUSIQ_WEIGHTS`` to
a locally exported torch state dict of the model. The converter
(:func:`convert_state_dict`) targets the canonical flat layout documented
there, tolerates common prefixes and fused/split qkv variants, and reports
every unmatched key loudly. Conventions that released checkpoints must pin
(documented in PARITY.md until a real checkpoint is available here): input
range (default [0, 1], override ``DOVE_MUSIQ_INPUT=byte`` for [0, 255]),
the ARP resize filter (bilinear), and the scale-embedding row order.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MUSIQConfig:
    patch_size: int = 32
    hidden: int = 384
    num_layers: int = 14
    num_heads: int = 6
    mlp_dim: int = 1152
    hse_grid: int = 10  # hash-based spatial embedding grid (G x G)
    longer_sides: tuple = (224, 384)  # ARP scales; native rides along
    num_class: int = 1
    eps: float = 1e-6
    # cap on native-scale patches (0 = unlimited): huge inputs can be
    # bounded like pyiqa's max_seq_len_from_original_res
    max_native_patches: int = 0

    @property
    def num_scales(self) -> int:
        return 1 + len(self.longer_sides)

    @property
    def patch_dim(self) -> int:
        return 3 * self.patch_size * self.patch_size


# --- multi-scale patch extraction (host side, NumPy) ------------------------

def _arp_resize(img: np.ndarray, longer: int) -> np.ndarray:
    """Aspect-ratio-preserving resize so max(H, W) == longer (bilinear)."""
    import cv2

    h, w = img.shape[:2]
    scale = longer / max(h, w)
    nh, nw = max(int(round(h * scale)), 1), max(int(round(w * scale)), 1)
    return cv2.resize(img, (nw, nh), interpolation=cv2.INTER_LINEAR)


def _grid_patches(cfg: MUSIQConfig, img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[H, W, 3] -> (patches [N, 3*P*P], hse_index [N]) with zero padding to
    full patches; N = ceil(H/P) * ceil(W/P)."""
    P, G = cfg.patch_size, cfg.hse_grid
    h, w = img.shape[:2]
    n_rows, n_cols = -(-h // P), -(-w // P)
    pad = np.zeros((n_rows * P, n_cols * P, 3), img.dtype)
    pad[:h, :w] = img
    patches = (
        pad.reshape(n_rows, P, n_cols, P, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(n_rows * n_cols, -1)
    )
    ii, jj = np.meshgrid(np.arange(n_rows), np.arange(n_cols), indexing="ij")
    gi = np.minimum((ii * G) // n_rows, G - 1)
    gj = np.minimum((jj * G) // n_cols, G - 1)
    return patches, (gi * G + gj).reshape(-1)


def multiscale_tokens(
    cfg: MUSIQConfig, frame: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """[H, W, 3] float in [0,1] -> (patches [N, 3P^2], hse_idx [N],
    scale_idx [N]) across native + ARP scales. Scale index 0 is the native
    resolution; ARP scales follow in ``longer_sides`` order."""
    if os.environ.get("DOVE_MUSIQ_INPUT", "unit") == "byte":
        frame = frame * 255.0
    parts, hse, scales = [], [], []
    for s_idx, img in enumerate(
        [frame] + [_arp_resize(frame, L) for L in cfg.longer_sides]
    ):
        p, g = _grid_patches(cfg, img)
        if s_idx == 0 and cfg.max_native_patches and len(p) > cfg.max_native_patches:
            keep = np.linspace(0, len(p) - 1, cfg.max_native_patches).astype(int)
            p, g = p[keep], g[keep]
        parts.append(p)
        hse.append(g)
        scales.append(np.full(len(p), s_idx, np.int32))
    return (
        np.concatenate(parts).astype(np.float32),
        np.concatenate(hse).astype(np.int32),
        np.concatenate(scales),
    )


# --- transformer ------------------------------------------------------------

def _ln(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)) * p["weight"] + p["bias"]


def _linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["weight"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _block(p: Params, x: jnp.ndarray, heads: int, eps: float) -> jnp.ndarray:
    S, D = x.shape
    hd = D // heads
    h = _ln(p["norm1"], x, eps)
    qkv = _linear(p["qkv"], h).reshape(S, 3, heads, hd)
    q, k, v = (qkv[:, i].transpose(1, 0, 2) for i in range(3))
    logits = jnp.einsum("hqd,hkd->hqk", q * (hd ** -0.5), k)
    att = jnp.einsum("hqk,hkd->hqd", jax.nn.softmax(logits, -1), v)
    x = x + _linear(p["proj"], att.transpose(1, 0, 2).reshape(S, D))
    h = _ln(p["norm2"], x, eps)
    h = jax.nn.gelu(_linear(p["fc1"], h), approximate=False)
    return x + _linear(p["fc2"], h)


def musiq_forward(
    cfg: MUSIQConfig,
    params: Params,
    patches: jnp.ndarray,  # [N, 3*P*P]
    hse_idx: jnp.ndarray,  # [N] int
    scale_idx: jnp.ndarray,  # [N] int
) -> jnp.ndarray:
    """Score one multi-scale token sequence -> scalar quality logit."""
    tok = _linear(params["embedding"], patches)
    tok = tok + params["spatial_embedding"][hse_idx]
    tok = tok + params["scale_embedding"][scale_idx]
    x = jnp.concatenate([params["cls_token"].reshape(1, -1), tok], axis=0)
    for blk in params["blocks"]:
        x = _block(blk, x, cfg.num_heads, cfg.eps)
    x = _ln(params["norm"], x, cfg.eps)
    return _linear(params["head"], x[0]).reshape(())


# --- init / converter -------------------------------------------------------

def init_musiq_params(key: jax.Array, cfg: MUSIQConfig) -> Params:
    ks = iter(jax.random.split(key, 8 + 6 * cfg.num_layers))

    def lin(din, dout, scale=None):
        s = scale if scale is not None else (1.0 / np.sqrt(din))
        return {
            "weight": jax.random.normal(next(ks), (din, dout)) * s,
            "bias": jnp.zeros((dout,)),
        }

    def lnp():
        return {"weight": jnp.ones((cfg.hidden,)), "bias": jnp.zeros((cfg.hidden,))}

    blocks = []
    for _ in range(cfg.num_layers):
        blocks.append({
            "norm1": lnp(),
            "qkv": lin(cfg.hidden, 3 * cfg.hidden),
            "proj": lin(cfg.hidden, cfg.hidden),
            "norm2": lnp(),
            "fc1": lin(cfg.hidden, cfg.mlp_dim),
            "fc2": lin(cfg.mlp_dim, cfg.hidden),
        })
    return {
        "embedding": lin(cfg.patch_dim, cfg.hidden),
        "cls_token": jax.random.normal(next(ks), (1, 1, cfg.hidden)) * 0.02,
        "spatial_embedding": jax.random.normal(
            next(ks), (cfg.hse_grid**2, cfg.hidden)
        ) * 0.02,
        "scale_embedding": jax.random.normal(
            next(ks), (cfg.num_scales, cfg.hidden)
        ) * 0.02,
        "blocks": blocks,
        "norm": lnp(),
        "head": lin(cfg.hidden, cfg.num_class),
    }


def convert_state_dict(sd: dict, cfg: MUSIQConfig | None = None) -> Params:
    """Torch state dict -> JAX param tree.

    Canonical flat layout (torch Linear convention, [out, in] weights):
      embedding.{weight,bias}           [D, 3*P*P]
      cls_token                         [1, 1, D] (or [D])
      spatial_embedding                 [G*G, D] (or [G, G, D])
      scale_embedding                   [num_scales, D]
      transformer.{i}.norm1.{weight,bias}
      transformer.{i}.attn.qkv.{weight,bias}      (or .attn.{q,k,v}.* split)
      transformer.{i}.attn.proj.{weight,bias}
      transformer.{i}.norm2.{weight,bias}
      transformer.{i}.mlp.fc1.{weight,bias}
      transformer.{i}.mlp.fc2.{weight,bias}
      norm.{weight,bias}
      head.{weight,bias}

    Common wrapper prefixes (``module.``, ``net.``, ``model.``) are
    stripped. Unmatched checkpoint keys and missing targets are both
    reported in the raised error / returned tree, never silently dropped.
    """
    cfg = cfg or MUSIQConfig()
    sd = {k.split(".", 1)[1] if k.split(".", 1)[0] in ("module", "net", "model")
          else k: np.asarray(v) for k, v in sd.items()}
    used: set[str] = set()

    def take(key):
        used.add(key)
        return jnp.asarray(np.asarray(sd[key], np.float32))

    def lin(prefix):
        p = {"weight": take(f"{prefix}.weight").T}
        if f"{prefix}.bias" in sd:
            p["bias"] = take(f"{prefix}.bias")
        return p

    def lnp(prefix):
        return {"weight": take(f"{prefix}.weight"), "bias": take(f"{prefix}.bias")}

    def attn_qkv(prefix):
        if f"{prefix}.qkv.weight" in sd:
            return lin(f"{prefix}.qkv")
        # split q/k/v -> fused [D, 3D] (column blocks in q, k, v order)
        w = jnp.concatenate(
            [take(f"{prefix}.{n}.weight").T for n in ("q", "k", "v")], axis=1
        )
        p = {"weight": w}
        if f"{prefix}.q.bias" in sd:
            p["bias"] = jnp.concatenate(
                [take(f"{prefix}.{n}.bias") for n in ("q", "k", "v")]
            )
        return p

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"transformer.{i}"
        blocks.append({
            "norm1": lnp(f"{pre}.norm1"),
            "qkv": attn_qkv(f"{pre}.attn"),
            "proj": lin(f"{pre}.attn.proj"),
            "norm2": lnp(f"{pre}.norm2"),
            "fc1": lin(f"{pre}.mlp.fc1"),
            "fc2": lin(f"{pre}.mlp.fc2"),
        })
    spatial = take("spatial_embedding").reshape(cfg.hse_grid**2, cfg.hidden)
    params = {
        "embedding": lin("embedding"),
        "cls_token": take("cls_token").reshape(1, 1, cfg.hidden),
        "spatial_embedding": spatial,
        "scale_embedding": take("scale_embedding").reshape(
            cfg.num_scales, cfg.hidden
        ),
        "blocks": blocks,
        "norm": lnp("norm"),
        "head": lin("head"),
    }
    unmatched = sorted(set(sd) - used)
    if unmatched:
        raise ValueError(
            f"MUSIQ converter: {len(unmatched)} unmatched checkpoint keys "
            f"(first 20): {unmatched[:20]} — adjust the key map in "
            f"dove_tpu/eval/musiq.py:convert_state_dict"
        )
    return params


def load_musiq(path: str, cfg: MUSIQConfig | None = None) -> Params:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return convert_state_dict(
        {k: v.numpy() for k, v in sd.items()}, cfg or MUSIQConfig()
    )


def musiq_metric(params_path: str | None = None):
    """Frame-averaged MUSIQ scorer for [F, H, W, 3] clips in [0, 1].

    Weights-gated: needs DOVE_MUSIQ_WEIGHTS (or params_path) pointing at an
    exported torch state dict (no pyiqa / downloads in this environment)."""
    path = params_path or os.environ.get("DOVE_MUSIQ_WEIGHTS")
    if not path or not os.path.exists(path):
        raise NotImplementedError(
            "MUSIQ needs pretrained weights: set DOVE_MUSIQ_WEIGHTS to a "
            "locally exported state dict of the koniq-trained model (the "
            "reference obtains it via pyiqa's `musiq`; see "
            "dove_tpu/eval/musiq.py:convert_state_dict for the layout)"
        )
    cfg = MUSIQConfig()
    params = load_musiq(path, cfg)
    fwd = jax.jit(
        lambda pa, h, s: musiq_forward(cfg, params, pa, h, s)
    )

    def fn(pred: np.ndarray) -> float:
        vals = []
        for frame in pred:
            pa, h, s = multiscale_tokens(cfg, np.asarray(frame, np.float32))
            vals.append(float(fwd(jnp.asarray(pa), jnp.asarray(h), jnp.asarray(s))))
        return float(np.mean(vals))

    return fn
