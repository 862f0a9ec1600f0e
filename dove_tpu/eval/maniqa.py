"""MANIQA no-reference IQA — native JAX implementation.

The reference scores no-reference quality via pyiqa, whose ``maniqa`` wraps
the official IIGROUP/MANIQA model (CVPR NTIRE 2022 winner): a ViT-B/8
backbone whose block-6..9 token features are fused by transposed-attention
blocks (TABlock, attention over the CHANNEL axis), two small Swin stages
with scaled stage residuals, and a patch-weighted two-head scorer
(score x sigmoid-weight, normalized by the weight sum).

Weights-gated like LPIPS/DISTS/CLIP-IQA: set ``DOVE_MANIQA_WEIGHTS`` to a
locally exported official checkpoint (``ckpt_koniq10k.pt`` — a torch state
dict of the full MANIQA module; torch-cpu loads it here). The converter
targets the official module's key layout (``vit.*``, ``tablock{1,2}.*``,
``conv{1,2}.*``, ``swintransformer{1,2}.layers.*``, ``fc_{score,weight}.*``)
and reports any unmatched keys loudly. Architecture details follow the
official code, including its TABlock transpose-reshape quirk (the
``(attn @ v).transpose(1, 2).reshape(B, C, N)`` memory reinterpretation);
verify numerically against released weights with scripts/parity_check.py
conventions when available.

Scoring protocol: per frame, ``DOVE_MANIQA_CROPS`` (default 20) random
224x224 crops (official test protocol), averaged; input normalized with
mean=std=0.5 (the official dataloader's convention).
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
class MANIQAConfig:
    img_size: int = 224
    patch_size: int = 8
    vit_width: int = 768
    vit_layers: int = 12
    vit_heads: int = 12
    vit_mlp: int = 3072
    feature_blocks: tuple = (6, 7, 8, 9)  # official extract_feature
    embed_dim: int = 768
    num_tab: int = 2
    depths: tuple = (2, 2)
    num_heads: tuple = (4, 4)
    window_size: int = 4
    dim_mlp: int = 768
    scale: float = 0.8  # koniq checkpoint's stage-residual blend
    eps: float = 1e-6

    @property
    def tokens(self) -> int:
        return (self.img_size // self.patch_size) ** 2  # 784


# --- shared primitives ------------------------------------------------------

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


# --- ViT-B/8 backbone -------------------------------------------------------

def _vit_block(p: Params, x: jnp.ndarray, heads: int, eps: float) -> jnp.ndarray:
    B, S, D = x.shape
    hd = D // heads
    h = _ln(p["norm1"], x, eps)
    qkv = _linear(p["qkv"], h).reshape(B, S, 3, heads, hd)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * (hd ** -0.5), k)
    probs = jax.nn.softmax(logits, axis=-1)
    att = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    x = x + _linear(p["proj"], att.transpose(0, 2, 1, 3).reshape(B, S, D))
    h = _ln(p["norm2"], x, eps)
    h = jax.nn.gelu(_linear(p["fc1"], h), approximate=False)
    return x + _linear(p["fc2"], h)


def _vit_features(cfg: MANIQAConfig, p: Params, images: jnp.ndarray) -> jnp.ndarray:
    """images [B, 224, 224, 3] normalized -> cat block features [B, 784, 4*768]."""
    v = p["vit"]
    x = jax.lax.conv_general_dilated(
        images, v["patch_kernel"],
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + v["patch_bias"]
    B = x.shape[0]
    x = x.reshape(B, cfg.tokens, cfg.vit_width)
    cls = jnp.broadcast_to(v["cls_token"], (B, 1, cfg.vit_width))
    x = jnp.concatenate([cls, x], axis=1) + v["pos_embed"]
    feats = []
    for i, blk in enumerate(v["blocks"]):
        x = _vit_block(blk, x, cfg.vit_heads, cfg.eps)
        if i in cfg.feature_blocks:
            feats.append(x[:, 1:])  # drop cls
    return jnp.concatenate(feats, axis=-1)


# --- TABlock (transposed attention over channels) ---------------------------

def _tablock(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: [B, C, N]. Attention where each CHANNEL is a token; replicates the
    official forward exactly, including its transpose-reshape memory quirk
    ((attn @ v).transpose(1, 2).reshape(B, C, N))."""
    B, C, N = x.shape
    q = _linear(p["c_q"], x)
    k = _linear(p["c_k"], x)
    v = _linear(p["c_v"], x)
    attn = jax.nn.softmax((q @ k.transpose(0, 2, 1)) * (N ** -0.5), axis=-1)
    y = attn @ v  # [B, C, N]
    y = y.transpose(0, 2, 1).reshape(B, C, N)  # official quirk, kept
    return y + x


# --- Swin stage -------------------------------------------------------------

def _rel_pos_bias(table: jnp.ndarray, window: int) -> jnp.ndarray:
    """[(2w-1)^2, nH] bias table -> [nH, w^2, w^2] per-pair bias."""
    coords = np.stack(np.meshgrid(
        np.arange(window), np.arange(window), indexing="ij"
    )).reshape(2, -1)  # [2, w^2]
    rel = coords[:, :, None] - coords[:, None, :]  # [2, w^2, w^2]
    rel = rel.transpose(1, 2, 0) + (window - 1)
    idx = rel[..., 0] * (2 * window - 1) + rel[..., 1]  # [w^2, w^2]
    return table[idx.reshape(-1)].reshape(
        window * window, window * window, -1
    ).transpose(2, 0, 1)


def _window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*nW, w*w, C]."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)


def _window_reverse(x: jnp.ndarray, w: int, B: int, H: int, W: int) -> jnp.ndarray:
    C = x.shape[-1]
    x = x.reshape(B, H // w, W // w, w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def _shift_mask(H: int, W: int, w: int, shift: int) -> np.ndarray:
    """Swin SW-MSA attention mask: [nW, w^2, w^2] additive (-100 blocked)."""
    img = np.zeros((1, H, W, 1))
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    win = np.asarray(_window_partition(jnp.asarray(img), w)).reshape(-1, w * w)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0)


def _swin_block(
    p: Params, x: jnp.ndarray, res: tuple, heads: int, w: int,
    shift: int, eps: float,
) -> jnp.ndarray:
    """x: [B, H*W, C]."""
    H, W = res
    B, L, C = x.shape
    hd = C // heads
    shortcut = x
    h = _ln(p["norm1"], x, eps).reshape(B, H, W, C)
    if shift:
        h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
    wins = _window_partition(h, w)  # [B*nW, w^2, C]
    nW = wins.shape[0] // B
    qkv = _linear(p["qkv"], wins).reshape(-1, w * w, 3, heads, hd)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    logits = jnp.einsum("whqd,whkd->whqk", q * (hd ** -0.5), k)
    logits = logits + _rel_pos_bias(p["rel_bias_table"], w)[None]
    if shift:
        mask = jnp.asarray(_shift_mask(H, W, w, shift), logits.dtype)
        logits = logits.reshape(B, nW, heads, w * w, w * w) + mask[None, :, None]
        logits = logits.reshape(-1, heads, w * w, w * w)
    probs = jax.nn.softmax(logits, axis=-1)
    att = jnp.einsum("whqk,whkd->whqd", probs, v)
    att = _linear(p["proj"], att.transpose(0, 2, 1, 3).reshape(-1, w * w, C))
    h = _window_reverse(att, w, B, H, W)
    if shift:
        h = jnp.roll(h, (shift, shift), axis=(1, 2))
    x = shortcut + h.reshape(B, L, C)
    h = _ln(p["norm2"], x, eps)
    h = jax.nn.gelu(_linear(p["fc1"], h), approximate=False)
    return x + _linear(p["fc2"], h)


def _swin_stage(
    cfg: MANIQAConfig, p: Params, x: jnp.ndarray,
) -> jnp.ndarray:
    """x: [B, C, H, W] -> same; scaled stage residual (official `scale`)."""
    B, C, H, W = x.shape
    shortcut = x
    h = x.transpose(0, 2, 3, 1).reshape(B, H * W, C)
    for li, layer in enumerate(p["layers"]):
        heads = cfg.num_heads[li]
        for bi, blk in enumerate(layer):
            shift = 0 if bi % 2 == 0 else cfg.window_size // 2
            h = _swin_block(
                blk, h, (H, W), heads, cfg.window_size, shift, cfg.eps
            )
    h = h.reshape(B, H, W, C).transpose(0, 3, 1, 2)
    return cfg.scale * h + shortcut


# --- full model -------------------------------------------------------------

def maniqa_forward(
    cfg: MANIQAConfig, p: Params, images: jnp.ndarray
) -> jnp.ndarray:
    """images: [B, 224, 224, 3] in [0, 1] -> scores [B] (higher = better)."""
    x = (images.astype(jnp.float32) - 0.5) / 0.5  # official 0.5/0.5 normalize
    feats = _vit_features(cfg, p, x)  # [B, 784, 3072]
    B = feats.shape[0]
    hw = cfg.img_size // cfg.patch_size
    x = feats.transpose(0, 2, 1)  # [B, 3072, 784]
    for tab in p["tablock1"]:
        x = _tablock(tab, x)
    x = x.reshape(B, -1, hw, hw)
    x = jnp.einsum("bchw,ck->bkhw", x, p["conv1"]["weight"]) \
        + p["conv1"]["bias"][None, :, None, None]
    x = _swin_stage(cfg, p["swin1"], x)
    x = x.reshape(B, cfg.embed_dim, hw * hw)
    for tab in p["tablock2"]:
        x = _tablock(tab, x)
    x = x.reshape(B, cfg.embed_dim, hw, hw)
    x = jnp.einsum("bchw,ck->bkhw", x, p["conv2"]["weight"]) \
        + p["conv2"]["bias"][None, :, None, None]
    x = _swin_stage(cfg, p["swin2"], x)
    x = x.reshape(B, cfg.embed_dim // 2, hw * hw).transpose(0, 2, 1)
    score = _linear(p["fc_score"][1], jax.nn.relu(
        _linear(p["fc_score"][0], x)
    ))
    score = jax.nn.relu(score)
    weight = jax.nn.sigmoid(_linear(p["fc_weight"][1], jax.nn.relu(
        _linear(p["fc_weight"][0], x)
    )))
    return (score * weight).sum((1, 2)) / jnp.maximum(
        weight.sum((1, 2)), 1e-8
    )


# --- checkpoint conversion --------------------------------------------------

def convert_state_dict(sd: dict, cfg: MANIQAConfig) -> Params:
    """Official MANIQA torch state dict -> our params tree. Torch Linear
    weights are [out, in] -> transposed; conv kernels to HWIO / [in, out]."""
    sd = {k: np.asarray(v, np.float32) for k, v in sd.items()}
    used = set()

    def take(key):
        used.add(key)
        return sd[key]

    def lin(prefix):
        out = {"weight": take(f"{prefix}.weight").T}
        if f"{prefix}.bias" in sd:
            out["bias"] = take(f"{prefix}.bias")
        return out

    def lnp(prefix):
        return {"weight": take(f"{prefix}.weight"), "bias": take(f"{prefix}.bias")}

    vit = {
        "cls_token": take("vit.cls_token")[0],
        "pos_embed": take("vit.pos_embed")[0],
        "patch_kernel": take("vit.patch_embed.proj.weight").transpose(2, 3, 1, 0),
        "patch_bias": take("vit.patch_embed.proj.bias"),
        "blocks": [
            {
                "norm1": lnp(f"vit.blocks.{i}.norm1"),
                "qkv": lin(f"vit.blocks.{i}.attn.qkv"),
                "proj": lin(f"vit.blocks.{i}.attn.proj"),
                "norm2": lnp(f"vit.blocks.{i}.norm2"),
                "fc1": lin(f"vit.blocks.{i}.mlp.fc1"),
                "fc2": lin(f"vit.blocks.{i}.mlp.fc2"),
            }
            for i in range(cfg.vit_layers)
        ],
    }

    def tabs(prefix):
        out = []
        i = 0
        while f"{prefix}.{i}.c_q.weight" in sd:
            out.append({
                "c_q": lin(f"{prefix}.{i}.c_q"),
                "c_k": lin(f"{prefix}.{i}.c_k"),
                "c_v": lin(f"{prefix}.{i}.c_v"),
            })
            i += 1
        return out

    def conv1x1(prefix):
        return {
            "weight": take(f"{prefix}.weight")[:, :, 0, 0].T,  # [in, out]
            "bias": take(f"{prefix}.bias"),
        }

    def swin(prefix):
        layers = []
        li = 0
        while f"{prefix}.layers.{li}.blocks.0.norm1.weight" in sd:
            blocks = []
            bi = 0
            while f"{prefix}.layers.{li}.blocks.{bi}.norm1.weight" in sd:
                b = f"{prefix}.layers.{li}.blocks.{bi}"
                # the precomputed relative_position_index buffer (if saved)
                # is recomputed here instead
                used.add(f"{b}.attn.relative_position_index")
                blocks.append({
                    "norm1": lnp(f"{b}.norm1"),
                    "qkv": lin(f"{b}.attn.qkv"),
                    "proj": lin(f"{b}.attn.proj"),
                    "rel_bias_table": take(
                        f"{b}.attn.relative_position_bias_table"
                    ),
                    "norm2": lnp(f"{b}.norm2"),
                    "fc1": lin(f"{b}.mlp.fc1"),
                    "fc2": lin(f"{b}.mlp.fc2"),
                })
                bi += 1
            layers.append(blocks)
            li += 1
        return {"layers": layers}

    params = {
        "vit": vit,
        "tablock1": tabs("tablock1"),
        "conv1": conv1x1("conv1"),
        "swin1": swin("swintransformer1"),
        "tablock2": tabs("tablock2"),
        "conv2": conv1x1("conv2"),
        "swin2": swin("swintransformer2"),
        # Sequential indices: 0 Linear, (1 ReLU, 2 Dropout,) 3 Linear
        "fc_score": [lin("fc_score.0"), lin("fc_score.3")],
        "fc_weight": [lin("fc_weight.0"), lin("fc_weight.3")],
    }
    unmatched = {
        k for k in sd
        if k not in used and not k.startswith("vit.")  # backbone extras
        and "relative_position_index" not in k
    }
    if unmatched:
        raise ValueError(
            f"MANIQA checkpoint keys not understood: {sorted(unmatched)[:10]}"
            f" (+{max(len(unmatched) - 10, 0)} more) — layout drift from the"
            " official IIGROUP/MANIQA module?"
        )
    return jax.tree.map(jnp.asarray, params)


def load_maniqa(path: str, cfg: MANIQAConfig | None = None):
    cfg = cfg or MANIQAConfig()
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "model_state_dict"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    sd = {k.removeprefix("module."): v.numpy() for k, v in sd.items()}
    return cfg, convert_state_dict(sd, cfg)


def maniqa_metric(params_path: str | None = None):
    """-> fn(pred [F, H, W, 3] float [0,1]) -> mean MANIQA score.

    Official test protocol: DOVE_MANIQA_CROPS (default 20) random 224x224
    crops per frame, averaged (fixed seed for reproducibility)."""
    path = params_path or os.environ.get("DOVE_MANIQA_WEIGHTS")
    if not path or not os.path.exists(path):
        raise NotImplementedError(
            "MANIQA needs the official pretrained checkpoint: set "
            "DOVE_MANIQA_WEIGHTS to a local ckpt_koniq10k.pt "
            "(IIGROUP/MANIQA; no downloads available here)"
        )
    cfg, params = load_maniqa(path)
    n_crops = int(os.environ.get("DOVE_MANIQA_CROPS", "20"))
    fwd = jax.jit(lambda imgs: maniqa_forward(cfg, params, imgs))

    def fn(pred: np.ndarray) -> float:
        rng = np.random.default_rng(0)
        s = cfg.img_size
        scores = []
        for frame in pred:
            H, W = frame.shape[:2]
            if H < s or W < s:
                pad = ((0, max(s - H, 0)), (0, max(s - W, 0)), (0, 0))
                frame = np.pad(frame, pad, mode="reflect")
                H, W = frame.shape[:2]
            crops = np.stack([
                frame[y : y + s, x : x + s]
                for y, x in zip(
                    rng.integers(0, H - s + 1, n_crops),
                    rng.integers(0, W - s + 1, n_crops),
                )
            ])
            scores.append(float(np.mean(np.asarray(fwd(jnp.asarray(crops))))))
        return float(np.mean(scores))

    return fn
