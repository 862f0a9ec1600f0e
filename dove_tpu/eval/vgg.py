"""VGG16 feature backbone + LPIPS / DISTS perceptual metrics (JAX).

The reference scores and trains with pyiqa's LPIPS/DISTS (eval at
eval_metrics.py:100-152, stage-2 perceptual loss at
lora_one_s2_trainer.py:240-277). These reimplement the exact published
formulations natively:

  * LPIPS (Zhang et al. 2018, net='vgg'): inputs in [-1, 1], fixed
    shift/scale normalization, VGG16 relu{1_2,2_2,3_3,4_3,5_3} features,
    channel-unit-normalized squared differences through learned 1x1 "lin"
    heads, spatially averaged and summed over stages;
  * DISTS (Ding et al. 2020): inputs in [0, 1], ImageNet normalization,
    VGG16 stages with L2 (energy) pooling, per-channel alpha/beta-weighted
    SSIM-style mean/covariance similarity over 6 scales (input + 5 stages),
    distance = 1 - similarity.

Pretrained weights load from torch state-dict files (torchvision VGG16
``features.*`` naming for the backbone; lpips ``lin{k}.model.1.weight`` and
DISTS ``alpha``/``beta`` for the heads). No torch dependency at runtime
beyond reading the file (falls back to safetensors when given one).

All functions are pure/jittable and differentiable, so `dists_distance`
doubles as the stage-2 training loss.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, layers) per stage, maxpool between stages
VGG16_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))

# LPIPS input normalization (on [-1, 1] inputs)
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# DISTS / ImageNet normalization (on [0, 1] inputs)
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Backbone
# ---------------------------------------------------------------------------

def _conv(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(x.dtype)


def _max_pool(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _l2_pool(x: jnp.ndarray) -> jnp.ndarray:
    """Energy pooling (DISTS): sqrt of hann-windowed average of squares."""
    w1 = np.hanning(5)[1:-1]  # [0.5, 1.0, 0.5]
    w2 = np.outer(w1, w1)
    w2 = (w2 / w2.sum()).astype(np.float32)
    C = x.shape[-1]
    kernel = jnp.asarray(w2)[:, :, None, None] * jnp.eye(C, dtype=x.dtype)
    sq = jax.lax.conv_general_dilated(
        (x * x), kernel.astype(x.dtype), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=1,
    )
    return jnp.sqrt(jnp.maximum(sq, 1e-12))


def vgg16_features(
    params: list[list[Params]], x: jnp.ndarray, pool: str = "max"
) -> list[jnp.ndarray]:
    """x: [B, H, W, 3] (normalized) -> 5 stage outputs (post final relu of
    each stage, pre-pool), NHWC."""
    feats = []
    pool_fn = _max_pool if pool == "max" else _l2_pool
    h = x
    for si, stage in enumerate(params):
        for conv in stage:
            h = jax.nn.relu(_conv(conv, h))
        feats.append(h)
        if si < len(params) - 1:
            h = pool_fn(h)
    return feats


def init_vgg16(key: jax.Array, dtype=jnp.float32) -> list[list[Params]]:
    params = []
    cin = 3
    for cout, layers in VGG16_STAGES:
        stage = []
        for _ in range(layers):
            key, k = jax.random.split(key)
            stage.append({
                "kernel": jax.random.normal(k, (3, 3, cin, cout), dtype)
                * (2.0 / (9 * cin)) ** 0.5,
                "bias": jnp.zeros((cout,), dtype),
            })
            cin = cout
        params.append(stage)
    return params


def vgg16_from_torch_sd(sd: dict[str, np.ndarray]) -> list[list[Params]]:
    """torchvision VGG16 ``features.{idx}.weight`` layout -> our stage list.

    Also accepts pyiqa/lpips-style prefixed keys (``net.slice*``) by falling
    back to sorting all 4D conv kernels in order.
    """
    convs = []
    if any(k.startswith("features.") for k in sd):
        idxs = sorted(
            int(k.split(".")[1]) for k in sd
            if k.startswith("features.") and k.endswith(".weight")
            and sd[k].ndim == 4
        )
        for i in idxs:
            convs.append((sd[f"features.{i}.weight"], sd[f"features.{i}.bias"]))
    else:
        ws = [k for k in sorted(sd) if k.endswith(".weight") and sd[k].ndim == 4
              and sd[k].shape[2:] == (3, 3)]
        for k in ws:
            convs.append((sd[k], sd[k.replace(".weight", ".bias")]))

    params = []
    ci = 0
    for _, layers in VGG16_STAGES:
        stage = []
        for _ in range(layers):
            w, b = convs[ci]
            ci += 1
            stage.append({
                "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), jnp.float32),
                "bias": jnp.asarray(b, jnp.float32),
            })
        params.append(stage)
    return params


# ---------------------------------------------------------------------------
# LPIPS
# ---------------------------------------------------------------------------

def _unit_normalize(f: jnp.ndarray) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
    return f / (norm + 1e-10)


def lpips_distance(
    vgg: list[list[Params]],
    lins: list[jnp.ndarray],  # per stage [C] non-negative 1x1 weights
    x: jnp.ndarray,
    y: jnp.ndarray,
) -> jnp.ndarray:
    """x, y: [B, H, W, 3] in [-1, 1] -> [B] LPIPS distances."""
    shift = jnp.asarray(_LPIPS_SHIFT)
    scale = jnp.asarray(_LPIPS_SCALE)
    xn = (x - shift) / scale
    yn = (y - shift) / scale
    fx = vgg16_features(vgg, xn)
    fy = vgg16_features(vgg, yn)
    total = 0.0
    for f1, f2, w in zip(fx, fy, lins):
        d = (_unit_normalize(f1.astype(jnp.float32))
             - _unit_normalize(f2.astype(jnp.float32))) ** 2
        val = jnp.mean(jnp.sum(d * w[None, None, None, :], axis=-1), axis=(1, 2))
        total = total + val
    return total


# ---------------------------------------------------------------------------
# DISTS
# ---------------------------------------------------------------------------

def dists_distance(
    vgg: list[list[Params]],
    alpha: list[jnp.ndarray],  # 6 scales of per-channel weights
    beta: list[jnp.ndarray],
    x: jnp.ndarray,
    y: jnp.ndarray,
) -> jnp.ndarray:
    """x, y: [B, H, W, 3] in [0, 1] -> [B] DISTS distances."""
    mean = jnp.asarray(_IMAGENET_MEAN)
    std = jnp.asarray(_IMAGENET_STD)
    xn = (x - mean) / std
    yn = (y - mean) / std
    fx = [xn] + vgg16_features(vgg, xn, pool="l2")
    fy = [yn] + vgg16_features(vgg, yn, pool="l2")

    w_sum = sum(jnp.sum(a) for a in alpha) + sum(jnp.sum(b) for b in beta)
    c1 = c2 = 1e-6
    score = 0.0
    for f1, f2, a, b in zip(fx, fy, alpha, beta):
        f1 = f1.astype(jnp.float32)
        f2 = f2.astype(jnp.float32)
        mu1 = jnp.mean(f1, axis=(1, 2))
        mu2 = jnp.mean(f2, axis=(1, 2))
        var1 = jnp.mean(f1 * f1, axis=(1, 2)) - mu1**2
        var2 = jnp.mean(f2 * f2, axis=(1, 2)) - mu2**2
        cov = jnp.mean(f1 * f2, axis=(1, 2)) - mu1 * mu2
        s1 = (2 * mu1 * mu2 + c1) / (mu1**2 + mu2**2 + c1)
        s2 = (2 * cov + c2) / (var1 + var2 + c2)
        score = score + jnp.sum(a * s1 + b * s2, axis=-1)
    return 1.0 - score / w_sum


def init_dists_weights(vgg_stages=VGG16_STAGES):
    """Uniform alpha/beta (each scale's channels sum to comparable mass)."""
    chans = [3] + [c for c, _ in vgg_stages]
    alpha = [jnp.ones((c,), jnp.float32) for c in chans]
    beta = [jnp.ones((c,), jnp.float32) for c in chans]
    return alpha, beta


# ---------------------------------------------------------------------------
# Weight-file loading (torch state dicts exported from pyiqa/lpips/DISTS)
# ---------------------------------------------------------------------------

def _read_state_dict(path: str | Path) -> dict[str, np.ndarray]:
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors import safe_open

        with safe_open(str(path), framework="np") as fp:
            return {k: fp.get_tensor(k) for k in fp.keys()}
    import torch

    sd = torch.load(str(path), map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}


def load_lpips(path: str | Path):
    """Load an exported lpips(net='vgg') state dict -> callable metric
    (pred, gt) -> float. Videos enter as [F, H, W, 3] in [0, 1]."""
    sd = _read_state_dict(path)
    vgg = vgg16_from_torch_sd(sd)
    lins = []
    for k in range(5):
        for cand in (f"lins.{k}.model.1.weight", f"lin{k}.model.1.weight"):
            if cand in sd:
                lins.append(jnp.asarray(sd[cand][:, :, 0, 0][0], jnp.float32))
                break
        else:
            raise KeyError(f"no lin head {k} in {path}")

    @jax.jit
    def _d(x, y):
        return lpips_distance(vgg, lins, x, y)

    def metric(pred: np.ndarray, gt: np.ndarray) -> float:
        x = jnp.asarray(pred, jnp.float32) * 2 - 1
        y = jnp.asarray(gt, jnp.float32) * 2 - 1
        return float(jnp.mean(_d(x, y)))

    return metric


def load_dists(path: str | Path):
    """Load an exported DISTS state dict -> callable metric (pred, gt)."""
    sd = _read_state_dict(path)
    vgg = vgg16_from_torch_sd(sd)
    chans = [3] + [c for c, _ in VGG16_STAGES]
    alpha_flat = np.asarray(sd["alpha"]).reshape(-1)
    beta_flat = np.asarray(sd["beta"]).reshape(-1)
    alpha, beta, off = [], [], 0
    for c in chans:
        alpha.append(jnp.asarray(alpha_flat[off : off + c], jnp.float32))
        beta.append(jnp.asarray(beta_flat[off : off + c], jnp.float32))
        off += c

    @jax.jit
    def _d(x, y):
        return dists_distance(vgg, alpha, beta, x, y)

    def metric(pred: np.ndarray, gt: np.ndarray) -> float:
        return float(jnp.mean(_d(jnp.asarray(pred, jnp.float32),
                                 jnp.asarray(gt, jnp.float32))))

    return metric
