"""CLIP towers (ViT-B/32 and RN50) + CLIP-IQA metric — TPU-native JAX.

The reference scores no-reference quality with pyiqa's ``clipiqa``
(/root/reference/eval_metrics.py:100-152; the VideoLQ row of BASELINE.md is
no-reference-only). This module implements the metric natively: a CLIP image
tower and text tower, and the CLIP-IQA antonym-prompt score

    s = softmax([sim(img, "Good photo."), sim(img, "Bad photo.")])[good]

Two backbones, selected by the checkpoint:

  * ``DOVE_CLIP_WEIGHTS`` -> a DIRECTORY: HuggingFace CLIPModel snapshot
    (e.g. openai/clip-vit-base-patch32) — ViT tower at 224x224 with the
    standard CLIP resize preprocessing;
  * ``DOVE_CLIP_WEIGHTS`` -> a FILE (.pt): an OpenAI-layout CLIP RN50
    state dict (``visual.conv1.weight`` ... ``visual.attnpool.*``) — the
    pyiqa clipiqa default: the modified ResNet-50 (anti-aliased strides,
    attention pooling) run at NATIVE resolution with the attnpool's
    positional embedding DROPPED (CLIP-IQA's convention for arbitrary
    input sizes). Tokenizer files (HF CLIPTokenizer) must sit next to the
    .pt or in ``DOVE_CLIP_TOKENIZER``.

Weights-gated like LPIPS/DISTS (no downloads in this environment).
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]

# CLIP preprocessing constants (OpenAI)
_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)

GOOD_PROMPT = "Good photo."
BAD_PROMPT = "Bad photo."


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    # vision (ViT-B/32 defaults)
    image_size: int = 224
    patch_size: int = 32
    vision_width: int = 768
    vision_layers: int = 12
    vision_heads: int = 12
    # text
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 512
    text_layers: int = 12
    text_heads: int = 8
    # joint
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5


def _ln(x: jnp.ndarray, p: Params, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def _mha(p: Params, x: jnp.ndarray, heads: int, causal: bool, eps: float):
    B, S, D = x.shape
    hd = D // heads

    def proj(name):
        return _linear(p[name], x).reshape(B, S, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = proj("q"), proj("k"), proj("v")
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q * (hd**-0.5), k, preferred_element_type=jnp.float32
    )
    if causal:
        mask = jnp.tril(jnp.ones((S, S), bool))
        logits = jnp.where(mask, logits, -1e9)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return _linear(p["out"], out.transpose(0, 2, 1, 3).reshape(B, S, D))


def _block(p: Params, x: jnp.ndarray, heads: int, causal: bool, eps: float):
    x = x + _mha(p["attn"], _ln(x, p["ln1"], eps), heads, causal, eps)
    h = _ln(x, p["ln2"], eps)
    h = _quick_gelu(_linear(p["fc1"], h))
    return x + _linear(p["fc2"], h)


def encode_image(cfg: CLIPConfig, p: Params, images: jnp.ndarray) -> jnp.ndarray:
    """images: [B, 224, 224, 3], CLIP-normalized -> unit-norm [B, proj_dim]."""
    v = p["vision"]
    x = jax.lax.conv_general_dilated(
        images, v["patch_embed"]["kernel"].astype(images.dtype),
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    B = x.shape[0]
    x = x.reshape(B, -1, cfg.vision_width)
    cls = jnp.broadcast_to(
        v["class_embed"].astype(x.dtype), (B, 1, cfg.vision_width)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + v["pos_embed"].astype(x.dtype)
    x = _ln(x, v["pre_ln"], cfg.layer_norm_eps)
    for blk in v["blocks"]:
        x = _block(blk, x, cfg.vision_heads, False, cfg.layer_norm_eps)
    x = _ln(x[:, 0], v["post_ln"], cfg.layer_norm_eps)
    x = x @ p["visual_projection"].astype(x.dtype)
    return x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True).astype(x.dtype)


def encode_text(cfg: CLIPConfig, p: Params, ids: jnp.ndarray) -> jnp.ndarray:
    """ids: [B, S] int32 (padded after EOT) -> unit-norm [B, proj_dim]."""
    t = p["text"]
    x = t["token_embed"][ids]
    x = x + t["pos_embed"][: x.shape[1]].astype(x.dtype)
    for blk in t["blocks"]:
        x = _block(blk, x, cfg.text_heads, True, cfg.layer_norm_eps)
    x = _ln(x, t["final_ln"], cfg.layer_norm_eps)
    eot = jnp.argmax(ids, axis=-1)  # EOT has the highest token id in CLIP
    x = x[jnp.arange(x.shape[0]), eot]
    x = x @ p["text_projection"].astype(x.dtype)
    return x / jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True).astype(x.dtype)


# ---------------------------------------------------------------------------
# HF checkpoint loading (transformers CLIPModel layout)
# ---------------------------------------------------------------------------

def _conv_block(sd, prefix: str) -> Params:
    def lin(name, hf):
        return {
            "kernel": jnp.asarray(sd[f"{prefix}.{hf}.weight"].T, jnp.float32),
            "bias": jnp.asarray(sd[f"{prefix}.{hf}.bias"], jnp.float32),
        }

    def ln(hf):
        return {
            "scale": jnp.asarray(sd[f"{prefix}.{hf}.weight"], jnp.float32),
            "bias": jnp.asarray(sd[f"{prefix}.{hf}.bias"], jnp.float32),
        }

    return {
        "ln1": ln("layer_norm1"),
        "attn": {
            "q": lin("q", "self_attn.q_proj"),
            "k": lin("k", "self_attn.k_proj"),
            "v": lin("v", "self_attn.v_proj"),
            "out": lin("out", "self_attn.out_proj"),
        },
        "ln2": ln("layer_norm2"),
        "fc1": lin("fc1", "mlp.fc1"),
        "fc2": lin("fc2", "mlp.fc2"),
    }


def load_clip(model_dir: str | Path) -> tuple[CLIPConfig, Params]:
    """Load a HF CLIPModel checkpoint directory into our tree."""
    model_dir = Path(model_dir)
    raw = {}
    if (model_dir / "config.json").exists():
        raw = json.loads((model_dir / "config.json").read_text())
    vc = raw.get("vision_config", {})
    tc = raw.get("text_config", {})
    cfg = CLIPConfig(
        image_size=vc.get("image_size", 224),
        patch_size=vc.get("patch_size", 32),
        vision_width=vc.get("hidden_size", 768),
        vision_layers=vc.get("num_hidden_layers", 12),
        vision_heads=vc.get("num_attention_heads", 12),
        vocab_size=tc.get("vocab_size", 49408),
        context_length=tc.get("max_position_embeddings", 77),
        text_width=tc.get("hidden_size", 512),
        text_layers=tc.get("num_hidden_layers", 12),
        text_heads=tc.get("num_attention_heads", 8),
        projection_dim=raw.get("projection_dim", 512),
    )

    from dove_tpu.eval.vgg import _read_state_dict

    files = sorted(model_dir.glob("*.safetensors")) or sorted(
        model_dir.glob("*.bin")
    )
    if not files:
        raise FileNotFoundError(f"no weight files in {model_dir}")
    sd: dict[str, np.ndarray] = {}
    for f in files:
        sd.update(_read_state_dict(f))

    vis = "vision_model"
    txt = "text_model"

    def ln(name):
        return {
            "scale": jnp.asarray(sd[f"{name}.weight"], jnp.float32),
            "bias": jnp.asarray(sd[f"{name}.bias"], jnp.float32),
        }

    params: Params = {
        "vision": {
            # HF conv kernel [width, 3, p, p] -> HWIO
            "patch_embed": {
                "kernel": jnp.asarray(
                    np.transpose(
                        sd[f"{vis}.embeddings.patch_embedding.weight"],
                        (2, 3, 1, 0),
                    ),
                    jnp.float32,
                )
            },
            "class_embed": jnp.asarray(
                sd[f"{vis}.embeddings.class_embedding"], jnp.float32
            ),
            "pos_embed": jnp.asarray(
                sd[f"{vis}.embeddings.position_embedding.weight"], jnp.float32
            ),
            "pre_ln": ln(f"{vis}.pre_layrnorm")
            if f"{vis}.pre_layrnorm.weight" in sd
            else ln(f"{vis}.pre_layernorm"),
            "blocks": [
                _conv_block(sd, f"{vis}.encoder.layers.{i}")
                for i in range(cfg.vision_layers)
            ],
            "post_ln": ln(f"{vis}.post_layernorm"),
        },
        "text": {
            "token_embed": jnp.asarray(
                sd[f"{txt}.embeddings.token_embedding.weight"], jnp.float32
            ),
            "pos_embed": jnp.asarray(
                sd[f"{txt}.embeddings.position_embedding.weight"], jnp.float32
            ),
            "blocks": [
                _conv_block(sd, f"{txt}.encoder.layers.{i}")
                for i in range(cfg.text_layers)
            ],
            "final_ln": ln(f"{txt}.final_layer_norm"),
        },
        "visual_projection": jnp.asarray(sd["visual_projection.weight"].T, jnp.float32),
        "text_projection": jnp.asarray(sd["text_projection.weight"].T, jnp.float32),
        "logit_scale": jnp.asarray(sd.get("logit_scale", np.log(100.0)), jnp.float32),
    }
    return cfg, params


def init_clip_params(key: jax.Array, cfg: CLIPConfig) -> Params:
    """Random parameter tree with the loader's exact structure (tests)."""
    ks = iter(jax.random.split(key, 64))

    def lin(d_in, d_out):
        return {
            "kernel": jax.random.normal(next(ks), (d_in, d_out), jnp.float32)
            * d_in**-0.5,
            "bias": jnp.zeros((d_out,), jnp.float32),
        }

    def ln(d):
        return {"scale": jnp.ones((d,), jnp.float32),
                "bias": jnp.zeros((d,), jnp.float32)}

    def block(width):
        return {
            "ln1": ln(width),
            "attn": {"q": lin(width, width), "k": lin(width, width),
                     "v": lin(width, width), "out": lin(width, width)},
            "ln2": ln(width),
            "fc1": lin(width, width * 4),
            "fc2": lin(width * 4, width),
        }

    n_patches = (cfg.image_size // cfg.patch_size) ** 2
    return {
        "vision": {
            "patch_embed": {
                "kernel": jax.random.normal(
                    next(ks),
                    (cfg.patch_size, cfg.patch_size, 3, cfg.vision_width),
                    jnp.float32,
                ) * 0.02
            },
            "class_embed": jax.random.normal(
                next(ks), (cfg.vision_width,), jnp.float32) * 0.02,
            "pos_embed": jax.random.normal(
                next(ks), (n_patches + 1, cfg.vision_width), jnp.float32) * 0.02,
            "pre_ln": ln(cfg.vision_width),
            "blocks": [block(cfg.vision_width) for _ in range(cfg.vision_layers)],
            "post_ln": ln(cfg.vision_width),
        },
        "text": {
            "token_embed": jax.random.normal(
                next(ks), (cfg.vocab_size, cfg.text_width), jnp.float32) * 0.02,
            "pos_embed": jax.random.normal(
                next(ks), (cfg.context_length, cfg.text_width), jnp.float32) * 0.02,
            "blocks": [block(cfg.text_width) for _ in range(cfg.text_layers)],
            "final_ln": ln(cfg.text_width),
        },
        "visual_projection": jax.random.normal(
            next(ks), (cfg.vision_width, cfg.projection_dim), jnp.float32)
        * cfg.vision_width**-0.5,
        "text_projection": jax.random.normal(
            next(ks), (cfg.text_width, cfg.projection_dim), jnp.float32)
        * cfg.text_width**-0.5,
        "logit_scale": jnp.asarray(np.log(100.0), jnp.float32),
    }


# ---------------------------------------------------------------------------
# Modified ResNet-50 vision tower (OpenAI CLIP "RN50")
#
# Anti-aliased design: every stride-2 lives in an AvgPool (stem tail, the
# bottleneck's post-conv2 pool, and the downsample branch), convs are
# stride-1. BatchNorms are inference-folded at load time into per-channel
# scale/bias. The attention pool queries with the mean token; CLIP-IQA
# drops its positional embedding so any input resolution works
# (pyiqa clipiqa convention — BASELINE.md CLIP-IQA columns).
# ---------------------------------------------------------------------------

RN50_LAYERS = (3, 4, 6, 3)


def _bn(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Inference BatchNorm folded to scale/bias (see _fold_bn)."""
    return x * p["scale"] + p["bias"]


def _conv2d_nhwc(kernel: jnp.ndarray, x: jnp.ndarray, stride=1, pad=0):
    return jax.lax.conv_general_dilated(
        x, kernel, (stride, stride),
        ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _avgpool(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """AvgPool2d(k) with torch's VALID/floor semantics — any input size."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    )
    return s / (k * k)


def _bottleneck(p: Params, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    h = jax.nn.relu(_bn(p["bn1"], _conv2d_nhwc(p["conv1"], x)))
    h = jax.nn.relu(_bn(p["bn2"], _conv2d_nhwc(p["conv2"], h, pad=1)))
    if stride > 1:
        h = _avgpool(h, stride)
    h = _bn(p["bn3"], _conv2d_nhwc(p["conv3"], h))
    if "downsample" in p:
        x = _avgpool(x, stride) if stride > 1 else x
        x = _bn(p["downsample"]["bn"], _conv2d_nhwc(p["downsample"]["conv"], x))
    return jax.nn.relu(x + h)


def encode_image_rn50(p: Params, images: jnp.ndarray) -> jnp.ndarray:
    """images: [B, H, W, 3] CLIP-normalized, any resolution (strided convs
    and floor-semantics pools match torch) -> unit-norm [B, proj_dim]."""
    v = p["vision"]
    x = jax.nn.relu(_bn(v["bn1"], _conv2d_nhwc(v["conv1"], images, 2, 1)))
    x = jax.nn.relu(_bn(v["bn2"], _conv2d_nhwc(v["conv2"], x, pad=1)))
    x = jax.nn.relu(_bn(v["bn3"], _conv2d_nhwc(v["conv3"], x, pad=1)))
    x = _avgpool(x, 2)
    for li, blocks in enumerate(v["layers"]):
        for bi, blk in enumerate(blocks):
            x = _bottleneck(blk, x, stride=2 if (li > 0 and bi == 0) else 1)

    # attention pool, positional embedding dropped (CLIP-IQA)
    ap = v["attnpool"]
    B, H, W, C = x.shape
    heads = ap["num_heads"]
    hd = C // heads
    tokens = x.reshape(B, H * W, C)
    tokens = jnp.concatenate([tokens.mean(1, keepdims=True), tokens], axis=1)
    q = _linear(ap["q"], tokens[:, :1]).reshape(B, 1, heads, hd)
    k = _linear(ap["k"], tokens).reshape(B, -1, heads, hd)
    vv = _linear(ap["v"], tokens).reshape(B, -1, heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q * (hd ** -0.5), k)
    probs = jax.nn.softmax(logits, axis=-1)
    pooled = jnp.einsum("bhqk,bkhd->bqhd", probs, vv).reshape(B, C)
    out = _linear(ap["c"], pooled)
    return out / jnp.linalg.norm(
        out.astype(jnp.float32), axis=-1, keepdims=True
    ).astype(out.dtype)


def _fold_bn(sd: dict, prefix: str, eps: float = 1e-5) -> Params:
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    b = np.asarray(sd[f"{prefix}.bias"], np.float32)
    mean = np.asarray(sd[f"{prefix}.running_mean"], np.float32)
    var = np.asarray(sd[f"{prefix}.running_var"], np.float32)
    scale = w / np.sqrt(var + eps)
    return {"scale": jnp.asarray(scale), "bias": jnp.asarray(b - mean * scale)}


def load_clip_rn50(path: str | Path) -> tuple[CLIPConfig, Params]:
    """OpenAI CLIP RN50 state dict (.pt; clip.load('RN50').state_dict())
    -> (text cfg, params) with the RN50 vision tower and the shared-format
    text tower (the text side reuses encode_text unchanged)."""
    import torch

    sd = torch.load(str(path), map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: np.asarray(v.float() if hasattr(v, "float") else v) for k, v in sd.items()}

    def conv(key):  # torch OIHW -> HWIO
        return jnp.asarray(np.transpose(sd[key], (2, 3, 1, 0)), jnp.float32)

    def lin(prefix):
        return {
            "kernel": jnp.asarray(sd[f"{prefix}.weight"].T, jnp.float32),
            "bias": jnp.asarray(sd[f"{prefix}.bias"], jnp.float32),
        }

    layers = []
    for li, n_blocks in enumerate(RN50_LAYERS):
        blocks = []
        for bi in range(n_blocks):
            pre = f"visual.layer{li + 1}.{bi}"
            blk: Params = {
                "conv1": conv(f"{pre}.conv1.weight"),
                "bn1": _fold_bn(sd, f"{pre}.bn1"),
                "conv2": conv(f"{pre}.conv2.weight"),
                "bn2": _fold_bn(sd, f"{pre}.bn2"),
                "conv3": conv(f"{pre}.conv3.weight"),
                "bn3": _fold_bn(sd, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                blk["downsample"] = {
                    "conv": conv(f"{pre}.downsample.0.weight"),
                    "bn": _fold_bn(sd, f"{pre}.downsample.1"),
                }
            blocks.append(blk)
        layers.append(blocks)

    embed_dim = sd["visual.attnpool.c_proj.weight"].shape[0]
    attn_dim = sd["visual.attnpool.c_proj.weight"].shape[1]
    text_width = sd["ln_final.weight"].shape[0]
    n_text_layers = len(
        {k.split(".")[2] for k in sd if k.startswith("transformer.resblocks.")}
    )
    cfg = CLIPConfig(
        vocab_size=sd["token_embedding.weight"].shape[0],
        context_length=sd["positional_embedding"].shape[0],
        text_width=text_width,
        text_layers=n_text_layers,
        text_heads=text_width // 64,
        projection_dim=embed_dim,
    )

    def text_block(i):
        pre = f"transformer.resblocks.{i}"
        w = sd[f"{pre}.attn.in_proj_weight"]
        b = sd[f"{pre}.attn.in_proj_bias"]
        qw, kw, vw = np.split(w, 3, axis=0)
        qb, kb, vb = np.split(b, 3, axis=0)

        def ln(name):
            return {"scale": jnp.asarray(sd[f"{pre}.{name}.weight"], jnp.float32),
                    "bias": jnp.asarray(sd[f"{pre}.{name}.bias"], jnp.float32)}

        mk = lambda wt, bt: {"kernel": jnp.asarray(wt.T, jnp.float32),
                             "bias": jnp.asarray(bt, jnp.float32)}
        return {
            "ln1": ln("ln_1"),
            "attn": {"q": mk(qw, qb), "k": mk(kw, kb), "v": mk(vw, vb),
                     "out": lin(f"{pre}.attn.out_proj")},
            "ln2": ln("ln_2"),
            "fc1": lin(f"{pre}.mlp.c_fc"),
            "fc2": lin(f"{pre}.mlp.c_proj"),
        }

    params: Params = {
        "vision": {
            "conv1": conv("visual.conv1.weight"),
            "bn1": _fold_bn(sd, "visual.bn1"),
            "conv2": conv("visual.conv2.weight"),
            "bn2": _fold_bn(sd, "visual.bn2"),
            "conv3": conv("visual.conv3.weight"),
            "bn3": _fold_bn(sd, "visual.bn3"),
            "layers": layers,
            "attnpool": {
                "num_heads": attn_dim // 64,  # RN50: 2048/64 = 32
                "q": lin("visual.attnpool.q_proj"),
                "k": lin("visual.attnpool.k_proj"),
                "v": lin("visual.attnpool.v_proj"),
                "c": lin("visual.attnpool.c_proj"),
            },
        },
        "text": {
            "token_embed": jnp.asarray(sd["token_embedding.weight"], jnp.float32),
            "pos_embed": jnp.asarray(sd["positional_embedding"], jnp.float32),
            "blocks": [text_block(i) for i in range(n_text_layers)],
            "final_ln": {
                "scale": jnp.asarray(sd["ln_final.weight"], jnp.float32),
                "bias": jnp.asarray(sd["ln_final.bias"], jnp.float32),
            },
        },
        # OpenAI stores text_projection already in x @ W orientation
        "text_projection": jnp.asarray(sd["text_projection"], jnp.float32),
        "logit_scale": jnp.asarray(sd["logit_scale"], jnp.float32),
    }
    return cfg, params


def init_clip_rn50_params(key: jax.Array, width: int = 16) -> Params:
    """Random RN50-shaped vision tower at a reduced width (tests). Text
    side reuses init_clip_params."""
    ks = iter(jax.random.split(key, 256))

    def conv(kh, kw, cin, cout):
        return jax.random.normal(next(ks), (kh, kw, cin, cout), jnp.float32) * (
            (kh * kw * cin) ** -0.5
        )

    def bn(c):
        return {"scale": jnp.ones((c,), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32)}

    def lin(din, dout):
        return {"kernel": jax.random.normal(next(ks), (din, dout), jnp.float32)
                * din**-0.5,
                "bias": jnp.zeros((dout,), jnp.float32)}

    layers = []
    inplanes = width
    for li, n_blocks in enumerate(RN50_LAYERS):
        planes = width * (2 ** li)
        blocks = []
        for bi in range(n_blocks):
            cin = inplanes if bi == 0 else planes * 4
            blk = {
                "conv1": conv(1, 1, cin, planes),
                "bn1": bn(planes),
                "conv2": conv(3, 3, planes, planes),
                "bn2": bn(planes),
                "conv3": conv(1, 1, planes, planes * 4),
                "bn3": bn(planes * 4),
            }
            if bi == 0:
                blk["downsample"] = {
                    "conv": conv(1, 1, cin, planes * 4),
                    "bn": bn(planes * 4),
                }
            blocks.append(blk)
        inplanes = planes * 4
        layers.append(blocks)
    C = inplanes
    return {
        "vision": {
            "conv1": conv(3, 3, 3, width // 2),
            "bn1": bn(width // 2),
            "conv2": conv(3, 3, width // 2, width // 2),
            "bn2": bn(width // 2),
            "conv3": conv(3, 3, width // 2, width),
            "bn3": bn(width),
            "layers": layers,
            "attnpool": {
                "num_heads": 4,
                "q": lin(C, C), "k": lin(C, C), "v": lin(C, C),
                "c": lin(C, C // 2),
            },
        },
    }


# ---------------------------------------------------------------------------
# CLIP-IQA
# ---------------------------------------------------------------------------

def _preprocess(frames: np.ndarray, size: int) -> np.ndarray:
    """[F, H, W, 3] in [0,1] -> CLIP-normalized [F, size, size, 3]."""
    import cv2

    out = np.empty((frames.shape[0], size, size, 3), np.float32)
    for i, f in enumerate(frames):
        out[i] = cv2.resize(
            f.astype(np.float32), (size, size), interpolation=cv2.INTER_CUBIC
        )
    return (np.clip(out, 0, 1) - _MEAN) / _STD


def clipiqa_metric(model_dir: str | Path | None = None):
    """Build the CLIP-IQA callable: [F, H, W, 3] in [0,1] -> mean score.

    model_dir defaults to $DOVE_CLIP_WEIGHTS. A directory loads the HF
    CLIPModel (ViT) backbone; a .pt file loads the OpenAI-layout RN50
    backbone (pyiqa's clipiqa default: native resolution, attnpool
    positional embedding dropped). Raises a clear error when no local CLIP
    checkpoint is available (no network access here)."""
    model_dir = model_dir or os.environ.get("DOVE_CLIP_WEIGHTS")
    if not model_dir or not Path(model_dir).exists():
        raise NotImplementedError(
            "clipiqa needs a local CLIP checkpoint: set DOVE_CLIP_WEIGHTS to "
            "a HF clip-vit-base-patch32 snapshot directory (config.json + "
            "model weights + tokenizer files) or an OpenAI CLIP RN50 state "
            "dict .pt (pyiqa-default backbone; tokenizer files alongside or "
            "in DOVE_CLIP_TOKENIZER)"
        )
    rn50 = Path(model_dir).is_file()
    if rn50:
        cfg, params = load_clip_rn50(model_dir)
        tok_dir = os.environ.get(
            "DOVE_CLIP_TOKENIZER", str(Path(model_dir).parent)
        )
    else:
        cfg, params = load_clip(model_dir)
        tok_dir = str(model_dir)

    from transformers import CLIPTokenizer

    tok = CLIPTokenizer.from_pretrained(tok_dir)
    enc = tok(
        [GOOD_PROMPT, BAD_PROMPT],
        padding="max_length",
        max_length=cfg.context_length,
        return_tensors="np",
    )
    text_feats = encode_text(cfg, params, jnp.asarray(enc["input_ids"], jnp.int32))

    @jax.jit
    def score(images: jnp.ndarray) -> jnp.ndarray:
        if rn50:
            img_feats = encode_image_rn50(params, images)  # native res
        else:
            img_feats = encode_image(cfg, params, images)  # [F, D]
        scale = jnp.exp(params["logit_scale"])
        logits = scale * img_feats @ text_feats.T  # [F, 2]
        return jax.nn.softmax(logits, axis=-1)[:, 0]

    def metric(frames: np.ndarray, _gt=None) -> float:
        if rn50:
            x = (np.clip(np.asarray(frames, np.float32), 0, 1) - _MEAN) / _STD
            x = jnp.asarray(x)
        else:
            x = jnp.asarray(_preprocess(np.asarray(frames), cfg.image_size))
        return float(jnp.mean(score(x)))

    return metric
