"""T5 v1.1 encoder (JAX) — the text branch of CogVideoX/DOVE.

The reference uses HF ``T5EncoderModel`` (T5-XXL, hidden 4096) to embed
prompts (reference: finetune/models/dove/lora_one_s1_trainer.py:35-39,73-86);
at inference the shipped empty-prompt embedding file makes it optional
(SURVEY.md §2.2). This module provides the encoder natively so prompt caches
can be built on TPU: RMSNorm, relative-position-bucket attention bias shared
from block 0, gated-GELU feed-forward — the t5-v1_1 architecture the released
checkpoints use.

Weight layout mirrors the HF checkpoint names (see ``convert_t5``); matmuls
run in the model dtype, norms/softmax in fp32.
"""

from __future__ import annotations

import dataclasses
import math
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6


def t5_xxl() -> T5Config:
    return T5Config()


def t5_tiny() -> T5Config:
    """CPU-testable miniature with every architectural feature."""
    return T5Config(
        vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2, num_heads=4
    )


# ---------------------------------------------------------------------------
# Pieces
# ---------------------------------------------------------------------------

def _rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight.astype(x.dtype)


def _relative_position_bucket(
    relative_position: np.ndarray, num_buckets: int, max_distance: int
) -> np.ndarray:
    """Bidirectional T5 bucketing (host-side, static per sequence length)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int64) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        np.log(n.clip(1) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_large = np.minimum(val_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_large)


def position_bias(
    cfg: T5Config, rel_emb: jnp.ndarray, seq_len: int
) -> jnp.ndarray:
    """[1, heads, S, S] additive attention bias from block-0's table."""
    ctx = np.arange(seq_len)[:, None]
    mem = np.arange(seq_len)[None, :]
    buckets = _relative_position_bucket(
        mem - ctx,
        cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance,
    )  # [S, S]
    bias = rel_emb[jnp.asarray(buckets)]  # [S, S, heads]
    return jnp.transpose(bias, (2, 0, 1))[None].astype(jnp.float32)


def _attention(cfg: T5Config, p: Params, x: jnp.ndarray, bias, mask) -> jnp.ndarray:
    B, S, _ = x.shape
    H, D = cfg.num_heads, cfg.d_kv

    def proj(name):
        return (x @ p[name]["kernel"].astype(x.dtype)).reshape(B, S, H, D).transpose(0, 2, 1, 3)

    q, k, v = proj("q"), proj("k"), proj("v")
    # T5 does NOT scale by sqrt(d): scaling is folded into the trained weights
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits + bias
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], logits, -1e9)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, S, H * D)
    return out @ p["o"]["kernel"].astype(x.dtype)


def _ffn(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    gate = jax.nn.gelu(x @ p["wi_0"]["kernel"].astype(x.dtype), approximate=True)
    lin = x @ p["wi_1"]["kernel"].astype(x.dtype)
    return (gate * lin) @ p["wo"]["kernel"].astype(x.dtype)


def t5_encode(
    params: Params,
    cfg: T5Config,
    input_ids: jnp.ndarray,  # [B, S] int32
    attention_mask: jnp.ndarray | None = None,  # [B, S] bool/int
) -> jnp.ndarray:
    """Token ids -> encoder features [B, S, d_model]."""
    x = params["embed"]["weight"][input_ids]
    bias = position_bias(cfg, params["rel_emb"]["weight"], input_ids.shape[1])
    mask = attention_mask.astype(bool) if attention_mask is not None else None
    eps = cfg.layer_norm_epsilon

    for blk in params["blocks"]:
        h = _rms_norm(x, blk["ln0"]["weight"], eps)
        x = x + _attention(cfg, blk["attn"], h, bias, mask)
        h = _rms_norm(x, blk["ln1"]["weight"], eps)
        x = x + _ffn(blk["ffn"], h)

    x = _rms_norm(x, params["final_ln"]["weight"], eps)
    if mask is not None:
        x = x * mask[..., None].astype(x.dtype)
    return x


# ---------------------------------------------------------------------------
# Weight conversion (HF transformers layout -> our tree)
# ---------------------------------------------------------------------------

def convert_t5(tensors: dict[str, np.ndarray], cfg: T5Config, dtype=jnp.bfloat16) -> Params:
    """HF T5EncoderModel state dict -> dove_tpu tree. Linear weights are
    torch [out, in] -> JAX [in, out]."""

    def lin(prefix):
        return {"kernel": jnp.asarray(tensors[f"{prefix}.weight"].T, dtype)}

    def key(name: str) -> str:
        return name if name in tensors else f"encoder.{name}"

    def get(name: str) -> np.ndarray:
        return tensors[key(name)]

    blocks = []
    for i in range(cfg.num_layers):
        b = f"encoder.block.{i}" if f"encoder.block.{i}.layer.0.SelfAttention.q.weight" in tensors else f"block.{i}"
        blocks.append({
            "ln0": {"weight": jnp.asarray(
                tensors[f"{b}.layer.0.layer_norm.weight"], jnp.float32
            )},
            "attn": {
                "q": lin(f"{b}.layer.0.SelfAttention.q"),
                "k": lin(f"{b}.layer.0.SelfAttention.k"),
                "v": lin(f"{b}.layer.0.SelfAttention.v"),
                "o": lin(f"{b}.layer.0.SelfAttention.o"),
            },
            "ln1": {"weight": jnp.asarray(
                tensors[f"{b}.layer.1.layer_norm.weight"], jnp.float32
            )},
            "ffn": {
                "wi_0": lin(f"{b}.layer.1.DenseReluDense.wi_0"),
                "wi_1": lin(f"{b}.layer.1.DenseReluDense.wi_1"),
                "wo": lin(f"{b}.layer.1.DenseReluDense.wo"),
            },
        })

    shared_key = "shared.weight" if "shared.weight" in tensors else "encoder.embed_tokens.weight"
    rel_key = key("block.0.layer.0.SelfAttention.relative_attention_bias.weight")
    final_key = key("final_layer_norm.weight")
    return {
        "embed": {"weight": jnp.asarray(tensors[shared_key], dtype)},
        "rel_emb": {"weight": jnp.asarray(tensors[rel_key], jnp.float32)},
        "blocks": blocks,
        "final_ln": {"weight": jnp.asarray(tensors[final_key], jnp.float32)},
    }


def load_t5(model_dir: str | Path, cfg: T5Config | None = None, dtype=jnp.bfloat16):
    """Load from a diffusers checkpoint's text_encoder subfolder."""
    import json

    from dove_tpu.weights import load_safetensors_dir

    model_dir = Path(model_dir)
    sub = model_dir / "text_encoder" if (model_dir / "text_encoder").exists() else model_dir
    if cfg is None and (sub / "config.json").exists():
        raw = json.loads((sub / "config.json").read_text())
        cfg = T5Config(
            vocab_size=raw.get("vocab_size", 32128),
            d_model=raw.get("d_model", 4096),
            d_kv=raw.get("d_kv", 64),
            d_ff=raw.get("d_ff", 10240),
            num_layers=raw.get("num_layers", 24),
            num_heads=raw.get("num_heads", 64),
            relative_attention_num_buckets=raw.get(
                "relative_attention_num_buckets", 32
            ),
            relative_attention_max_distance=raw.get(
                "relative_attention_max_distance", 128
            ),
            layer_norm_epsilon=raw.get("layer_norm_epsilon", 1e-6),
        )
    cfg = cfg or t5_xxl()
    return convert_t5(load_safetensors_dir(sub), cfg, dtype), cfg


def init_t5_params(key: jax.Array, cfg: T5Config, dtype=jnp.float32) -> Params:
    ks = iter(jax.random.split(key, 8 + cfg.num_layers * 8))

    def lin(d_in, d_out):
        return {"kernel": jax.random.normal(next(ks), (d_in, d_out), dtype) * d_in**-0.5}

    inner = cfg.num_heads * cfg.d_kv
    blocks = [
        {
            "ln0": {"weight": jnp.ones((cfg.d_model,), jnp.float32)},
            "attn": {
                "q": lin(cfg.d_model, inner),
                "k": lin(cfg.d_model, inner),
                "v": lin(cfg.d_model, inner),
                "o": lin(inner, cfg.d_model),
            },
            "ln1": {"weight": jnp.ones((cfg.d_model,), jnp.float32)},
            "ffn": {
                "wi_0": lin(cfg.d_model, cfg.d_ff),
                "wi_1": lin(cfg.d_model, cfg.d_ff),
                "wo": lin(cfg.d_ff, cfg.d_model),
            },
        }
        for _ in range(cfg.num_layers)
    ]
    return {
        "embed": {"weight": jax.random.normal(next(ks), (cfg.vocab_size, cfg.d_model), dtype)},
        "rel_emb": {
            "weight": jax.random.normal(
                next(ks), (cfg.relative_attention_num_buckets, cfg.num_heads),
                jnp.float32,
            )
        },
        "blocks": blocks,
        "final_ln": {"weight": jnp.ones((cfg.d_model,), jnp.float32)},
    }


# ---------------------------------------------------------------------------
# Prompt embedding (tokenize + encode + pad to max_text_seq_length)
# ---------------------------------------------------------------------------

class PromptEncoder:
    """Tokenizer + T5 encoder producing CogVideoX-style prompt embeddings
    (fixed length; matches the cached empty-prompt file).

    CogVideoX parity: the reference encodes prompts with input_ids ONLY — no
    attention mask is passed to the T5 encoder (lora_one_s1_trainer.py:83,
    inference_script.py:440), so pad positions get nonzero embeddings and pad
    tokens attend freely. The DiT later attends to the full fixed 226-token
    sequence unmasked, so those pad embeddings are load-bearing. Default here
    reproduces that; ``use_attention_mask=True`` is the opt-in masked variant.
    """

    def __init__(
        self,
        model_dir: str | Path,
        max_length: int = 226,
        dtype=jnp.bfloat16,
        use_attention_mask: bool = False,
    ):
        from transformers import AutoTokenizer

        model_dir = Path(model_dir)
        tok_dir = model_dir / "tokenizer" if (model_dir / "tokenizer").exists() else model_dir
        self.tokenizer = AutoTokenizer.from_pretrained(str(tok_dir))
        self.params, self.cfg = load_t5(model_dir, dtype=dtype)
        self.max_length = max_length
        self.use_attention_mask = use_attention_mask
        self._encode = jax.jit(
            lambda ids, mask: t5_encode(self.params, self.cfg, ids, mask)
        )

    def __call__(self, prompt: str) -> np.ndarray:
        enc = self.tokenizer(
            prompt,
            padding="max_length",
            max_length=self.max_length,
            truncation=True,
            add_special_tokens=True,
            return_tensors="np",
        )
        mask = None
        if self.use_attention_mask:
            mask = jnp.asarray(enc["attention_mask"], jnp.int32)
        out = self._encode(jnp.asarray(enc["input_ids"], jnp.int32), mask)
        return np.asarray(out[0], np.float32)
