"""MANIQA native implementation tests.

No released checkpoint ships in this environment, so these tests build a
RANDOM state dict in the official IIGROUP/MANIQA key layout, convert it,
and validate the forward end to end — plus a torch oracle for the
trickiest translation hazard (TABlock's transpose-reshape quirk) and the
swin window machinery.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from dove_tpu.eval.maniqa import (
    MANIQAConfig,
    _shift_mask,
    _tablock,
    _window_partition,
    _window_reverse,
    convert_state_dict,
    maniqa_forward,
)

CFG = MANIQAConfig(
    img_size=32, patch_size=8, vit_width=16, vit_layers=4, vit_heads=2,
    vit_mlp=32, feature_blocks=(0, 1, 2, 3), embed_dim=16, num_tab=2,
    depths=(2, 2), num_heads=(2, 2), window_size=2, dim_mlp=32,
)


def _official_layout_sd(cfg: MANIQAConfig, rng) -> dict:
    """Random torch-style state dict with the official module's keys."""
    sd = {}

    def lin(prefix, din, dout):
        sd[f"{prefix}.weight"] = rng.normal(0, 0.05, (dout, din))
        sd[f"{prefix}.bias"] = rng.normal(0, 0.01, (dout,))

    def lnp(prefix, d):
        sd[f"{prefix}.weight"] = np.ones(d)
        sd[f"{prefix}.bias"] = np.zeros(d)

    w = cfg.vit_width
    n_tok = cfg.tokens
    sd["vit.cls_token"] = rng.normal(0, 0.02, (1, 1, w))
    sd["vit.pos_embed"] = rng.normal(0, 0.02, (1, n_tok + 1, w))
    sd["vit.patch_embed.proj.weight"] = rng.normal(
        0, 0.05, (w, 3, cfg.patch_size, cfg.patch_size)
    )
    sd["vit.patch_embed.proj.bias"] = np.zeros(w)
    for i in range(cfg.vit_layers):
        lnp(f"vit.blocks.{i}.norm1", w)
        lin(f"vit.blocks.{i}.attn.qkv", w, 3 * w)
        lin(f"vit.blocks.{i}.attn.proj", w, w)
        lnp(f"vit.blocks.{i}.norm2", w)
        lin(f"vit.blocks.{i}.mlp.fc1", w, cfg.vit_mlp)
        lin(f"vit.blocks.{i}.mlp.fc2", cfg.vit_mlp, w)
    for t in ("tablock1", "tablock2"):
        for i in range(cfg.num_tab):
            for c in ("c_q", "c_k", "c_v"):
                lin(f"{t}.{i}.{c}", n_tok, n_tok)
    nfeat = w * len(cfg.feature_blocks)
    sd["conv1.weight"] = rng.normal(0, 0.05, (cfg.embed_dim, nfeat, 1, 1))
    sd["conv1.bias"] = np.zeros(cfg.embed_dim)
    sd["conv2.weight"] = rng.normal(
        0, 0.05, (cfg.embed_dim // 2, cfg.embed_dim, 1, 1)
    )
    sd["conv2.bias"] = np.zeros(cfg.embed_dim // 2)
    for s, dim in (("swintransformer1", cfg.embed_dim),
                   ("swintransformer2", cfg.embed_dim // 2)):
        for li, depth in enumerate(cfg.depths):
            for bi in range(depth):
                b = f"{s}.layers.{li}.blocks.{bi}"
                lnp(f"{b}.norm1", dim)
                lin(f"{b}.attn.qkv", dim, 3 * dim)
                lin(f"{b}.attn.proj", dim, dim)
                sd[f"{b}.attn.relative_position_bias_table"] = rng.normal(
                    0, 0.02,
                    ((2 * cfg.window_size - 1) ** 2, cfg.num_heads[li]),
                )
                sd[f"{b}.attn.relative_position_index"] = np.zeros(
                    (cfg.window_size ** 2, cfg.window_size ** 2)
                )
                lnp(f"{b}.norm2", dim)
                lin(f"{b}.mlp.fc1", dim, cfg.dim_mlp)
                lin(f"{b}.mlp.fc2", cfg.dim_mlp, dim)
    d2 = cfg.embed_dim // 2
    lin("fc_score.0", d2, d2)
    lin("fc_score.3", d2, 1)
    lin("fc_weight.0", d2, d2)
    lin("fc_weight.3", d2, 1)
    return sd


def test_convert_and_forward():
    rng = np.random.default_rng(0)
    params = convert_state_dict(_official_layout_sd(CFG, rng), CFG)
    imgs = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    scores = maniqa_forward(CFG, params, imgs)
    assert scores.shape == (2,)
    s = np.asarray(scores)
    assert np.isfinite(s).all() and (s >= 0).all()
    # different images -> different scores (nothing collapsed)
    assert abs(s[0] - s[1]) > 1e-8


def test_convert_rejects_unknown_keys():
    rng = np.random.default_rng(1)
    sd = _official_layout_sd(CFG, rng)
    sd["swintransformer1.mystery.weight"] = np.zeros(3)
    with pytest.raises(ValueError, match="mystery"):
        convert_state_dict(sd, CFG)


def test_tablock_matches_torch_oracle():
    """The official TABlock ends with (attn @ v).transpose(1, 2).reshape(B,
    C, N) — a memory REINTERPRETATION, not a transpose-undo. Pin our JAX
    replication against a literal torch implementation."""
    rng = np.random.default_rng(2)
    B, C, N = 2, 6, 4
    wq, wk, wv = (rng.normal(0, 0.5, (N, N)) for _ in range(3))
    bq, bk, bv = (rng.normal(0, 0.1, (N,)) for _ in range(3))
    x = rng.normal(0, 1, (B, C, N))

    xt = torch.tensor(x)
    q = xt @ torch.tensor(wq).T + torch.tensor(bq)
    k = xt @ torch.tensor(wk).T + torch.tensor(bk)
    v = xt @ torch.tensor(wv).T + torch.tensor(bv)
    attn = torch.softmax(q @ k.transpose(-2, -1) * (N ** -0.5), dim=-1)
    ref = ((attn @ v).transpose(1, 2).reshape(B, C, N) + xt).numpy()

    p = {
        "c_q": {"weight": jnp.asarray(wq.T), "bias": jnp.asarray(bq)},
        "c_k": {"weight": jnp.asarray(wk.T), "bias": jnp.asarray(bk)},
        "c_v": {"weight": jnp.asarray(wv.T), "bias": jnp.asarray(bv)},
    }
    out = np.asarray(_tablock(p, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_window_partition_roundtrip_and_mask():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 5)))
    wins = _window_partition(x, 4)
    assert wins.shape == (2 * 4, 16, 5)
    back = _window_reverse(wins, 4, 2, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    mask = _shift_mask(8, 8, 4, 2)
    assert mask.shape == (4, 16, 16)
    # the top-left (unshifted) window attends freely
    assert (mask[0] == 0).all()
    # shifted windows must block cross-region pairs
    assert (mask[-1] == -100).any()


def test_gating_error_without_weights(monkeypatch):
    monkeypatch.delenv("DOVE_MANIQA_WEIGHTS", raising=False)
    from dove_tpu.eval.metrics import get_metric

    with pytest.raises(NotImplementedError, match="DOVE_MANIQA_WEIGHTS"):
        get_metric("maniqa")


def test_load_and_score_clip(tmp_path):
    """Save a random official-layout checkpoint (with a module. prefix and
    a state_dict wrapper, like real training dumps), load through the real
    torch.load path, and score a tiny clip with random crops."""
    rng = np.random.default_rng(4)
    sd = {
        "module." + k: torch.tensor(v)
        for k, v in _official_layout_sd(CFG, rng).items()
    }
    torch.save({"state_dict": sd}, tmp_path / "maniqa.pt")

    from dove_tpu.eval.maniqa import load_maniqa, maniqa_forward

    cfg, params = load_maniqa(str(tmp_path / "maniqa.pt"), CFG)
    clip = rng.random((2, 40, 48, 3)).astype(np.float32)
    crops = np.stack([clip[0, :32, :32], clip[1, 8:, 16:]])
    scores = np.asarray(maniqa_forward(cfg, params, jnp.asarray(crops)))
    assert scores.shape == (2,) and np.isfinite(scores).all()
