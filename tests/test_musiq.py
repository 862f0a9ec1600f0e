"""MUSIQ native implementation tests.

No released checkpoint ships in this environment, so these tests build a
RANDOM state dict in the documented canonical layout, convert it, and
validate the multi-scale forward end to end — plus a torch oracle for the
transformer block and exact checks on the hash-based spatial embedding
(the paper's resolution-independence property).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dove_tpu.eval.musiq import (
    MUSIQConfig,
    _arp_resize,
    _block,
    _grid_patches,
    convert_state_dict,
    init_musiq_params,
    multiscale_tokens,
    musiq_forward,
)

CFG = MUSIQConfig(
    patch_size=8, hidden=16, num_layers=2, num_heads=2, mlp_dim=32,
    hse_grid=4, longer_sides=(16, 24),
)


def _random_sd(cfg: MUSIQConfig, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def lin(prefix, din, dout, bias=True):
        sd[f"{prefix}.weight"] = torch.randn(dout, din, generator=g) * 0.05
        if bias:
            sd[f"{prefix}.bias"] = torch.randn(dout, generator=g) * 0.05

    def ln(prefix):
        sd[f"{prefix}.weight"] = torch.ones(cfg.hidden)
        sd[f"{prefix}.bias"] = torch.zeros(cfg.hidden)

    lin("embedding", cfg.patch_dim, cfg.hidden)
    sd["cls_token"] = torch.randn(1, 1, cfg.hidden, generator=g) * 0.05
    sd["spatial_embedding"] = torch.randn(
        cfg.hse_grid**2, cfg.hidden, generator=g
    ) * 0.05
    sd["scale_embedding"] = torch.randn(
        cfg.num_scales, cfg.hidden, generator=g
    ) * 0.05
    for i in range(cfg.num_layers):
        ln(f"transformer.{i}.norm1")
        lin(f"transformer.{i}.attn.qkv", cfg.hidden, 3 * cfg.hidden)
        lin(f"transformer.{i}.attn.proj", cfg.hidden, cfg.hidden)
        ln(f"transformer.{i}.norm2")
        lin(f"transformer.{i}.mlp.fc1", cfg.hidden, cfg.mlp_dim)
        lin(f"transformer.{i}.mlp.fc2", cfg.mlp_dim, cfg.hidden)
    ln("norm")
    lin("head", cfg.hidden, cfg.num_class)
    return sd


def test_hash_spatial_embedding_properties():
    """The HSE index map is the paper's floor(i*G/n) rule: covers the grid
    monotonically and is identical for any resolution with the same grid."""
    cfg = MUSIQConfig(patch_size=8, hse_grid=4)
    _, idx = _grid_patches(cfg, np.zeros((32, 64, 3), np.float32))  # 4x8 grid
    gi, gj = idx // 4, idx % 4
    assert gi.min() == 0 and gi.max() == 3 and gj.min() == 0 and gj.max() == 3
    ii = np.repeat(np.arange(4), 8)
    jj = np.tile(np.arange(8), 4)
    np.testing.assert_array_equal(gi, (ii * 4) // 4)
    np.testing.assert_array_equal(gj, np.minimum((jj * 4) // 8, 3))
    # patches pad to FULL patches (zero fill), count = ceil(H/P)*ceil(W/P)
    p, idx2 = _grid_patches(cfg, np.ones((33, 65, 3), np.float32))
    assert p.shape == (5 * 9, 3 * 8 * 8)
    assert idx2.shape == (45,)


def test_arp_resize_preserves_aspect():
    img = np.zeros((30, 60, 3), np.float32)
    out = _arp_resize(img, 24)
    assert out.shape[:2] == (12, 24)
    out = _arp_resize(np.zeros((60, 30, 3), np.float32), 24)
    assert out.shape[:2] == (24, 12)


def test_multiscale_tokens_composition():
    """Native + each ARP scale contribute patches; scale indices are
    0 (native), then 1.. in longer_sides order."""
    frame = np.random.default_rng(0).random((40, 56, 3)).astype(np.float32)
    patches, hse, scale = multiscale_tokens(CFG, frame)
    assert patches.shape[1] == CFG.patch_dim
    assert patches.shape[0] == hse.shape[0] == scale.shape[0]
    # native 5x7=35; ARP 16 -> (12, 16) -> 2x2=4; ARP 24 -> (17, 24) -> 3x3=9
    counts = [int((scale == i).sum()) for i in range(CFG.num_scales)]
    assert counts == [35, 4, 9], counts
    assert hse.max() < CFG.hse_grid**2


def test_convert_and_forward_deterministic():
    sd = _random_sd(CFG)
    params = convert_state_dict({k: v.numpy() for k, v in sd.items()}, CFG)
    frame = np.random.default_rng(1).random((24, 40, 3)).astype(np.float32)
    pa, h, s = multiscale_tokens(CFG, frame)
    out1 = musiq_forward(CFG, params, jnp.asarray(pa), jnp.asarray(h), jnp.asarray(s))
    out2 = musiq_forward(CFG, params, jnp.asarray(pa), jnp.asarray(h), jnp.asarray(s))
    assert out1.shape == ()
    assert np.isfinite(float(out1))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_convert_rejects_unknown_keys():
    sd = {k: v.numpy() for k, v in _random_sd(CFG).items()}
    sd["mystery.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="unmatched"):
        convert_state_dict(sd, CFG)


def test_convert_accepts_split_qkv_and_prefix():
    """Split q/k/v checkpoints fuse to the same forward as the fused form."""
    sd = _random_sd(CFG)
    fused = convert_state_dict({k: v.numpy() for k, v in sd.items()}, CFG)
    split = {}
    for k, v in sd.items():
        if ".attn.qkv." in k:
            w = v
            for n, part in zip(("q", "k", "v"), torch.chunk(w, 3, dim=0)):
                split[k.replace(".qkv.", f".{n}.")] = part
        else:
            split[k] = v
    split = {f"module.{k}": v.numpy() for k, v in split.items()}
    params2 = convert_state_dict(split, CFG)
    frame = np.random.default_rng(2).random((24, 24, 3)).astype(np.float32)
    pa, h, s = multiscale_tokens(CFG, frame)
    o1 = musiq_forward(CFG, fused, jnp.asarray(pa), jnp.asarray(h), jnp.asarray(s))
    o2 = musiq_forward(CFG, params2, jnp.asarray(pa), jnp.asarray(h), jnp.asarray(s))
    np.testing.assert_allclose(float(o1), float(o2), rtol=1e-6)


def test_block_matches_torch_oracle():
    """Pre-LN transformer block == a torch reference built from the same
    state dict (pins qkv packing, head split, GELU flavor)."""
    cfg = CFG
    sd = _random_sd(cfg)
    params = convert_state_dict({k: v.numpy() for k, v in sd.items()}, cfg)
    x = torch.randn(9, cfg.hidden, generator=torch.Generator().manual_seed(3))

    def t_ln(prefix, h):
        return torch.nn.functional.layer_norm(
            h, (cfg.hidden,), sd[f"{prefix}.weight"], sd[f"{prefix}.bias"],
            eps=cfg.eps,
        )

    pre = "transformer.0"
    h = t_ln(f"{pre}.norm1", x)
    qkv = h @ sd[f"{pre}.attn.qkv.weight"].T + sd[f"{pre}.attn.qkv.bias"]
    S = x.shape[0]
    hd = cfg.hidden // cfg.num_heads
    q, k, v = (
        qkv.reshape(S, 3, cfg.num_heads, hd)[:, i].transpose(0, 1)
        for i in range(3)
    )
    att = torch.softmax((q * hd**-0.5) @ k.transpose(1, 2), dim=-1) @ v
    att = att.transpose(0, 1).reshape(S, cfg.hidden)
    y = x + att @ sd[f"{pre}.attn.proj.weight"].T + sd[f"{pre}.attn.proj.bias"]
    h = t_ln(f"{pre}.norm2", y)
    h = torch.nn.functional.gelu(
        h @ sd[f"{pre}.mlp.fc1.weight"].T + sd[f"{pre}.mlp.fc1.bias"]
    )
    ref = y + h @ sd[f"{pre}.mlp.fc2.weight"].T + sd[f"{pre}.mlp.fc2.bias"]

    ours = _block(params["blocks"][0], jnp.asarray(x.numpy()), cfg.num_heads, cfg.eps)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)


def test_gating_error_without_weights(monkeypatch):
    monkeypatch.delenv("DOVE_MUSIQ_WEIGHTS", raising=False)
    from dove_tpu.eval.metrics import get_metric

    with pytest.raises(NotImplementedError, match="MUSIQ"):
        get_metric("musiq")


def test_load_and_score_clip(tmp_path):
    """End-to-end: export a random state dict, load via the gate, score."""
    sd = _random_sd(CFG)
    path = tmp_path / "musiq.pt"
    torch.save(sd, path)
    from dove_tpu.eval import musiq as m

    params = m.load_musiq(str(path), CFG)
    fwd = jax.jit(lambda pa, h, s: musiq_forward(CFG, params, pa, h, s))
    clip = np.random.default_rng(5).random((2, 24, 40, 3)).astype(np.float32)
    vals = []
    for frame in clip:
        pa, h, s = multiscale_tokens(CFG, frame)
        vals.append(float(fwd(jnp.asarray(pa), jnp.asarray(h), jnp.asarray(s))))
    assert all(np.isfinite(v) for v in vals)
