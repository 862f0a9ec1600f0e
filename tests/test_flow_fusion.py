"""Flow propagation / fusion modules (reference optical_flow_utils.py).

flow_warp is pinned against torch grid_sample (the reference's substrate,
available in-env); the rest is pinned by algebraic invariants that each
fail under a plausible wrong implementation (padding mode, mask gating,
zero-init, deform-conv tap arithmetic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dove_tpu.models import flow_fusion as ff


@pytest.fixture(scope="module")
def rng_np():
    return np.random.default_rng(7)


def test_flow_warp_matches_torch_grid_sample(rng_np):
    """Reference flow_warp = grid_sample(align_corners=True, zeros) on a
    flow-displaced mesh grid; torch is the oracle."""
    import torch
    import torch.nn.functional as F

    B, H, W, C = 2, 13, 17, 3
    x = rng_np.standard_normal((B, H, W, C)).astype(np.float32)
    flow = (rng_np.standard_normal((B, H, W, 2)) * 3).astype(np.float32)

    ours = np.asarray(ff.flow_warp(jnp.asarray(x), jnp.asarray(flow)))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    fl = torch.from_numpy(flow)
    gy, gx = torch.meshgrid(torch.arange(H), torch.arange(W), indexing="ij")
    grid = torch.stack((gx, gy), 2).float()[None] + fl
    gxn = 2.0 * grid[..., 0] / max(W - 1, 1) - 1.0
    gyn = 2.0 * grid[..., 1] / max(H - 1, 1) - 1.0
    golden = F.grid_sample(
        xt, torch.stack((gxn, gyn), dim=3), mode="bilinear",
        padding_mode="zeros", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, golden, atol=2e-5)


def test_flow_warp_integer_shift(rng_np):
    x = rng_np.standard_normal((1, 6, 8, 2)).astype(np.float32)
    flow = np.zeros((1, 6, 8, 2), np.float32)
    flow[..., 0] = 1.0  # sample at x+1
    out = np.asarray(ff.flow_warp(jnp.asarray(x), jnp.asarray(flow)))
    np.testing.assert_allclose(out[:, :, :-1], x[:, :, 1:], atol=1e-6)
    assert np.all(out[:, :, -1] == 0)  # zeros padding off the right edge


def test_fb_consistency_masks():
    B, H, W = 1, 8, 8
    zero = jnp.zeros((B, H, W, 2))
    assert np.all(np.asarray(ff.fb_consistency(zero, zero)) == 1.0)
    # grossly inconsistent flows (both point +x) -> invalid
    fw = jnp.full((B, H, W, 2), 8.0)
    assert np.asarray(ff.fb_consistency(fw, fw)).mean() < 0.5


def test_propagation_invariants(rng_np):
    """fuse_scale=0 makes 'fuse' mode an identity; 'copy' with zero flow
    broadcasts the last frame (backward then forward chain)."""
    x = jnp.asarray(rng_np.standard_normal((1, 5, 8, 8, 4)), jnp.float32)
    zero_flows = jnp.zeros((1, 4, 8, 8, 2), jnp.float32)
    ident = ff.optical_flow_process(
        x, zero_flows, zero_flows, mode="fuse", fuse_scale=0.0)
    np.testing.assert_allclose(np.asarray(ident), np.asarray(x), atol=1e-6)
    copied = ff.optical_flow_process(
        x, zero_flows, zero_flows, mode="copy")
    want = jnp.broadcast_to(x[:, -1:], x.shape)
    np.testing.assert_allclose(np.asarray(copied), np.asarray(want), atol=1e-6)


def test_optical_flow_feature_directions(rng_np):
    """Both branches read the ORIGINAL input (unlike the chained process):
    with copy mode + zero flow, backward broadcasts frame T-1, forward
    broadcasts frame 0."""
    x = jnp.asarray(rng_np.standard_normal((1, 4, 6, 6, 3)), jnp.float32)
    zf = jnp.zeros((1, 3, 6, 6, 2), jnp.float32)
    back, fwd = ff.optical_flow_feature(x, zf, zf, mode="copy")
    np.testing.assert_allclose(
        np.asarray(back), np.asarray(jnp.broadcast_to(x[:, -1:], x.shape)),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(fwd), np.asarray(jnp.broadcast_to(x[:, :1], x.shape)),
        atol=1e-6)


def test_resize_flows_scales_values():
    flows = jnp.ones((1, 2, 4, 4, 2))
    up = ff.resize_flows(flows, (8, 8))
    assert up.shape == (1, 2, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(up), 2.0, atol=1e-6)


def test_modulated_deform_conv_reduces_to_conv(rng_np):
    """offset=0, mask=1 => exactly a SAME-padded 3x3 convolution."""
    B, H, W, Cin, Cout, G = 1, 7, 9, 8, 5, 4
    x = jnp.asarray(rng_np.standard_normal((B, H, W, Cin)), jnp.float32)
    w = jnp.asarray(rng_np.standard_normal((3, 3, Cin, Cout)) * 0.1,
                    jnp.float32)
    offset = jnp.zeros((B, H, W, G, 9, 2))
    mask = jnp.ones((B, H, W, G, 9))
    ours = np.asarray(ff.modulated_deform_conv(x, offset, mask, w))
    ref = np.asarray(jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_modulated_deform_conv_mask_gates(rng_np):
    """mask=0 zeroes the output; fractional offsets bilinearly blend."""
    B, H, W, Cin, Cout, G = 1, 6, 6, 4, 3, 2
    x = jnp.asarray(rng_np.standard_normal((B, H, W, Cin)), jnp.float32)
    w = jnp.asarray(rng_np.standard_normal((3, 3, Cin, Cout)), jnp.float32)
    offset = jnp.zeros((B, H, W, G, 9, 2))
    out0 = ff.modulated_deform_conv(x, offset, jnp.zeros((B, H, W, G, 9)), w)
    assert np.allclose(np.asarray(out0), 0.0, atol=1e-6)
    half = ff.modulated_deform_conv(
        x, offset, jnp.full((B, H, W, G, 9), 0.5), w)
    full = ff.modulated_deform_conv(
        x, offset, jnp.ones((B, H, W, G, 9)), w)
    np.testing.assert_allclose(
        np.asarray(half), 0.5 * np.asarray(full), atol=1e-5)


def test_deformable_alignment_zero_init_property(rng_np):
    """With the zero-init offset head and zero flow, alignment = 0.5 x the
    plain 3x3 conv of x (offsets 0, every modulation sigmoid(0)=0.5)."""
    C, G = 16, 4
    key = jax.random.PRNGKey(0)
    p = ff.init_propagation_params(key, C, mid_channels=C, groups=G)
    d = p["backward_prop"]["deform"]
    B, H, W = 1, 6, 6
    x = jnp.asarray(rng_np.standard_normal((B, H, W, C)), jnp.float32)
    cond = jnp.asarray(
        rng_np.standard_normal((B, H, W, 2 * C + 3)), jnp.float32)
    flow = jnp.zeros((B, H, W, 2))
    out = ff.deformable_alignment(d, x, cond, flow, groups=G)
    plain = jax.lax.conv_general_dilated(
        x, d["weight"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + d["bias"]
    np.testing.assert_allclose(
        np.asarray(out), 0.5 * np.asarray(plain - d["bias"]) + d["bias"],
        atol=1e-4)


def test_propagation_learnable_forward(rng_np):
    C = 8
    p = ff.init_propagation_params(
        jax.random.PRNGKey(1), C, mid_channels=C, groups=2)
    x = jnp.asarray(rng_np.standard_normal((1, 4, 8, 8, C)), jnp.float32)
    flows = jnp.asarray(
        rng_np.standard_normal((1, 3, 8, 8, 2)), jnp.float32)
    out = ff.propagation_forward(p, x, flows, -flows, groups=2)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))
    # deterministic
    out2 = ff.propagation_forward(p, x, flows, -flows, groups=2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_fusion_module_identity_at_init(rng_np):
    """final_zero_init=True (reference default) makes the module an exact
    identity at the start of training."""
    C = 8
    p = ff.init_fusion_module_params(jax.random.PRNGKey(2), C)
    x = jnp.asarray(rng_np.standard_normal((1, 3, 8, 8, C)), jnp.float32)
    b = jnp.asarray(rng_np.standard_normal(x.shape), jnp.float32)
    f = jnp.asarray(rng_np.standard_normal(x.shape), jnp.float32)
    out = ff.fusion_module_forward(p, x, b, f)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
    # and it is not structurally an identity: perturb the final kernel
    p["final_proj"]["kernel"] = p["final_proj"]["kernel"] + 0.1
    out2 = ff.fusion_module_forward(p, x, b, f)
    assert not np.allclose(np.asarray(out2), np.asarray(x), atol=1e-3)


@pytest.mark.slow
def test_raft_bi_shapes():
    """raft_bi_clip: geometry + slicing on random-init RAFT weights."""
    from dove_tpu.models.raft import init_raft_params

    params = init_raft_params(jax.random.PRNGKey(0))
    clip = jnp.asarray(
        np.random.default_rng(0).random((1, 3, 20, 28, 3)), jnp.float32)
    fwd, bwd = ff.raft_bi_clip(params, clip, iters=2)
    assert fwd.shape == (1, 2, 20, 28, 2)
    assert bwd.shape == (1, 2, 20, 28, 2)
    assert np.all(np.isfinite(np.asarray(fwd)))
