"""Pallas W8A8 3x3x3 conv kernel vs the XLA int8 conv (exactness).

Runs the kernel in interpreter mode on CPU — both paths accumulate the
same int8 products in int32 and apply the same fp32 dequant, so the
comparison is exact, including the width-tap alignment done by rolling
the per-dw accumulators and the garbage-column masking at the W32 pad.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dove_tpu.ops.pallas.conv3d_int8 as conv_mod


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(
        conv_mod.pl, "pallas_call",
        functools.partial(conv_mod.pl.pallas_call, interpret=True),
    )
    # the jit cache would otherwise reuse a non-interpret trace
    conv_mod.conv3d_w8a8.clear_cache()
    conv_mod.conv3d_bf16.clear_cache()


@pytest.mark.parametrize(
    "shape",
    [
        (5, 12, 38, 128, 128),  # W32 padding path (36 -> 64)
        (4, 7, 20, 256, 128),  # multiple cin blocks
        (3, 34, 11, 128, 256),  # multiple cout blocks, several row blocks
    ],
)
def test_conv3d_w8a8_matches_xla_int8(shape):
    F, Hp, Wp, Cin, Cout = shape
    rng = np.random.default_rng(hash(shape) % 2**32)
    x_q = jnp.asarray(rng.integers(-127, 128, (F, Hp, Wp, Cin)), jnp.int8)
    w_q = jnp.asarray(
        rng.integers(-127, 128, (3, 3, 3, Cin, Cout)), jnp.int8
    )
    sx = jnp.float32(0.013)
    sk = jnp.asarray(rng.random(Cout, np.float32) * 0.02)

    ref_acc = jax.lax.conv_general_dilated(
        x_q[None], w_q, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.int32,
    )[0]
    ref = (ref_acc.astype(jnp.float32) * (sx * sk)).astype(jnp.bfloat16)

    out = conv_mod.conv3d_w8a8(x_q, w_q, sx, sk)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    np.testing.assert_array_equal(
        np.asarray(out, np.float32), np.asarray(ref, np.float32)
    )


@pytest.mark.parametrize("dh_fold", [False, True])
@pytest.mark.parametrize(
    "shape",
    [
        (5, 12, 38, 128, 128),  # W16 padding path
        (4, 7, 20, 256, 128),  # multiple cin blocks
        (3, 18, 11, 128, 256),  # multiple cout blocks, several row blocks
    ],
)
def test_conv3d_bf16_matches_xla(shape, dh_fold):
    # fp32 accumulation order differs between the 27-tap schedule and
    # XLA's conv emitter, so exactness is allclose at fp32 epsilon scaled
    # by the K=3456 reduction, not array_equal as in the int8 test.
    F, Hp, Wp, Cin, Cout = shape
    rng = np.random.default_rng(hash(shape) % 2**32)
    x = jnp.asarray(rng.normal(0, 1, (F, Hp, Wp, Cin)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.03, (3, 3, 3, Cin, Cout)), jnp.bfloat16)

    ref = jax.lax.conv_general_dilated(
        x[None], w, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )[0].astype(jnp.float32)

    out = conv_mod.conv3d_bf16(x, w, out_dtype=jnp.float32, dh_fold=dh_fold)
    assert out.shape == ref.shape
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=2e-5 * scale
    )


def test_causal_conv3d_pallas_route_matches_xla():
    """The serving switch routes eligible bf16 convs through the Pallas
    kernel with identical causal semantics (cache threading included)."""
    from dove_tpu.models import vae as vae_mod

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(0, 1, (1, 5, 10, 21, 128)), jnp.bfloat16)
    p = {
        "kernel": jnp.asarray(
            rng.normal(0, 0.03, (3, 3, 3, 128, 128)), jnp.bfloat16
        ),
        "bias": jnp.asarray(rng.normal(0, 0.1, (128,)), jnp.float32),
    }
    y_ref, c_ref = vae_mod.causal_conv3d(p, x, None)
    vae_mod.set_pallas_conv(True)
    try:
        y_pl, c_pl = vae_mod.causal_conv3d(p, x, None)
    finally:
        vae_mod.set_pallas_conv(False)
    assert y_pl.shape == y_ref.shape and y_pl.dtype == y_ref.dtype
    np.testing.assert_array_equal(np.asarray(c_pl), np.asarray(c_ref))
    # both paths accumulate bf16 products in fp32; only summation order
    # differs, so agreement is at bf16 resolution
    np.testing.assert_allclose(
        np.asarray(y_pl, np.float32), np.asarray(y_ref, np.float32),
        atol=0.02, rtol=0.02,
    )
