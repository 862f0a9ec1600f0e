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
