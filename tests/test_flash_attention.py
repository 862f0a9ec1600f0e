"""Pallas flash attention vs the naive fp32 oracle (interpreter mode, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dove_tpu.ops.attention import _naive_attention
from dove_tpu.ops.pallas.flash_attention import flash_attention


def _rand_qkv(key, B, H, S, D, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    mk = lambda k: jax.random.normal(k, (B, H, S, D), dtype)
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


@pytest.mark.parametrize("S", [128, 226, 640])
def test_flash_matches_naive(S):
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), 1, 2, S, 64)
    out = flash_attention(q, k, v, None, 256, 256)
    ref = _naive_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_grads_match_naive():
    S = 200  # not a block multiple: exercises padding/masking in fwd+bwd
    q, k, v = _rand_qkv(jax.random.PRNGKey(1), 1, 2, S, 64)
    tangent = jax.random.normal(jax.random.PRNGKey(2), q.shape)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, 128, 128) * tangent)

    def loss_naive(q, k, v):
        return jnp.sum(_naive_attention(q, k, v) * tangent)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_naive = jax.grad(loss_naive, argnums=(0, 1, 2))(q, k, v)
    for gf, gn, name in zip(g_flash, g_naive, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gn), atol=5e-4, err_msg=f"d{name}"
        )


@pytest.mark.parametrize("S", [226, 640])
def test_flash_bounded_logits_matches_naive(S):
    """bounded_logits path (no running max, exp2): exact vs oracle as long as
    logits stay in fp32 exp range — the DiT's qk-layernorm regime."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(4), 1, 2, S, 64)
    out = flash_attention(q, k, v, None, 256, 256, True)
    ref = _naive_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    tangent = jax.random.normal(jax.random.PRNGKey(5), q.shape)
    g_b = jax.grad(
        lambda q, k, v: jnp.sum(
            flash_attention(q, k, v, None, 256, 256, True) * tangent
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_n = jax.grad(
        lambda q, k, v: jnp.sum(_naive_attention(q, k, v) * tangent),
        argnums=(0, 1, 2),
    )(q, k, v)
    for gb, gn, name in zip(g_b, g_n, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gb), np.asarray(gn), atol=5e-4, err_msg=f"d{name}"
        )


def test_flash_bf16_close():
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), 1, 2, 256, 64, jnp.bfloat16)
    out = flash_attention(q, k, v, None, 128, 128)
    ref = _naive_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=3e-2
    )


@pytest.mark.parametrize("S", [226, 640])
def test_flash_qk_int8_close_to_naive(S):
    """int8-QK^T serving path: per-tensor 8-bit logits cost ~1e-2 output
    error (in line with the int8 mode's W8A8 linears); inference-only."""
    q, k, v = _rand_qkv(jax.random.PRNGKey(6), 1, 2, S, 64)
    out = flash_attention(q, k, v, None, 256, 256, True, True)
    ref = _naive_attention(q, k, v)
    rel = float(
        jnp.linalg.norm((out - ref).astype(jnp.float32))
        / jnp.linalg.norm(ref.astype(jnp.float32))
    )
    assert rel < 2e-2, rel
    assert out.dtype == v.dtype

    with pytest.raises(NotImplementedError, match="inference-only"):
        jax.grad(
            lambda q: jnp.sum(
                flash_attention(q, k, v, None, 256, 256, True, True)
            )
        )(q)


def test_flash_qk_int8_requires_bounded():
    q, k, v = _rand_qkv(jax.random.PRNGKey(7), 1, 1, 226, 64)
    with pytest.raises(ValueError, match="bounded"):
        flash_attention(q, k, v, None, 256, 256, False, True)
