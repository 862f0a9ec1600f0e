"""CogVideoX-2B-style DiT variant at tiny scale (PARITY §2.2 row 6).

The 2B architecture differs structurally from the 1.5-5B: no temporal
patching (patch_size_t=None -> conv2d patchify with bias), no RoPE —
a static sincos positional table sized by (sample_height, sample_width)
instead. These tests run the variant end to end through the pipeline so
the 2B-only code paths (ops/sincos.py, the 2D patchify/unpatchify) are
exercised, at tiny scale on CPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dove_tpu.config import tiny_test
from dove_tpu.models.dit import init_dit_params
from dove_tpu.models.vae import init_vae_params
from dove_tpu.pipeline import DovePipeline


@pytest.fixture(scope="module")
def params_2b():
    cfg = tiny_test()
    cfg = dataclasses.replace(
        cfg,
        dit=dataclasses.replace(
            cfg.dit,
            patch_size_t=None,
            patch_bias=True,
            use_rotary_positional_embeddings=False,
            use_learned_positional_embeddings=False,
            # sincos table extent, in latent units (2B reads 60x90)
            sample_height=8,
            sample_width=8,
        ),
    )
    return (
        cfg,
        init_dit_params(jax.random.PRNGKey(0), cfg.dit),
        init_vae_params(jax.random.PRNGKey(1), cfg.vae),
        jnp.zeros((cfg.dit.max_text_seq_length, cfg.dit.text_embed_dim)),
    )


def _pipe(params_2b, **kw):
    cfg, dit, vae, prompt = params_2b
    return DovePipeline(
        config=cfg, dit_params=dit, vae_params=vae, prompt_embedding=prompt,
        dtype=jnp.float32, donate_input=False, sample_posterior=False,
        donate_weights=False, **kw,
    )


def test_2b_params_have_no_temporal_patch(params_2b):
    cfg, dit, _, _ = params_2b
    leaves = {jax.tree_util.keystr(p): v.shape
              for p, v in jax.tree_util.tree_leaves_with_path(dit)}
    patch_kernels = {k: s for k, s in leaves.items() if "patch" in k.lower()}
    assert patch_kernels, "no patch-embed parameters found"
    # conv2d patchify: kernel rank 4 (HWIO), not the 1.5's rank-2 matmul
    # over (p_t * p * p * C) columns
    assert any(len(s) == 4 for s in patch_kernels.values()), patch_kernels


def test_2b_pipeline_forward(params_2b):
    frames = np.random.default_rng(0).random((9, 8, 8, 3)).astype(np.float32)
    out = _pipe(params_2b).process_frames(frames)
    assert out.shape == (9, 32, 32, 3)
    assert np.isfinite(out).all()
    out2 = _pipe(params_2b).process_frames(frames)
    np.testing.assert_array_equal(out, out2)


def test_2b_staged_matches_fused(params_2b):
    """The staged (VAE-tiled) path runs the same 2B math as the fused one."""
    cfg, dit, vae, prompt = params_2b
    big_tile_cfg = dataclasses.replace(
        cfg, vae=dataclasses.replace(
            cfg.vae, tile_sample_min_height=128, tile_sample_min_width=128
        )
    )
    p2b = (big_tile_cfg, dit, vae, prompt)
    frames = np.random.default_rng(1).random((9, 8, 8, 3)).astype(np.float32)
    out_fused = _pipe(p2b).process_frames(frames)
    out_staged = _pipe(p2b, vae_tiling=True).process_frames(frames)
    assert out_staged.shape == out_fused.shape
    np.testing.assert_allclose(
        out_fused, np.asarray(out_staged, np.float32) / 255.0
        if out_staged.dtype == np.uint8 else out_staged,
        atol=0.02,
    )
