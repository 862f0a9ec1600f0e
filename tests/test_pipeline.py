"""Pipeline integration: fused tile path vs staged VAE-tiling path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dove_tpu.config import tiny_test
from dove_tpu.models.dit import init_dit_params
from dove_tpu.models.vae import init_vae_params
from dove_tpu.pipeline import DovePipeline


@pytest.fixture(scope="module")
def params():
    cfg = tiny_test()
    return (
        cfg,
        init_dit_params(jax.random.PRNGKey(0), cfg.dit),
        init_vae_params(jax.random.PRNGKey(1), cfg.vae),
        jnp.zeros((cfg.dit.max_text_seq_length, cfg.dit.text_embed_dim)),
    )


def _pipe(params, **kw):
    cfg, dit, vae, prompt = params
    return DovePipeline(
        config=cfg, dit_params=dit, vae_params=vae, prompt_embedding=prompt,
        dtype=jnp.float32, donate_input=False, sample_posterior=False, **kw,
    )


def test_staged_matches_fused_when_untiled(params):
    """With the VAE tile larger than the frame, the staged (--is_vae_st) path
    runs the exact same math as the fused single-program path."""
    import dataclasses

    cfg, dit, vae, prompt = params
    big_tile_cfg = dataclasses.replace(
        cfg, vae=dataclasses.replace(
            cfg.vae, tile_sample_min_height=128, tile_sample_min_width=128
        )
    )
    params_big = (big_tile_cfg, dit, vae, prompt)
    frames = np.random.default_rng(0).random((9, 8, 8, 3)).astype(np.float32)
    out_fused = _pipe(params_big).process_frames(frames)
    out_staged = _pipe(params_big, vae_tiling=True).process_frames(frames)
    assert out_fused.shape == out_staged.shape == (9, 32, 32, 3)
    # staged path upscales on device (jax.image.resize) and returns uint8;
    # tolerance covers quantization (1/255) + resize-impl differences
    np.testing.assert_allclose(out_fused, out_staged, atol=0.02)
    assert np.abs(out_fused - out_staged).mean() < 0.005


def test_staged_with_vae_tiles_and_chunks(params):
    """Output geometry survives feathered VAE tiling + temporal chunking."""
    frames = np.random.default_rng(1).random((12, 24, 40, 3)).astype(np.float32)
    out = _pipe(params, vae_tiling=True).process_frames(
        frames, chunk_len=9, overlap_t=4
    )
    assert out.shape == (12, 96, 160, 3)
    assert np.isfinite(out).all()
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_staged_auto_chunking_long_clip(params):
    """Clips beyond the per-pass frame budget auto-chunk with uniform-stride
    tail padding; output geometry and coverage must survive."""
    frames = np.random.default_rng(2).random((41, 8, 8, 3)).astype(np.float32)
    out = _pipe(params, vae_tiling=True).process_frames(frames)
    assert out.shape == (41, 32, 32, 3)
    assert np.isfinite(out).all()


def test_plan_axis_minimal_coverage():
    """Uniform minimal-coverage tiling: fewest tiles, exact stride/blend
    relation, coverage >= size, tiles <= max."""
    from dove_tpu.pipeline import DovePipeline

    plan = DovePipeline._plan_axis
    # single tile when it fits
    assert plan(24, 2, 32) == (24, 24, 1)
    for size, blend, max_tile in [
        (90, 2, 28), (90, 2, 32), (90, 2, 40), (160, 2, 28), (160, 2, 32),
        (160, 2, 40), (45, 2, 32), (33, 2, 32), (129, 2, 24),
    ]:
        tile, stride, n = plan(size, blend, max_tile)
        assert tile <= max_tile
        assert stride == tile - blend
        cover = (n - 1) * stride + tile
        assert cover >= size, (size, blend, max_tile, tile, stride, n)
        # minimality: one fewer tile of the max size cannot cover
        if n > 1:
            assert (n - 2) * (max_tile - blend) + max_tile < size
    # the 720p bench geometry: 4x7 decode tiles at <=28 (was 5x8 at 24),
    # 3x5 at <=40 (int8 budget)
    assert plan(90, 2, 28) == (24, 22, 4)
    assert plan(160, 2, 28) == (25, 23, 7)
    assert plan(90, 2, 40) == (32, 30, 3)
    assert plan(160, 2, 40) == (34, 32, 5)
