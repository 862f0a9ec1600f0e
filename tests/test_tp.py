"""Tensor-parallel DiT serving (dove_tpu/parallel/tp.py) + mesh window
sharding (DovePipeline._window_map) on the virtual 8-device CPU mesh.

Exactness bars: window sharding is bit-exact (identical per-window programs,
only distributed); tensor parallelism splits contractions, so DiT outputs
match to accumulation-order tolerance and uint8 pipeline outputs to +/-1.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dove_tpu.config import tiny_test
from dove_tpu.models.dit import dit_forward, init_dit_params
from dove_tpu.models.vae import init_vae_params
from dove_tpu.parallel import tp
from dove_tpu.parallel.mesh import make_mesh
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


@pytest.fixture(scope="module")
def dit_inputs(params):
    cfg, _, _, _ = params
    B = 2
    z = jax.random.normal(
        jax.random.PRNGKey(1), (B, 2, cfg.dit.in_channels, 4, 8), jnp.float32
    )
    text = jax.random.normal(
        jax.random.PRNGKey(2),
        (B, cfg.dit.max_text_seq_length, cfg.dit.text_embed_dim), jnp.float32,
    )
    t = jnp.full((B,), 399, jnp.int32)
    return z, text, t


def _rel_err(a, b):
    return float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))


@pytest.mark.parametrize("tp_n", [2, 4])
def test_tp_dit_matches_single_device(params, dit_inputs, tp_n):
    cfg, dit_params, _, _ = params
    z, text, t = dit_inputs
    ref = dit_forward(dit_params, cfg.dit, z, text, t)
    mesh = make_mesh(data=1, model=tp_n)
    sharded = tp.shard_dit_tp(dit_params, mesh, donate=False)
    out = jax.jit(tp.make_tp_dit(mesh, cfg.dit))(sharded, z, text, t)
    assert out.shape == ref.shape
    assert _rel_err(out, ref) < 1e-5


@pytest.mark.parametrize("mesh_shape", [(4, 2), (8, 1), (2, 4)])
def test_sp_single_batch_matches_single_device(params, dit_inputs, mesh_shape):
    """B=1 (batch can't shard over 'data'): the residual data axis carries
    sequence parallelism — token-sharded attention core + MLP, all-gathered
    — composing with TP over 'model'. Covers the pad path (tiny sequence
    not divisible by the sp degree)."""
    cfg, dit_params, _, _ = params
    z, text, t = dit_inputs
    z, text, t = z[:1], text[:1], t[:1]
    ref = dit_forward(dit_params, cfg.dit, z, text, t)
    data, model = mesh_shape
    mesh = make_mesh(data=data, model=model)
    sharded = tp.shard_dit_tp(dit_params, mesh, donate=False)
    out = jax.jit(tp.make_tp_dit(mesh, cfg.dit))(sharded, z, text, t)
    assert out.shape == ref.shape
    assert _rel_err(out, ref) < 1e-5


def test_sp_over_multiple_residual_axes(params, dit_inputs):
    """A 3-axis mesh (replica=2, data=2, model=2) serving B=1: BOTH
    residual axes carry sequence parallelism (flat row-major shard index
    over the tuple, matching all_gather's ordering)."""
    from jax.sharding import Mesh

    cfg, dit_params, _, _ = params
    z, text, t = dit_inputs
    z, text, t = z[:1], text[:1], t[:1]
    ref = dit_forward(dit_params, cfg.dit, z, text, t)
    devs = np.array(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("replica", "data", "model"))
    sharded = tp.shard_dit_tp(dit_params, mesh, donate=False)
    out = jax.jit(tp.make_tp_dit(mesh, cfg.dit))(sharded, z, text, t)
    assert _rel_err(out, ref) < 1e-5


def test_tp_composes_with_batch_sharding(params, dit_inputs):
    """data=2 x model=2: the batch shards over "data", TP over "model"."""
    cfg, dit_params, _, _ = params
    z, text, t = dit_inputs
    ref = dit_forward(dit_params, cfg.dit, z, text, t)
    mesh = make_mesh(data=2, model=2)
    sharded = tp.shard_dit_tp(dit_params, mesh, donate=False)
    out = jax.jit(tp.make_tp_dit(mesh, cfg.dit))(sharded, z, text, t)
    assert _rel_err(out, ref) < 1e-5


def test_tp_int8_close_to_sequential_int8(params, dit_inputs):
    """int8 TP recomputes the dynamic activation scale per shard for the
    row-parallel inputs — close to, not equal to, sequential int8."""
    from dove_tpu.ops.quant import quantize_dit

    cfg, dit_params, _, _ = params
    z, text, t = dit_inputs
    qp = quantize_dit(dit_params, donate=False)
    ref = dit_forward(qp, cfg.dit, z, text, t)
    mesh = make_mesh(data=1, model=4)
    sharded = tp.shard_dit_tp(qp, mesh, donate=False)
    out = jax.jit(tp.make_tp_dit(mesh, cfg.dit))(sharded, z, text, t)
    assert _rel_err(out, ref) < 3e-2


def test_sp_int8_close_to_sequential_int8(params, dit_inputs):
    """int8 + sequence parallelism (B=1 on data=2 x model=2): the dynamic
    activation scale becomes per-token-slice for the row-parallel inputs —
    close to, not equal to, sequential int8."""
    from dove_tpu.ops.quant import quantize_dit

    cfg, dit_params, _, _ = params
    z, text, t = dit_inputs
    z, text, t = z[:1], text[:1], t[:1]
    qp = quantize_dit(dit_params, donate=False)
    ref = dit_forward(qp, cfg.dit, z, text, t)
    mesh = make_mesh(data=2, model=2)
    sharded = tp.shard_dit_tp(qp, mesh, donate=False)
    out = jax.jit(tp.make_tp_dit(mesh, cfg.dit))(sharded, z, text, t)
    assert _rel_err(out, ref) < 3e-2


def test_tp_specs_layout(params):
    cfg, dit_params, _, _ = params
    specs = tp.dit_tp_specs(dit_params, "model")
    blocks = specs["blocks"]
    # column-parallel: output (last) dim sharded, bias/scales follow
    assert blocks["attn1"]["to_q"]["kernel"] == (None, None, "model")
    assert blocks["attn1"]["to_q"]["bias"] == (None, "model")
    assert blocks["ff"]["net_0_proj"]["kernel"] == (None, None, "model")
    # row-parallel: input dim sharded, bias replicated
    assert blocks["attn1"]["to_out"]["kernel"] == (None, "model", None)
    assert blocks["attn1"]["to_out"]["bias"] == ()
    assert blocks["ff"]["net_2"]["kernel"] == (None, "model", None)
    # everything outside the matmuls replicated
    assert specs["patch_embed"]["proj"]["kernel"] == ()
    assert blocks["norm1"]["linear"]["kernel"] == ()
    assert blocks["attn1"]["norm_q"]["scale"] == ()


def test_tp_specs_quantized_layout(params):
    from dove_tpu.ops.quant import quantize_dit

    cfg, dit_params, _, _ = params
    qp = quantize_dit(dit_params, donate=False)
    specs = tp.dit_tp_specs(qp, "model")
    blocks = specs["blocks"]
    assert blocks["attn1"]["to_q"]["kernel_q"] == (None, None, "model")
    assert blocks["attn1"]["to_q"]["kernel_scale"] == (None, None, "model")
    assert blocks["attn1"]["to_out"]["kernel_q"] == (None, "model", None)
    # per-output-channel scale of a row-parallel kernel stays replicated
    assert blocks["attn1"]["to_out"]["kernel_scale"] == ()


def test_validate_tp_rejects_nondividing(params):
    cfg, _, _, _ = params  # tiny config: 4 heads
    with pytest.raises(ValueError, match="tensor_parallel=3"):
        tp.validate_tp(cfg.dit, 3)


# ---------------------------------------------------------------------------
# Pipeline-level mesh serving
# ---------------------------------------------------------------------------

def _pipe(params, **kw):
    cfg, dit, vae, prompt = params
    return DovePipeline(
        config=cfg, dit_params=dit, vae_params=vae, prompt_embedding=prompt,
        dtype=jnp.float32, donate_input=False, sample_posterior=False,
        donate_weights=False,  # params fixture is shared across tests
        vae_tiling=True, output_uint8=True, **kw,
    )


FRAMES = np.random.default_rng(3).random((9, 8, 8, 3)).astype(np.float32)


def test_single_clip_window_sharding_bit_exact(params):
    """Single chunk on a data mesh: the decode's spatial windows shard over
    the chips (dec_window_cap forces a 2x2 window plan on the tiny latent)
    — bit-identical to single-device, including the padded-worklist case
    (8 shards > 4 windows)."""
    seq = _pipe(params, dec_window_cap=(3, 3)).process_frames(FRAMES)
    for data in (4, 8):
        par = _pipe(params, dec_window_cap=(3, 3)).process_frames(
            FRAMES, mesh=make_mesh(data=data, model=1)
        )
        np.testing.assert_array_equal(par, seq)


def test_single_clip_encode_window_sharding_bit_exact(params, monkeypatch):
    """Encode-side window sharding (budget shrunk so the 4x4 latent plans
    2x2 encode windows too)."""
    monkeypatch.setattr(
        DovePipeline, "_window_budget", lambda self: (2, (3, 3), (3, 3))
    )
    seq = _pipe(params).process_frames(FRAMES)
    par = _pipe(params).process_frames(FRAMES, mesh=make_mesh(data=4, model=1))
    np.testing.assert_array_equal(par, seq)


def test_single_clip_tensor_parallel(params):
    """model-axis TP on a single clip: uint8 output within +/-1 of the
    single-device path (contraction-order tolerance), both pure-TP and the
    hybrid data x model mesh."""
    seq = _pipe(params, dec_window_cap=(3, 3)).process_frames(FRAMES)
    for data, model in ((1, 4), (2, 2)):
        par = _pipe(params, dec_window_cap=(3, 3)).process_frames(
            FRAMES, mesh=make_mesh(data=data, model=model)
        )
        diff = np.abs(par.astype(int) - seq.astype(int))
        assert diff.max() <= 1, diff.max()
        assert (diff > 0).mean() < 1e-3


def test_chunk_parallel_composes_with_tp(params):
    """Long clip: temporal chunks shard over "data" while each chunk's DiT
    runs TP over "model" — the hybrid production layout."""
    frames = np.random.default_rng(4).random((14, 8, 8, 3)).astype(np.float32)
    seq = _pipe(params, dec_window_cap=(3, 3)).process_frames(
        frames, chunk_len=9, overlap_t=4
    )
    par = _pipe(params, dec_window_cap=(3, 3)).process_frames(
        frames, chunk_len=9, overlap_t=4, mesh=make_mesh(data=2, model=2)
    )
    assert par.shape == seq.shape
    diff = np.abs(par.astype(int) - seq.astype(int))
    assert diff.max() <= 1


@pytest.mark.parametrize("data,model", [(1, 2), (2, 2)])
def test_single_clip_tp_int8_runs(params, data, model):
    """int8 serving mode + TP: quantized param tree shards and serves.
    (2, 2) additionally engages sequence parallelism over the idle data
    axis (B=1), exercising qlinear on token slices."""
    cfg, dit, vae, prompt = params
    pipe = DovePipeline(
        config=cfg, dit_params=dit, vae_params=vae, prompt_embedding=prompt,
        dtype=jnp.float32, donate_input=False, sample_posterior=False,
        donate_weights=False, vae_tiling=True, output_uint8=True,
        quantize="int8", dec_window_cap=(3, 3),
    )
    out = pipe.process_frames(FRAMES, mesh=make_mesh(data=data, model=model))
    assert out.dtype == np.uint8 and out.shape == (9, 32, 32, 3)
