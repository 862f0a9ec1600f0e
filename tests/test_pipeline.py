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
        dtype=jnp.float32, donate_input=False, sample_posterior=False,
        donate_weights=False,  # params fixture is shared across tests
        **kw,
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


def test_i420_output_matches_rgb(params):
    """Staged path with output_i420: device-side BT.601 + 2x2 chroma
    averaging must agree with cv2's I420 conversion of the RGB output."""
    import cv2

    frames = np.random.default_rng(3).random((9, 8, 8, 3)).astype(np.float32)
    rgb = _pipe(params, vae_tiling=True, output_uint8=True).process_frames(frames)
    packed = _pipe(
        params, vae_tiling=True, output_uint8=True, output_i420=True
    ).process_frames(frames)
    assert rgb.dtype == packed.dtype == np.uint8
    assert rgb.shape == (9, 32, 32, 3)
    assert packed.shape == (9, 48, 32)  # H*3//2 packed planes
    # Oracle: same spec in NumPy — BT.601 studio-swing, 2x2 chroma MEAN
    # (higher-quality than cv2's top-left chroma SAMPLE, so compare against
    # the spec, not cv2, at tight tolerance).
    f = rgb.astype(np.float64) / 255.0
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    ey = 0.299 * r + 0.587 * g + 0.114 * b
    y = 16 + 219 * ey
    u = 128 + (112 / 0.886) * (b - ey)
    v = 128 + (112 / 0.701) * (r - ey)
    Fn, H, W = y.shape
    u2 = u.reshape(Fn, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
    v2 = v.reshape(Fn, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
    ref = np.concatenate(
        [np.round(y).reshape(Fn, -1), np.round(u2).reshape(Fn, -1),
         np.round(v2).reshape(Fn, -1)], axis=1,
    ).reshape(packed.shape)
    diff = np.abs(packed.astype(np.int16) - ref.astype(np.int16))
    # device converts from the pre-quantization float frame; the oracle from
    # uint8 RGB — ±1 count of propagated rounding is expected
    assert diff.mean() < 0.6, diff.mean()
    assert diff.max() <= 3, diff.max()

    # and cv2 can round-trip the packed clip back to RGB
    from dove_tpu.io.video import i420_to_rgb

    back = i420_to_rgb(packed)
    assert back.shape == rgb.shape
    # random-noise frames are the chroma-subsampling worst case; natural
    # video loses far less (4:2:0 is the H.264 default anyway)
    assert np.abs(back.astype(np.int16) - rgb.astype(np.int16)).mean() < 8.0


@pytest.mark.slow
def test_i420_chunked_and_cropped(params):
    """I420 survives temporal chunking + stitching and un-padding crops
    (odd input sizes pad, then crop back in packed layout)."""
    frames = np.random.default_rng(4).random((12, 23, 39, 3)).astype(np.float32)
    pipe = _pipe(params, vae_tiling=True, output_uint8=True, output_i420=True)
    out = pipe.process_frames(frames, chunk_len=9, overlap_t=4)
    # 23x39 pads to 24x40 -> 96x160 out -> crop back to 92x156
    assert out.shape == (12, 92 * 3 // 2, 156)
    rgb = _pipe(params, vae_tiling=True, output_uint8=True).process_frames(
        frames, chunk_len=9, overlap_t=4
    )  # multi-chunk uint8 fast path
    assert rgb.dtype == np.uint8
    rgb_u8 = rgb.astype(np.int16)
    # and the float path (metrics consumers) agrees with the uint8 path
    rgb_f = _pipe(params, vae_tiling=True).process_frames(
        frames, chunk_len=9, overlap_t=4
    )
    np.testing.assert_allclose(
        rgb_f, rgb.astype(np.float32) / 255.0, atol=1 / 255 + 1e-6
    )
    from dove_tpu.io.video import i420_to_rgb

    back = i420_to_rgb(out)
    assert back.shape == rgb_u8.shape
    assert np.abs(
        back.astype(np.int16) - rgb_u8
    ).mean() < 8.0  # chroma subsampling cost on random noise


def test_i420_requires_staged_uint8(params):
    with pytest.raises(ValueError, match="output_i420"):
        _pipe(params, output_i420=True)


def test_i420_crop_matches_rgb_crop():
    """tiling.i420_crop == convert(cropped RGB) for even crops."""
    import cv2

    from dove_tpu import tiling

    rng = np.random.default_rng(5)
    rgb = rng.integers(0, 255, (3, 48, 64, 3), np.uint8)
    packed = np.stack([cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420) for f in rgb])
    cropped = tiling.i420_crop(packed, 40, 56)
    ref = np.stack(
        [cv2.cvtColor(f[:40, :56], cv2.COLOR_RGB2YUV_I420) for f in rgb]
    )
    np.testing.assert_array_equal(cropped, ref)
    with pytest.raises(ValueError, match="even"):
        tiling.i420_crop(packed, 41, 56)


def test_staged_mesh_chunk_parallel_matches_sequential(params):
    """Production-path multi-chip serving: temporal chunks sharded over the
    mesh "data" axis must produce BIT-IDENTICAL output to the sequential
    single-chip path (deterministic config: no posterior sampling, no
    added noise)."""
    from dove_tpu.parallel.mesh import make_mesh

    frames = np.random.default_rng(7).random((21, 8, 8, 3)).astype(np.float32)
    seq = _pipe(params, vae_tiling=True, output_uint8=True).process_frames(
        frames, chunk_len=9, overlap_t=4
    )
    mesh = make_mesh(data=4, model=1)
    par = _pipe(params, vae_tiling=True, output_uint8=True).process_frames(
        frames, chunk_len=9, overlap_t=4, mesh=mesh
    )
    assert par.dtype == np.uint8 and par.shape == seq.shape
    np.testing.assert_array_equal(par, seq)


def test_staged_mesh_chunk_parallel_imbalanced_tail(params):
    """Chunk count not divisible by the mesh: 33 frames at chunk_len 9 /
    overlap 4 plan 6 chunks over a data=4 mesh — the second round is a
    partial batch (padded chunks whose outputs are dropped). Still
    bit-identical to sequential."""
    from dove_tpu.parallel.mesh import make_mesh

    frames = np.random.default_rng(10).random((33, 8, 8, 3)).astype(np.float32)
    seq = _pipe(params, vae_tiling=True, output_uint8=True).process_frames(
        frames, chunk_len=9, overlap_t=4
    )
    par = _pipe(params, vae_tiling=True, output_uint8=True).process_frames(
        frames, chunk_len=9, overlap_t=4, mesh=make_mesh(data=4, model=1)
    )
    assert par.shape == seq.shape
    np.testing.assert_array_equal(par, seq)


def test_staged_mesh_chunk_parallel_float_metrics_path(params):
    """--data_parallel composes with --eval_metrics: the float path rides
    the mesh's uint8 trim-assembly and converts host-side — bit-equal to
    the sequential float path (both round-trip the decode's uint8)."""
    from dove_tpu.parallel.mesh import make_mesh

    frames = np.random.default_rng(9).random((21, 8, 8, 3)).astype(np.float32)
    seq = _pipe(params, vae_tiling=True).process_frames(
        frames, chunk_len=9, overlap_t=4
    )
    par = _pipe(params, vae_tiling=True).process_frames(
        frames, chunk_len=9, overlap_t=4, mesh=make_mesh(data=2, model=1)
    )
    assert seq.dtype == par.dtype == np.float32
    np.testing.assert_array_equal(par, seq)


def test_staged_mesh_chunk_parallel_i420(params):
    from dove_tpu.parallel.mesh import make_mesh

    frames = np.random.default_rng(8).random((21, 8, 8, 3)).astype(np.float32)
    mesh = make_mesh(data=2, model=1)
    seq = _pipe(
        params, vae_tiling=True, output_uint8=True, output_i420=True
    ).process_frames(frames, chunk_len=9, overlap_t=4)
    par = _pipe(
        params, vae_tiling=True, output_uint8=True, output_i420=True
    ).process_frames(frames, chunk_len=9, overlap_t=4, mesh=mesh)
    np.testing.assert_array_equal(par, seq)


def test_plan_stream_segments():
    from dove_tpu.pipeline import plan_stream_segments

    assert plan_stream_segments(101) == [(0, 33), (33, 65), (65, 97), (97, 101)]
    assert plan_stream_segments(33) == [(0, 33)]
    assert plan_stream_segments(37) == [(0, 33), (33, 37)]
    assert plan_stream_segments(13) == [(0, 13)]
    # exact cover, contiguous, steady segments divisible by the 4x ratio
    for f in (33, 37, 65, 97, 101, 129):
        segs = plan_stream_segments(f)
        assert segs[0][0] == 0 and segs[-1][1] == f
        assert all(a[1] == b[0] for a, b in zip(segs, segs[1:]))
        assert all((e - s) % 4 == 0 for s, e in segs[1:])


def test_plan_dit_windows():
    from dove_tpu.pipeline import plan_dit_windows

    # short stream: single window
    assert plan_dit_windows(9, 10, 2) == [(0, 9, 0, 9)]
    for n_lat, w, ov in [(26, 10, 2), (25, 10, 2), (11, 10, 2), (40, 10, 2),
                         (17, 10, 4), (26, 10, 0)]:
        plan = plan_dit_windows(n_lat, w, ov)
        # all windows share one compiled shape
        assert all(we - ws == w for ws, we, _, _ in plan)
        # keep regions tile the stream exactly once, in order
        covered = []
        for ws, we, klo, khi in plan:
            assert 0 <= klo < khi <= w
            covered.extend(range(ws + klo, ws + khi))
        assert covered == list(range(n_lat))


@pytest.mark.slow
def test_streaming_long_clip(params):
    """Streaming path: correct geometry, deterministic, engages only for
    clips longer than one DiT pass."""
    frames = np.random.default_rng(3).random((45, 16, 16, 3)).astype(np.float32)
    p = _pipe(params, vae_tiling=True, output_uint8=True, streaming=True)
    out = p.process_frames(frames)
    assert out.shape == (45, 64, 64, 3) and out.dtype == np.uint8
    assert set(p.stage_times) == {"enc", "dit", "dec"}
    out2 = _pipe(
        params, vae_tiling=True, output_uint8=True, streaming=True
    ).process_frames(frames)
    np.testing.assert_array_equal(out, out2)


@pytest.mark.slow
def test_streaming_single_window_matches_legacy_single_chunk(params):
    """A clip whose latent stream fits one DiT window runs the same math as
    the legacy single-chunk staged path (same encode boundaries, same DiT
    input, same decode) — only the program partitioning differs."""
    frames = np.random.default_rng(4).random((33, 16, 16, 3)).astype(np.float32)
    lq = frames * 2.0 - 1.0
    p_s = _pipe(params, vae_tiling=True, output_uint8=True, streaming=True)
    # match tiny cfg's latent_frames_batch_size so the legacy and streaming
    # decode sub-batch spans (GroupNorm statistics windows) coincide
    p_s.stream_decode_latents = 2
    out_s = p_s._sr_clip_streamed(lq, jax.random.PRNGKey(0))
    p_l = _pipe(params, vae_tiling=True, output_uint8=True)
    out_l = p_l._sr_clip_staged(lq, jax.random.PRNGKey(0))
    assert out_s.shape == out_l.shape
    # identical math, different jit partitioning: allow 1 quantization step
    diff = np.abs(out_s.astype(np.int32) - out_l.astype(np.int32))
    assert diff.max() <= 1, diff.max()


def test_streaming_i420_geometry(params):
    frames = np.random.default_rng(5).random((41, 16, 16, 3)).astype(np.float32)
    p = _pipe(
        params, vae_tiling=True, output_uint8=True, output_i420=True,
        streaming=True,
    )
    out = p.process_frames(frames)
    assert out.shape == (41, 96, 64) and out.dtype == np.uint8


def test_streaming_float_path_for_metrics(params):
    """output_uint8=False (inline metrics) returns float RGB in [0, 1]."""
    frames = np.random.default_rng(6).random((37, 16, 16, 3)).astype(np.float32)
    p = _pipe(params, vae_tiling=True, streaming=True)
    out = p.process_frames(frames)
    assert out.shape == (37, 64, 64, 3) and out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_dec_window_cap(params):
    """dec_window_cap shrinks the staged decode windows (HBM headroom knob);
    output geometry is unchanged and the result stays within feathered-
    window tolerance of the uncapped plan."""
    frames = np.random.default_rng(9).random((9, 24, 40, 3)).astype(np.float32)
    p = _pipe(params, vae_tiling=True)
    p_cap = _pipe(params, vae_tiling=True, dec_window_cap=(4, 4))
    assert p_cap._window_budget()[2] == (4, 4)
    assert p_cap._window_budget()[:2] == p._window_budget()[:2]
    out = p.process_frames(frames)
    # a cap at/above the default budget changes nothing -> bit-identical
    out_loose = _pipe(
        params, vae_tiling=True, dec_window_cap=(1000, 1000)
    ).process_frames(frames)
    np.testing.assert_array_equal(out_loose, out)
    # a binding cap changes the window partition (per-window GroupNorm
    # statistics and feather seams shift — the same way the int8 serving
    # budget differs from the bf16 one); geometry and determinism hold
    out_cap = p_cap.process_frames(frames)
    assert out_cap.shape == out.shape and out_cap.dtype == out.dtype
    out_cap2 = _pipe(
        params, vae_tiling=True, dec_window_cap=(4, 4)
    ).process_frames(frames)
    np.testing.assert_array_equal(out_cap, out_cap2)
    # caps at/below the 2-latent feather band would make the window
    # planner divide by zero — rejected at construction
    with pytest.raises(ValueError, match="dec_window_cap"):
        _pipe(params, vae_tiling=True, dec_window_cap=(2, 4))


def test_streaming_slow_link_fenced_dispatch(params, monkeypatch):
    """The relay-link branch (per-window fenced DiT dispatch) is bit-identical
    to the fast-link branch (dispatch-ahead): same compiled programs, same
    inputs — only the host-side scheduling differs (pipeline.py
    _sr_clip_streamed's two DiT loops)."""
    frames = np.random.default_rng(7).random((45, 16, 16, 3)).astype(np.float32)
    monkeypatch.setattr(DovePipeline, "_fast_link", True)
    out_fast = _pipe(
        params, vae_tiling=True, output_uint8=True, streaming=True
    ).process_frames(frames)
    monkeypatch.setattr(DovePipeline, "_fast_link", False)
    out_slow = _pipe(
        params, vae_tiling=True, output_uint8=True, streaming=True
    ).process_frames(frames)
    np.testing.assert_array_equal(out_fast, out_slow)


def test_streaming_overlap_t_maps_to_latent_overlap(params, monkeypatch):
    """process_frames(overlap_t=N) reaches the streaming DiT window planner
    as N/4 latent frames (the temporal compression ratio), like the legacy
    auto-chunk path's pixel-space overlap."""
    import dove_tpu.pipeline as pl

    seen = []
    orig = pl.plan_dit_windows
    monkeypatch.setattr(
        pl, "plan_dit_windows",
        lambda n, w, o: (seen.append(o), orig(n, w, o))[1],
    )
    frames = np.random.default_rng(8).random((45, 16, 16, 3)).astype(np.float32)
    p = _pipe(params, vae_tiling=True, output_uint8=True, streaming=True)
    out = p.process_frames(frames, overlap_t=16)
    assert out.shape == (45, 64, 64, 3)
    assert seen == [4]
    # with no explicit overlap_t the pipeline's configured latent overlap
    # governs (an earlier version silently overrode the field with the
    # overlap_t default)
    seen.clear()
    p2 = _pipe(
        params, vae_tiling=True, output_uint8=True, streaming=True,
        dit_overlap_latents=3,
    )
    p2.process_frames(frames)
    assert seen == [3]


def test_streaming_auto_gate():
    """streaming='auto' engages only for the int8 serving mode."""
    cfg = tiny_test()
    p = DovePipeline(
        config=cfg,
        dit_params={}, vae_params={},  # gate check only — no compute
        prompt_embedding=jnp.zeros((1, 1)),
        vae_tiling=True, output_uint8=True, donate_weights=False,
    )
    assert not p._stream_enabled(None)  # bf16 default: legacy chunking
    p.quantize = "int8"
    assert p._stream_enabled(None)
    import os

    os.environ["DOVE_STREAMING"] = "0"
    try:
        assert not p._stream_enabled(None)
    finally:
        del os.environ["DOVE_STREAMING"]
