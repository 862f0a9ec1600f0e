"""Geometry parity (golden lists from the reference) + exact-coverage property tests."""

import numpy as np
import pytest

from dove_tpu.tiling import (
    Stitcher,
    compute_padding,
    pad_video,
    plan_tiles,
    spatial_tiles,
    temporal_chunks,
    tile_geometries,
    unpad_video,
    valid_region,
)

# Golden outputs captured by running the reference's make_temporal_chunks /
# make_spatial_tiles (inference_script.py:249-329) on these inputs.
GOLDEN_CHUNKS = {
    (33, 16, 8): [(0, 16), (8, 24), (16, 33)],
    (100, 30, 8): [(0, 30), (22, 52), (44, 74), (66, 100)],
    (41, 0, 0): [(0, 41)],
    (17, 16, 8): [(0, 17)],
    (9, 8, 4): [(0, 9)],
}

GOLDEN_TILES = {
    (720, 1280, (384, 384), (32, 32)): [
        (0, 720, 0, 384),
        (0, 720, 352, 736),
        (0, 720, 704, 1280),
    ],
    (192, 320, (0, 0), (32, 32)): [(0, 192, 0, 320)],
    (720, 1280, (768, 768), (64, 64)): [(0, 720, 0, 1280)],
    (256, 384, (128, 192), (32, 64)): [
        (0, 128, 0, 192),
        (0, 128, 128, 384),
        (96, 256, 0, 192),
        (96, 256, 128, 384),
    ],
    (288, 512, (256, 256), (32, 32)): [(0, 288, 0, 256), (0, 288, 224, 512)],
}


@pytest.mark.parametrize("case,expected", GOLDEN_CHUNKS.items())
def test_temporal_chunks_golden(case, expected):
    F, chunk_len, overlap = case
    assert temporal_chunks(F, chunk_len, overlap) == expected


def test_temporal_chunks_rejects_zero_stride():
    with pytest.raises(ValueError):
        temporal_chunks(33, 8, 8)


@pytest.mark.parametrize("case,expected", GOLDEN_TILES.items())
def test_spatial_tiles_golden(case, expected):
    H, W, tile, overlap = case
    assert spatial_tiles(H, W, tile, overlap) == expected


@pytest.mark.parametrize(
    "F,H,W,chunk_len,tile,ot,ohw",
    [
        (33, 192, 320, 16, (128, 128), 8, (32, 32)),
        (33, 720, 1280, 16, (384, 384), 8, (32, 32)),
        (97, 288, 512, 24, (160, 224), 8, (32, 32)),
        (9, 96, 96, 0, (0, 0), 8, (32, 32)),
        (41, 144, 176, 16, (96, 112), 8, (16, 16)),
        # edge cases from review: clip no longer than the temporal overlap
        (7, 96, 96, 16, (0, 0), 8, (32, 32)),
        # axis shorter than the tile / than the overlap
        (9, 32, 200, 0, (128, 128), 8, (32, 32)),
        # odd overlaps (ceil/floor trim split must sum exactly)
        (33, 192, 320, 16, (128, 128), 7, (31, 31)),
    ],
)
def test_exact_coverage(F, H, W, chunk_len, tile, ot, ohw):
    """Every output pixel is written exactly once (write_count == 1 invariant)."""
    tiles = plan_tiles(F, H, W, chunk_len, tile, ot, ohw)
    effective_ot = ot if chunk_len > 0 else 0
    stitcher = Stitcher(3, F, H, W, effective_ot, ohw)
    # Use a "video" whose value encodes its coordinates; stitched output must
    # equal it identically (tiles pass through untouched).
    video = np.arange(3 * F * H * W, dtype=np.float32).reshape(3, F, H, W)
    for t in tiles:
        data = video[:, t.t_start : t.t_end, t.h_start : t.h_end, t.w_start : t.w_end]
        stitcher.add(t, data)
    out = stitcher.finalize()
    np.testing.assert_array_equal(out, video)


def test_geometry_count_is_small():
    """Static-shape requirement: a realistic plan uses few distinct tile shapes."""
    tiles = plan_tiles(33, 720, 1280, 16, (384, 384), 8, (32, 32))
    geoms = tile_geometries(tiles)
    assert len(geoms) <= 4


def test_padding_rules():
    assert compute_padding(33, 720, 1280) == (0, 0, 0)
    assert compute_padding(30, 180, 320) == (3, 12, 0)
    assert compute_padding(1, 16, 16) == (0, 0, 0)
    f, (pf, ph, pw) = pad_video(np.zeros((30, 180, 320, 3), dtype=np.float32))
    assert f.shape == (33, 192, 320, 3)
    # repeat-last-frame and zero-pad semantics
    assert (pf, ph, pw) == (3, 12, 0)


def test_pad_unpad_roundtrip():
    rng = np.random.default_rng(1)
    frames = rng.random((30, 180, 316, 3)).astype(np.float32)
    padded, (pf, ph, pw) = pad_video(frames)
    # emulate x4 SR output: [C, F, 4H, 4W]
    up = np.repeat(np.repeat(padded.transpose(3, 0, 1, 2), 4, axis=2), 4, axis=3)
    cropped = unpad_video(up, pf, ph * 4, pw * 4)
    assert cropped.shape == (3, 30, 180 * 4, 316 * 4)


def test_valid_region_interior_tile():
    tiles = plan_tiles(33, 192, 320, 16, (128, 128), 8, (32, 32))
    full = (33, 192, 320)
    interior = [
        t
        for t in tiles
        if t.t_start > 0 and t.h_start > 0 and t.w_start > 0
        and t.t_end < 33 and t.h_end < 192 and t.w_end < 320
    ]
    if interior:
        r = valid_region(interior[0], full, 8, (32, 32))
        assert r.src[0].start == 4 and r.src[1].start == 16 and r.src[2].start == 16
