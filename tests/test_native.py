"""Native host runtime (C++/ctypes) vs the NumPy/OpenCV reference paths."""

import numpy as np
import pytest

from dove_tpu import native, tiling
from dove_tpu.io import video as video_io

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libdove_host.so not built"
)


def test_native_upscale_matches_cv2():
    rng = np.random.default_rng(0)
    frames = rng.random((3, 17, 23, 3), np.float32)
    ours = native.upscale_bilinear(frames, 4)
    ref = video_io.bilinear_upscale(frames, 4)
    np.testing.assert_allclose(ours, ref, atol=2e-5)

    normed = native.upscale_bilinear(frames, 4, normalize=True)
    np.testing.assert_allclose(normed, ours * 2 - 1, atol=1e-6)


def test_native_stitcher_matches_python():
    rng = np.random.default_rng(1)
    F, H, W = 9, 64, 96
    tiles = tiling.plan_tiles(F, H, W, chunk_len=0, tile_size_hw=(48, 48),
                              overlap_hw=(16, 16))
    py = tiling.Stitcher(3, F, H, W, 0, (16, 16))
    nat = native.NativeStitcher(3, F, H, W, 0, (16, 16))
    for t in tiles:
        data = rng.random((t.shape[0], t.shape[1], t.shape[2], 3), np.float32)
        py.add(t, data.transpose(3, 0, 1, 2))
        nat.add(t, data)
    np.testing.assert_allclose(nat.finalize(), py.finalize(), atol=0)


def test_native_stitcher_detects_uncovered():
    nat = native.NativeStitcher(3, 2, 16, 16, 0, (0, 0))
    t = tiling.Tile(0, 2, 0, 8, 0, 16)  # top half only
    nat.add(t, np.zeros((2, 8, 16, 3), np.float32))
    with pytest.raises(RuntimeError, match="uncovered"):
        nat.finalize()
