"""ctypes bindings for the native host runtime (dove_host.cc).

Build once with ``python -m dove_tpu.native.build`` (plain g++, no external
deps). Every entry point has a NumPy fallback, so the framework runs without
the shared object — the native path is a host-throughput optimization for
the per-clip work that brackets each TPU dispatch.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).parent / "libdove_host.so"
_lib: ctypes.CDLL | None = None


def _load() -> ctypes.CDLL | None:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() or os.environ.get("DOVE_NO_NATIVE"):
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    i64, f32p, u8p = (
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
    )
    lib.dove_upscale_bilinear_f32.argtypes = [
        f32p, f32p, i64, i64, i64, i64, ctypes.c_int, ctypes.c_int, ctypes.c_int
    ]
    lib.dove_upscale_bilinear_f32.restype = None
    lib.dove_stitch_add_f32.argtypes = [f32p, u8p, f32p] + [i64] * 16
    lib.dove_stitch_add_f32.restype = ctypes.c_int
    lib.dove_stitch_check.argtypes = [u8p, i64]
    lib.dove_stitch_check.restype = ctypes.c_int
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def upscale_bilinear(
    frames: np.ndarray, scale: int, normalize: bool = False, n_threads: int = 0
) -> np.ndarray:
    """[F, H, W, C] float32 -> [F, H*s, W*s, C]; optionally maps to [-1,1]."""
    lib = _load()
    frames = np.ascontiguousarray(frames, np.float32)
    F, H, W, C = frames.shape
    if lib is None:
        import cv2

        out = np.empty((F, H * scale, W * scale, C), np.float32)
        for i in range(F):
            out[i] = cv2.resize(
                frames[i], (W * scale, H * scale), interpolation=cv2.INTER_LINEAR
            )
        return out * 2.0 - 1.0 if normalize else out
    out = np.empty((F, H * scale, W * scale, C), np.float32)
    lib.dove_upscale_bilinear_f32(
        _fptr(frames), _fptr(out), F, H, W, C, scale, int(normalize), n_threads
    )
    return out


class NativeStitcher:
    """Drop-in replacement for tiling.Stitcher backed by the C++ library.

    add() takes the device-layout tile [f, h, w, C] directly (no transpose
    on the Python side); output layout stays [C, F, H, W].
    """

    def __init__(self, channels, num_frames, height, width, overlap_t, overlap_hw):
        from dove_tpu import tiling

        self._tiling = tiling
        self._full = (num_frames, height, width)
        self._overlap_t = overlap_t
        self._overlap_hw = overlap_hw
        self.output = np.zeros((channels, num_frames, height, width), np.float32)
        self._count = np.zeros((num_frames, height, width), np.uint8)
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native library not built; use tiling.Stitcher")

    def add(self, tile, data_fhwc: np.ndarray) -> None:
        if data_fhwc.shape[:3] != tile.shape:
            raise ValueError(
                f"tile data shape {data_fhwc.shape[:3]} != tile {tile.shape}"
            )
        r = self._tiling.valid_region(
            tile, self._full, self._overlap_t, self._overlap_hw
        )
        data_fhwc = np.ascontiguousarray(data_fhwc, np.float32)
        C = self.output.shape[0]
        F, H, W = self._full
        tf, th, tw = data_fhwc.shape[:3]
        (sf, sh, sw), (df, dh, dw) = r.src, r.dst
        rc = self._lib.dove_stitch_add_f32(
            _fptr(self.output), _u8ptr(self._count), _fptr(data_fhwc),
            C, F, H, W, tf, th, tw,
            sf.start, sf.stop, sh.start, sh.stop, sw.start, sw.stop,
            df.start, dh.start, dw.start,
        )
        if rc != 0:
            raise ValueError(f"native stitch_add failed with code {rc}")

    def finalize(self) -> np.ndarray:
        rc = self._lib.dove_stitch_check(_u8ptr(self._count), self._count.size)
        if rc == 1:
            raise RuntimeError("tile stitching left uncovered pixels")
        if rc == 2:
            raise RuntimeError("tile stitching wrote some pixels more than once")
        return self.output
