"""Real-ESRGAN-style video degradation pipeline (LQ synthesis for training).

Capability map of the reference's finetune/datasets/degradation.py
(SURVEY.md §2.4): per-clip randomized blur / resize / noise / JPEG / video
compression, with per-frame parameter drift ("*_step" params) for temporal
realism, plus order-shuffled degradation groups. Config schema matches the
reference's degradation YAML files so published recipes run unchanged.

Host-side NumPy/OpenCV. Frames flow through as float32 RGB in [0, 1],
shape [F, H, W, 3].

Video compression: uses PyAV (in-memory mp4 round-trip, identical to the
reference) when importable; otherwise falls back to an OpenCV temp-file
round-trip whose bitrate knob maps onto codec quality — documented
environmental deviation, same artifact family.
"""

from __future__ import annotations

import logging
import os
import tempfile
from typing import Any, Sequence

import cv2
import numpy as np

from dove_tpu.data import blur_kernels as bk

logger = logging.getLogger(__name__)

_RESIZE_MODES = {
    "bilinear": cv2.INTER_LINEAR,
    "area": cv2.INTER_AREA,
    "bicubic": cv2.INTER_CUBIC,
    "lanczos": cv2.INTER_LANCZOS4,
}


def _drift(rng, value, step, lo, hi):
    if not step:
        return value
    return float(np.clip(value + rng.uniform(-step, step), lo, hi))


class RandomBlur:
    """Per-frame blur with a (possibly drifting) random kernel."""

    def __init__(self, params: dict[str, Any]):
        self.p = params

    def __call__(self, frames: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        p = self.p
        if rng.uniform() > p.get("prob", 1.0):
            return frames
        size = int(rng.choice(p["kernel_size"]))
        ktype = rng.choice(
            p["kernel_list"], p=np.asarray(p["kernel_prob"]) / np.sum(p["kernel_prob"])
        )
        sx = rng.uniform(*p.get("sigma_x", (0.2, 3.0)))
        sy = rng.uniform(*p.get("sigma_y", (0.2, 3.0)))
        th = rng.uniform(*p.get("rotate_angle", (-np.pi, np.pi)))
        bg = rng.uniform(*p.get("beta_gaussian", (0.5, 4.0)))
        bp = rng.uniform(*p.get("beta_plateau", (1.0, 2.0)))
        om = rng.uniform(*p.get("omega", (np.pi / 3, np.pi)))

        steps = {k: p.get(f"{k}_step", 0) for k in
                 ("sigma_x", "sigma_y", "rotate_angle", "beta_gaussian",
                  "beta_plateau", "omega")}
        drifting = any(steps.values())

        def make_kernel():
            if ktype == "iso":
                return bk.bivariate_gaussian(size, sx, isotropic=True)
            if ktype == "aniso":
                return bk.bivariate_gaussian(size, sx, sy, th, isotropic=False)
            if ktype == "generalized_iso":
                return bk.bivariate_generalized_gaussian(size, sx, None, 0.0, bg, True)
            if ktype == "generalized_aniso":
                return bk.bivariate_generalized_gaussian(size, sx, sy, th, bg, False)
            if ktype == "plateau_iso":
                return bk.bivariate_plateau(size, sx, None, 0.0, bp, True)
            if ktype == "plateau_aniso":
                return bk.bivariate_plateau(size, sx, sy, th, bp, False)
            if ktype == "sinc":
                return bk.circular_lowpass_kernel(om, size)
            raise ValueError(ktype)

        out = np.empty_like(frames)
        kernel = make_kernel()
        for i, frame in enumerate(frames):
            if drifting and i > 0:
                sx = _drift(rng, sx, steps["sigma_x"], *p.get("sigma_x", (0.2, 3.0)))
                sy = _drift(rng, sy, steps["sigma_y"], *p.get("sigma_y", (0.2, 3.0)))
                th = _drift(rng, th, steps["rotate_angle"], -np.pi, np.pi)
                bg = _drift(rng, bg, steps["beta_gaussian"], *p.get("beta_gaussian", (0.5, 4.0)))
                bp = _drift(rng, bp, steps["beta_plateau"], *p.get("beta_plateau", (1.0, 2.0)))
                om = _drift(rng, om, steps["omega"], *p.get("omega", (np.pi / 3, np.pi)))
                kernel = make_kernel()
            out[i] = cv2.filter2D(frame, -1, kernel.astype(np.float32))
        return out


class RandomResize:
    """Random up/down/keep rescale, or resize to a fixed target_size."""

    def __init__(self, params: dict[str, Any]):
        self.p = dict(params)
        self._cfg_target = self.p.get("target_size")
        # the per-crop override is THREAD-LOCAL: degradation ops are shared
        # across PrefetchLoader workers, and set-then-call happens within
        # one worker's __getitem__ — a plain attribute races between items
        import threading

        self._tl = threading.local()

    @property
    def target_size(self) -> tuple[int, int] | None:
        return getattr(self._tl, "target_size", self._cfg_target)

    def set_target_size(self, hw: tuple[int, int]) -> None:
        """Datasets set the x(1/scale) LQ size dynamically per crop
        (thread-local: only this worker's next call sees it)."""
        self._tl.target_size = hw

    def __call__(self, frames: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        p = self.p
        interp = _RESIZE_MODES[
            rng.choice(p["resize_opt"],
                       p=np.asarray(p["resize_prob"]) / np.sum(p["resize_prob"]))
        ]
        F, H, W, _ = frames.shape
        if self.target_size is not None:
            th, tw = self.target_size
        else:
            mode = rng.choice(3, p=np.asarray(p["resize_mode_prob"]) /
                              np.sum(p["resize_mode_prob"]))
            lo, hi = p["resize_scale"]
            if mode == 0:  # up
                scale = rng.uniform(max(1.0, lo), max(1.0, hi))
            elif mode == 1:  # down
                scale = rng.uniform(min(1.0, lo), min(1.0, hi))
            else:
                scale = 1.0
            th, tw = int(round(H * scale)), int(round(W * scale))
            if p.get("is_size_even"):
                th, tw = max(2, th - th % 2), max(2, tw - tw % 2)
        if (th, tw) == (H, W):
            return frames
        return np.stack(
            [cv2.resize(f, (tw, th), interpolation=interp) for f in frames]
        )


class RandomNoise:
    """Gaussian or Poisson noise, optionally grayscale (channel-shared)."""

    def __init__(self, params: dict[str, Any]):
        self.p = params

    def __call__(self, frames: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        p = self.p
        ntype = rng.choice(p["noise_type"],
                           p=np.asarray(p["noise_prob"]) / np.sum(p["noise_prob"]))
        out = np.empty_like(frames)
        if ntype == "gaussian":
            sigma = rng.uniform(*p["gaussian_sigma"]) / 255.0
            step = p.get("gaussian_sigma_step", 0) / 255.0
            gray = rng.uniform() < p.get("gaussian_gray_noise_prob", 0.0)
            for i, f in enumerate(frames):
                if i > 0 and step:
                    sigma = _drift(rng, sigma, step,
                                   p["gaussian_sigma"][0] / 255.0,
                                   p["gaussian_sigma"][1] / 255.0)
                shape = f.shape[:2] + ((1,) if gray else (3,))
                out[i] = f + rng.normal(0.0, sigma, shape).astype(np.float32)
        else:  # poisson
            scale = rng.uniform(*p["poisson_scale"])
            step = p.get("poisson_scale_step", 0)
            gray = rng.uniform() < p.get("poisson_gray_noise_prob", 0.0)
            for i, f in enumerate(frames):
                if i > 0 and step:
                    scale = _drift(rng, scale, step, *p["poisson_scale"])
                img = cv2.cvtColor(f, cv2.COLOR_RGB2GRAY)[..., None] if gray else f
                # Reference formula (degradation.py:286-292): work at 0-255
                # scale with rate = round(img255) * 2**ceil(log2(n_unique)).
                # Both the base-2 quantization AND the 255-scale rate matter:
                # a [0,1]-scale rate (BasicSR convention) yields ~16x stronger
                # noise than what the published DOVE recipe trained on.
                base = np.clip(np.round(img * 255.0), 0, 255)
                vals = 2 ** np.ceil(np.log2(len(np.unique(base))))
                noisy = rng.poisson(base * vals) / vals
                noise = (noisy - base).astype(np.float32) * scale / 255.0
                out[i] = f + noise
        return np.clip(out, 0.0, 1.0)


class RandomJPEGCompression:
    """Per-frame JPEG encode/decode round trip with quality drift."""

    def __init__(self, params: dict[str, Any]):
        self.p = params

    def __call__(self, frames: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        lo, hi = self.p["quality"]
        q = rng.uniform(lo, hi)
        step = self.p.get("quality_step", 0)
        out = np.empty_like(frames)
        for i, f in enumerate(frames):
            if i > 0 and step:
                q = _drift(rng, q, step, lo, hi)
            u8 = np.clip(f * 255.0, 0, 255).astype(np.uint8)
            ok, buf = cv2.imencode(
                ".jpg", cv2.cvtColor(u8, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, int(round(q))],
            )
            dec = cv2.imdecode(buf, cv2.IMREAD_COLOR)
            out[i] = cv2.cvtColor(dec, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        return out


def _have_av() -> bool:
    try:
        import av  # noqa: F401

        return True
    except ImportError:
        return False


_BACKEND_WARNED = False


def compression_backend() -> str:
    """Which backend RandomVideoCompression will actually use here.

    The reference synthesizes MPEG training artifacts through an in-memory
    PyAV round trip over a {libx264, h264, mpeg4} x bitrate ladder
    (/root/reference/finetune/datasets/degradation.py:478-558). Those
    artifacts are load-bearing for real-world VSR quality, so the active
    backend is recorded in training logs (Trainer.fit) and the gap is
    quantified by scripts/degradation_backend_report.py
    (docs/reports/DEGRADATION_BACKEND.json).
    """
    return "pyav" if _have_av() else "cv2-mp4v+rate-mjpeg-fallback"


def _warn_fallback_once() -> None:
    global _BACKEND_WARNED
    if _BACKEND_WARNED:
        return
    _BACKEND_WARNED = True
    logger.warning(
        "PyAV is not importable: RandomVideoCompression is using the cv2 "
        "FALLBACK pair — sampled codec mpeg4 round-trips through cv2's "
        "real MPEG-4 Part 2 encoder (exact codec family, but this build "
        "has NO rate control: single operating point), while libx264/h264 "
        "samples round-trip through a bitrate-TARGETED MJPEG (binary-"
        "searched JPEG quality; honors the ladder's rate axis but is "
        "intra-only, so inter-frame artifacts are absent). Training data "
        "synthesized here records video_compression_backend="
        "cv2-mp4v+rate-mjpeg-fallback in train_log.jsonl; see "
        "docs/reports/DEGRADATION_BACKEND.json for the measured gap."
    )


class RandomVideoCompression:
    """Video codec round trip (temporal compression artifacts)."""

    def __init__(self, params: dict[str, Any]):
        self.p = params

    def __call__(self, frames: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        p = self.p
        codec = rng.choice(p["codec"],
                           p=np.asarray(p["codec_prob"]) / np.sum(p["codec_prob"]))
        bitrate = int(rng.uniform(*p["bitrate"]))
        if _have_av():
            return self._av_roundtrip(frames, str(codec), bitrate)
        _warn_fallback_once()
        # Fallback policy (closest-to-reference available in a PyAV-less
        # env, VERDICT r4 item 7): a sampled mpeg4 keeps the exact codec
        # family (cv2's real MPEG-4 Part 2 encoder — but this build has no
        # rate control, so it is one operating point); sampled libx264/h264
        # map onto the bitrate-TARGETED MJPEG round trip, which honors the
        # ladder's rate axis (the severity knob the recipe actually sweeps)
        # at the cost of intra-only artifacts.
        if str(codec) == "mpeg4":
            return self._cv2_roundtrip(frames, bitrate)
        return self._mjpeg_roundtrip(frames, bitrate)

    def _mjpeg_roundtrip(self, frames, bitrate, fps: float = 25.0,
                         return_bytes: bool = False):
        """Bitrate-targeted intra-only (MJPEG) round trip.

        Binary-searches one JPEG quality for the whole clip so the total
        encoded size hits the sampled bitrate — real DCT rate control with
        the same 8x8-block artifact scaling as the reference ladder's low-
        bitrate regime. q is clip-global (not per-frame greedy) to mimic a
        constant-QP encode; decode is per frame."""
        F = frames.shape[0]
        target_bytes = max(int(bitrate / 8.0 * (F / fps)), F * 64)
        u8 = np.clip(frames * 255.0, 0, 255).astype(np.uint8)
        bgr = [cv2.cvtColor(f, cv2.COLOR_RGB2BGR) for f in u8]

        def encode_all(q: int) -> list[np.ndarray]:
            return [
                cv2.imencode(".jpg", f, [cv2.IMWRITE_JPEG_QUALITY, q])[1]
                for f in bgr
            ]

        lo, hi = 2, 95
        best = encode_all(lo)  # even q=2 may exceed tiny targets: keep it
        while lo < hi:
            mid = (lo + hi + 1) // 2
            bufs = encode_all(mid)
            if sum(b.nbytes for b in bufs) <= target_bytes:
                best, lo = bufs, mid
            else:
                hi = mid - 1
        out = np.empty_like(frames)
        for i, buf in enumerate(best):
            dec = cv2.imdecode(buf, cv2.IMREAD_COLOR)
            out[i] = cv2.cvtColor(dec, cv2.COLOR_BGR2RGB).astype(
                np.float32) / 255.0
        if return_bytes:
            return out, sum(b.nbytes for b in best)
        return out

    def _av_roundtrip(self, frames, codec, bitrate):
        import io

        import av

        F, H, W, _ = frames.shape
        pad_h, pad_w = H % 2, W % 2
        buf = io.BytesIO()
        with av.open(buf, mode="w", format="mp4") as container:
            stream = container.add_stream(codec, rate=25)
            stream.height = H + pad_h
            stream.width = W + pad_w
            stream.pix_fmt = "yuv420p"
            stream.bit_rate = bitrate
            for f in frames:
                u8 = np.clip(f * 255, 0, 255).astype(np.uint8)
                if pad_h or pad_w:
                    u8 = np.pad(u8, ((0, pad_h), (0, pad_w), (0, 0)), mode="edge")
                frame = av.VideoFrame.from_ndarray(u8, format="rgb24")
                for pkt in stream.encode(frame):
                    container.mux(pkt)
            for pkt in stream.encode(None):
                container.mux(pkt)
        buf.seek(0)
        out = []
        with av.open(buf, mode="r") as container:
            for frame in container.decode(video=0):
                arr = frame.to_ndarray(format="rgb24")
                out.append(arr[: H, : W].astype(np.float32) / 255.0)
        if not out:
            logger.warning(
                "av %s round-trip decoded 0 frames; passing frames through",
                codec,
            )
            return frames
        if len(out) < F:  # decoder returned short; repeat last (see cv2 path)
            out.extend([out[-1]] * (F - len(out)))
        return np.stack(out[:F])

    def _cv2_roundtrip(self, frames, bitrate):
        F, H, W, _ = frames.shape
        pad_h, pad_w = H % 2, W % 2
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "clip.mp4")
            writer = cv2.VideoWriter(
                path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (W + pad_w, H + pad_h)
            )
            # Map bitrate [1e4, 1e5] onto the quality knob when supported.
            q = np.interp(bitrate, [1e4, 1e5], [20.0, 90.0])
            try:
                writer.set(cv2.VIDEOWRITER_PROP_QUALITY, float(q))
            except Exception:
                pass
            for f in frames:
                u8 = np.clip(f * 255, 0, 255).astype(np.uint8)
                if pad_h or pad_w:
                    u8 = np.pad(u8, ((0, pad_h), (0, pad_w), (0, 0)), mode="edge")
                writer.write(cv2.cvtColor(u8, cv2.COLOR_RGB2BGR))
            writer.release()
            cap = cv2.VideoCapture(path)
            out = []
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                out.append(rgb[: H, : W].astype(np.float32) / 255.0)
            cap.release()
        if not out:
            # VideoWriter can silently write nothing (no mp4v encoder in
            # this OpenCV build) — degrade to a no-op rather than crash on
            # out[-1]; the op family stays usable minus this one effect
            logger.warning(
                "video-compression round-trip decoded 0 frames (no usable "
                "codec in this OpenCV build); passing frames through"
            )
            return frames
        if len(out) < F:  # codec dropped frames; repeat last
            out.extend([out[-1]] * (F - len(out)))
        return np.stack(out[:F])


_OP_TYPES = {
    "RandomBlur": RandomBlur,
    "RandomResize": RandomResize,
    "RandomNoise": RandomNoise,
    "RandomJPEGCompression": RandomJPEGCompression,
    "RandomVideoCompression": RandomVideoCompression,
}

_KEY_TO_TYPE = {
    "random_blur": RandomBlur,
    "random_resize": RandomResize,
    "random_noise": RandomNoise,
    "random_jpeg": RandomJPEGCompression,
    "random_mpeg": RandomVideoCompression,
}


def _build_op(spec: dict[str, Any]):
    return _OP_TYPES[spec["type"]](spec.get("params", {}))


class DegradationsWithShuffle:
    """Apply a list of degradations (or nested sub-lists) in shuffled order."""

    def __init__(self, degradations: Sequence[Any]):
        self.groups = []
        for item in degradations:
            if isinstance(item, list):
                self.groups.append([_build_op(s) for s in item])
            else:
                self.groups.append([_build_op(item)])

    def __call__(self, frames: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        order = rng.permutation(len(self.groups))
        for gi in order:
            for op in self.groups[gi]:
                frames = op(frames, rng)
        return frames

    def set_target_size(self, hw: tuple[int, int]) -> bool:
        """Point the shuffled-resize op at the per-crop LQ size (the datasets
        set this to crop/scale each item, reference behavior at
        /root/reference/finetune/datasets/real_sr_dataset.py:253-256)."""
        for group in self.groups:
            for op in group:
                if isinstance(op, RandomResize):
                    op.set_target_size(hw)
                    return True
        return False


class DegradationPipeline:
    """One degradation stage parsed from a reference-format YAML section."""

    def __init__(self, section: dict[str, Any]):
        self.keyed_ops: list[tuple[str, Any]] = []
        for key, spec in section.items():
            if key == "degradation_with_shuffle":
                self.keyed_ops.append(
                    (key, DegradationsWithShuffle(spec["degradations"]))
                )
            elif key in _KEY_TO_TYPE:
                self.keyed_ops.append((key, _KEY_TO_TYPE[key](spec.get("params", {}))))
            else:
                raise ValueError(f"unknown degradation op: {key}")

    @property
    def ops(self) -> list[Any]:
        return [op for _, op in self.keyed_ops]

    def find_resize(self):
        for op in self.ops:
            if isinstance(op, RandomResize):
                return op
        return None

    def set_shuffle_target_size(self, hw: tuple[int, int]) -> bool:
        """Set the dynamic LQ size on the resize inside the shuffle group."""
        for op in self.ops:
            if isinstance(op, DegradationsWithShuffle) and op.set_target_size(hw):
                return True
        return False

    def __call__(
        self,
        frames: np.ndarray,
        rng: np.random.Generator,
        skip: Sequence[str] = (),
        only: Sequence[str] | None = None,
    ) -> np.ndarray:
        """Run the stage. `skip`/`only` filter by op key (e.g. skip MPEG for
        the image branch of the stage-2 dataset)."""
        for key, op in self.keyed_ops:
            if key in skip:
                continue
            if only is not None and key not in only:
                continue
            frames = op(frames, rng)
        return frames


def load_degradation_config(path: str) -> dict[str, DegradationPipeline]:
    """Parse a reference-format degradation YAML into named stages."""
    import yaml

    raw = yaml.safe_load(open(path))
    return {name: DegradationPipeline(section) for name, section in raw.items()}
