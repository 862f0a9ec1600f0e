"""DOVE one-step video super-resolution pipeline — the product.

The whole per-tile computation — VAE encode, latent patch_size_t padding,
optional noise injection, one DiT pass at the fixed SR timestep, the
velocity->x0 one-step denoise, and VAE decode — is fused into a SINGLE jitted
function compiled once per tile geometry (reference flow:
/root/reference/inference_script.py:394-503; SURVEY.md §3.1). The host side
handles video decode, padding, x4 pre-upscale, the overlapping tile plan, and
exact-coverage stitching (dove_tpu/tiling.py).

Multi-chip serving shards the tile work-list over a data mesh axis
(dove_tpu/parallel) — tiles are independent, so no cross-chip communication
happens inside the model.
"""

from __future__ import annotations

import dataclasses
import logging
import sys
import time
from pathlib import Path
from typing import Any, Callable, ClassVar

import jax
import jax.numpy as jnp
import numpy as np

from dove_tpu import tiling
from dove_tpu.config import PipelineConfig
from dove_tpu.io import video as video_io
from dove_tpu.models import vae as vae_mod
from dove_tpu.models.dit import dit_forward
from dove_tpu.ops.scheduler import Schedule

logger = logging.getLogger(__name__)

# Streaming segmented staged path: fixed pixel-segment sizes so every clip
# length reuses the same compiled programs (the first segment carries the
# causally-special first frame; steady segments are a multiple of the 4x
# temporal ratio; a short tail compiles on demand, once per process).
STREAM_SEG0_PX = 33
STREAM_SEG_PX = 32


def plan_stream_segments(num_frames: int) -> list[tuple[int, int]]:
    """Contiguous (start, end) pixel-frame segments: [33] + [32]*k + tail.

    num_frames must satisfy the causal-VAE frame rule ((F-1) % 4 == 0), so
    every boundary after the first segment is a multiple of 4 — keeping the
    temporal pooling/upsampling windows aligned with whole-clip processing.
    """
    assert (num_frames - 1) % 4 == 0, num_frames
    bounds = [(0, min(STREAM_SEG0_PX, num_frames))]
    start = STREAM_SEG0_PX
    while start < num_frames:
        bounds.append((start, min(start + STREAM_SEG_PX, num_frames)))
        start += STREAM_SEG_PX
    return bounds


def plan_dit_windows(
    n_lat: int, window: int, overlap: int
) -> list[tuple[int, int, int, int]]:
    """Overlapping DiT windows over the latent stream -> (ws, we, klo, khi).

    Each window spans stream latents [ws, we); its kept (written) region is
    [klo, khi) in WINDOW-local coordinates. Interior boundaries sit at the
    midpoint of each overlap — the latent-space analog of the reference's
    overlap_t//2 pixel trim (/root/reference/inference_script.py:332-357).
    The last window is right-aligned so all windows share one compiled
    shape; every stream latent is written exactly once.
    """
    if n_lat <= window:
        return [(0, n_lat, 0, n_lat)]
    stride = max(window - overlap, 1)
    n = -(-(n_lat - window) // stride) + 1
    starts = [min(i * stride, n_lat - window) for i in range(n)]
    bounds = [0]
    for prev, s in zip(starts[:-1], starts[1:]):
        cover = prev + window - s  # actual overlap (>= overlap)
        bounds.append(s + (cover + 1) // 2)
    bounds.append(n_lat)
    return [
        (s, s + window, bounds[i] - s, bounds[i + 1] - s)
        for i, s in enumerate(starts)
    ]



def _trim_output(out, pad_f: int, pad_h: int, pad_w: int, upscale: int):
    """Strip the pad_video padding from a finished clip (uint8 RGB [F,H,W,3]
    or planar I420 [F,H*3/2,W]) — the shared tail of every staged return."""
    from dove_tpu.io import video as video_io

    if pad_f:
        out = out[:-pad_f]
    if (pad_h or pad_w) and video_io.is_i420(out):
        Hp2 = out.shape[1] * 2 // 3
        return tiling.i420_crop(
            out, Hp2 - pad_h * upscale, out.shape[2] - pad_w * upscale
        )
    if pad_h:
        out = out[:, : -pad_h * upscale]
    if pad_w:
        out = out[:, :, : -pad_w * upscale]
    return out


@dataclasses.dataclass
class DovePipeline:
    """One-step 4x VSR with temporal chunking + spatial tiling."""

    config: PipelineConfig
    dit_params: Any
    vae_params: Any
    prompt_embedding: jnp.ndarray  # [L_text, text_embed_dim] (empty prompt)
    dtype: Any = jnp.bfloat16
    attention_backend: str | None = None
    sample_posterior: bool = True  # reference samples latent_dist at inference
    donate_input: bool = True
    # The pipeline assumes OWNERSHIP of the weight trees by default: int8
    # quantization donates the bf16 kernels (required to fit quantize-in-
    # place on a 16 GB chip) and mesh replication frees the single-device
    # originals. Pass False to keep caller-held trees alive (e.g. building
    # bf16 + int8 pipelines from one tree for A/B parity on a big-HBM host).
    donate_weights: bool = True
    vae_tiling: bool = False  # --is_vae_st: internal VAE tiling, no outer tiles
    output_uint8: bool = False  # staged path: skip the uint8->f32 roundtrip
    # int8 serving modes: per-channel int8 weights + dynamic int8 activations
    # on the MXU (ops/quant.py). Besides the ~1.3-1.5x MXU rate, halving the
    # resident DiT (10.4 -> 5.2 GB on the 5B) buys ~2x-area VAE windows
    # (46x42 latents), cutting feather-overlap recompute to ~1.09x.
    #   "int8"     — DiT + VAE quantized (fastest, most drift)
    #   "int8-dit" — DiT only; VAE stays bf16 (keeps the big-window budget)
    #   "int8-vae" — VAE only; DiT stays bf16 (bf16 window budget: the
    #                10.4 GB resident DiT still caps decode temps)
    #   "int8w"    — WEIGHT-ONLY int8 DiT (W8A16): int8 storage halves the
    #                resident DiT (same window budget as int8-dit) but the
    #                matmuls dequantize into bf16 — activations exact, the
    #                only drift is per-channel weight rounding
    #   "int8-dit-dec" — int8 DiT + int8 VAE DECODER; the encoder stays
    #                bf16 (its drift feeds the DiT and dominates the full
    #                int8 mode's quality cost, while decoder error stays
    #                local) — the decode stage gets the big int8 window
    #                budget
    # The mixed modes are drift/speed frontier points (docs/reports/
    # QUANT_FRONTIER.md); the bf16 path remains the bit-parity reference.
    quantize: str | None = None
    # {name: per-input-channel activation amax} from vae.calibrate (dumped
    # by scripts/int8_drift_report.py --calib_out, or alongside a real
    # checkpoint). When the serving mode quantizes the VAE, each matched
    # conv gets a SmoothQuant-style channel equalization folded into its
    # int8 weights (ops/quant.py:equalization_vector) — measured drift
    # reduction in docs/reports/QUANT_FRONTIER.md. Ignored by bf16 modes.
    vae_calib: dict | None = None
    # Runtime conv names (ops/quant.py calib_name convention, e.g.
    # "decoder.up.0.res.1.conv1") to KEEP IN bf16 when the serving mode
    # quantizes the VAE — the mixed-precision knob fed by the per-layer
    # drift attribution (models/vae.py:attribute_quant_error ranks layers;
    # scripts/int8_drift_report.py --attribution prints the ranking).
    vae_exclude: tuple[str, ...] = ()
    # Staged path: emit planar YUV 4:2:0 (I420) uint8 frames [F, H*3//2, W]
    # instead of RGB [F, H, W, 3] — half the device->host bytes for the SAME
    # written artifact whenever the output is a standard yuv420 mp4 (the
    # OpenCV/H.264 default). Conversion (BT.601 studio-swing, cv2's I420
    # convention) + 2x2 chroma averaging runs on device. Not for PNG /
    # yuv444p / lossless outputs or when inline metrics need RGB.
    output_i420: bool = False
    # Streaming segmented long-clip path ("auto" | True | False): process
    # clips > one DiT pass as contiguous fixed-size segments whose causal
    # conv caches thread ACROSS segment calls (exact continuity — zero VAE
    # overlap recompute, no decode seams), with only the DiT running on
    # overlapping latent windows trimmed at overlap midpoints. "auto"
    # enables it for the int8 serving mode: the window-group caches
    # (~0.7 GB/window encode, ~1.1 GB/window decode at 5B/720p) fit next
    # to a 5.2 GB int8 DiT on a 16 GB chip with room for activation
    # temps; bf16 keeps the legacy overlap-chunk path (which is also the
    # reference-semantics path: per-chunk decode + pixel trim,
    # /root/reference/inference_script.py:690-727).
    streaming: str | bool = "auto"
    # DiT window geometry for the streaming path, in latent frames. The
    # 10/2 defaults match the legacy 33-frame chunks at overlap_t=8: a
    # 33-px chunk is 9 latents + 1 patch_size_t pad = the same S, and 8 px
    # frames of overlap = 2 latent frames.
    dit_window_latents: int = 10
    dit_overlap_latents: int = 2
    # Latent-frame sub-batch for streaming decode segments (diffusers'
    # num_latent_frames_batch_size character). AOT-measured decoder temps
    # are ~1.5 GB per latent frame at 46x42-latent windows (the int8 conv
    # path's int32 accumulators dominate), so 2 is the largest value that
    # fits next to the weights + a window-group's caches on a 16 GB chip
    # (fb=4 programs need 9-12 GB of temps alone — measured via
    # memory_analysis, OOMs in practice).
    stream_decode_latents: int = 2
    # Streaming is WINDOW-MAJOR: spatial windows process in groups, each
    # group's conv caches living across ALL temporal segments before the
    # next group starts — so cache residency is group_size x one-window
    # caches (5B @ 720p: ~0.7 GB/window encode, ~1.1 GB/window decode; the
    # full 8-window stacks would be 5.5 / 8.5 GB and cannot sit next to
    # the weights). Window outputs stay on device; per-segment assembly
    # programs feather in float (exactness preserved) and emit the final
    # latent / uint8 segment.
    stream_enc_group: int = 4
    stream_dec_group: int = 2
    # Device-resident window outputs scale with clip length (~8 MB per
    # 720p output frame in bf16); longer clips fall back to the legacy
    # overlap-chunk path.
    stream_max_frames: int = 320
    # Optional (h, w) cap on the staged decode window, in latents. The
    # default int8 budget (46x42) puts dec_all's temps at ~8.7 GB for a
    # 9-latent 720p batch — 15.3/16 GB next to the 6.6 GB quantized
    # weights. That fits from a clean-allocator start (bench.py), but a
    # process whose HBM history is churned (e.g. hundreds of weight-
    # synthesis programs: scripts/int8_drift_report.py) loses a few
    # hundred MB of arena headroom to fragmentation and OOMs at the same
    # residency. Capping the decode window trades ~linear temp size for
    # more windows (slightly more feather-overlap compute).
    dec_window_cap: tuple[int, int] | None = None

    def __post_init__(self):
        if self.dec_window_cap is not None and min(self.dec_window_cap) <= 2:
            raise ValueError(
                "dec_window_cap must exceed the 2-latent feather band "
                f"(each side >= 3); got {self.dec_window_cap}"
            )
        T = self.config.scheduler.num_train_timesteps
        for name in ("sr_noise_step", "noise_step"):
            t = getattr(self.config, name)
            if not 0 <= t < T:
                # the traced alphas_cumprod[t] gather CLAMPS out-of-range
                # indices (t=999's zero-terminal-SNR entry is exactly 0) —
                # garbage output with no error unless caught here
                raise ValueError(f"{name}={t} outside [0, {T})")
        self.schedule = Schedule.create(self.config.scheduler)
        self._compiled: dict[tuple, Callable] = {}
        self._staged: dict[str, Callable] = {}
        if self.quantize in ("int8", "int8-dit", "int8-vae", "int8w",
                             "int8-dit-dec"):
            from dove_tpu.ops.quant import (
                lowres_decoder_exclusions, quantize_dit, quantize_vae,
            )

            if "lowres" in self.vae_exclude:
                # named cost-aware exclusion set (quant.py): expand against
                # THIS config's decoder before quantize_vae validates names
                self.vae_exclude = tuple(
                    n for n in self.vae_exclude if n != "lowres"
                ) + lowres_decoder_exclusions(self.vae_params)
            if self._dit_resident_int8:
                self.dit_params = quantize_dit(
                    self.dit_params, donate=self.donate_weights,
                    w_only=self.quantize == "int8w",
                )
            if self._vae_quantized:
                self.vae_params = quantize_vae(
                    self.vae_params, donate=self.donate_weights,
                    calib=self.vae_calib, exclude=self.vae_exclude,
                )
            elif self._vae_decoder_quantized:
                self.vae_params = quantize_vae(
                    self.vae_params, donate=self.donate_weights,
                    which="decoder", calib=self.vae_calib,
                    exclude=self.vae_exclude,
                )
        elif self.quantize:
            raise ValueError(f"unknown quantize mode: {self.quantize}")
        if self.output_i420 and not (self.vae_tiling and self.output_uint8):
            raise ValueError(
                "output_i420 requires the staged path (vae_tiling=True) "
                "with output_uint8=True"
            )
        if self._dit_quantized and self.attention_backend is None:
            # int8 serving mode: also run QK^T on the MXU's int8 path (the
            # kernel's only remaining measured win, ~7e-3 rel err — in line
            # with the mode's W8A8 linear layers; bf16 stays bit-parity).
            try:
                if jax.devices()[0].platform == "tpu":
                    self.attention_backend = "flash-qk8"
            except Exception:  # pragma: no cover
                pass
        # NOTE: the hand-scheduled Pallas bf16 conv (models/vae.py:
        # set_pallas_conv) is NOT auto-enabled: measured SLOWER than XLA's
        # stacked-2D lowering at the decode-dominant C=128 window shape
        # (78.5 vs 90.8 TOP/s, scripts/bench_conv.py 2026-08-19). It stays
        # available (DOVE_PALLAS_CONV=1) as the baseline for future hand
        # schedules; the serving paths keep XLA's lowerings.
        # Per-clip stage wall times (staged path), accumulated across chunks;
        # reset at each process_frames call. The inter-stage barriers make
        # these accurate at zero extra cost.
        self.stage_times: dict[str, float] = {}
        self._mesh_key = None  # cache for mesh-replicated params
        self._stream: dict[str, Callable] = {}
        self._serve_mesh = None  # set by _staged_mesh_params
        self._dit_call = None  # tensor-parallel DiT forward (parallel/tp.py)

    @property
    def _dit_quantized(self) -> bool:
        """W8A8 compute: int8 activations + the flash-qk8 attention."""
        return self.quantize in ("int8", "int8-dit", "int8-dit-dec")

    @property
    def _dit_resident_int8(self) -> bool:
        """DiT weights STORED int8 (residency halved -> bigger VAE window
        budget, streaming caches fit) — includes the W8A16 int8w mode."""
        return self.quantize in ("int8", "int8-dit", "int8w", "int8-dit-dec")

    @property
    def _vae_quantized(self) -> bool:
        return self.quantize in ("int8", "int8-vae")

    @property
    def _vae_decoder_quantized(self) -> bool:
        return self.quantize in ("int8", "int8-vae", "int8-dit-dec")

    # ------------------------------------------------------------------
    # Device-side one-step SR for a single tile
    # ------------------------------------------------------------------

    def _sr_tile_fn(self) -> Callable:
        cfg = self.config

        def sr_tile(
            dit_params: Any,
            vae_params: Any,
            prompt_embedding: jnp.ndarray,
            tile: jnp.ndarray,  # [B, F, H, W, 3] in [-1, 1], model dtype
            rng: jax.Array,
        ) -> jnp.ndarray:
            B = tile.shape[0]
            enc_rng, noise_rng = jax.random.split(rng)

            # VAE encode (frame-chunked inside; causal cache threaded)
            moments = vae_mod.encode_moments(cfg.vae, vae_params, tile)
            latent = vae_mod.sample_latent(
                moments,
                enc_rng if self.sample_posterior else None,
                cfg.vae.scaling_factor,
            )  # [B, F', h, w, C]

            # patch_size_t alignment: prepend copies of the first latent
            # frame. (pt - F % pt) % pt, not the reference's F % pt
            # (inference_script.py:413, asserted pt==2-only there) — equal
            # for pt=2, correct for any pt.
            pt = cfg.dit.patch_size_t
            ncopy = 0
            if pt is not None:
                ncopy = (pt - latent.shape[1] % pt) % pt
                if ncopy:
                    first = jnp.repeat(latent[:, :1], ncopy, axis=1)
                    latent = jnp.concatenate([first, latent], axis=1)

            # [B, F', h, w, C] -> [B, F', C, h, w] (DiT convention)
            z = jnp.transpose(latent, (0, 1, 4, 2, 3))

            t_sr = jnp.full((B,), cfg.sr_noise_step, jnp.int32)
            if cfg.noise_step != 0:
                noise = jax.random.normal(noise_rng, z.shape, jnp.float32).astype(z.dtype)
                t_add = jnp.full((B,), cfg.noise_step, jnp.int32)
                z = self.schedule.add_noise(z, noise, t_add)

            text = jnp.broadcast_to(
                prompt_embedding[None], (B,) + prompt_embedding.shape
            )
            v_pred = dit_forward(
                dit_params, cfg.dit, z, text, t_sr,
                attention_backend=self.attention_backend,
                bounded_logits=True,  # frozen qk-layernorm gains at inference
            )
            x0 = self.schedule.velocity_to_x0(v_pred, z, t_sr)

            if ncopy:
                x0 = x0[:, ncopy:]

            # [B, F', C, h, w] -> [B, F', h, w, C], unscale, decode
            x0 = jnp.transpose(x0, (0, 1, 3, 4, 2))
            x0 = x0 / jnp.asarray(cfg.vae.scaling_factor, x0.dtype)
            pixels = vae_mod.decode(cfg.vae, vae_params, x0)
            return jnp.clip(pixels.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)

        return sr_tile

    # ------------------------------------------------------------------
    # Staged full-clip path (reference default: --is_vae_st, no outer tiles;
    # inference.sh runs all 6 benchmarks this way). Exactly THREE device
    # calls per temporal chunk — enc_all (on-device x4 upscale + lax.map over
    # VAE windows + feathered assembly), the full-clip DiT step, and dec_all
    # (lax.map windows + assembly + uint8 quantize) — so per-call dispatch
    # latency and host<->device transfer volume are both minimized: the tiny
    # LQ clip goes up, one uint8 clip comes back. See docs/DESIGN.md §7.
    # ------------------------------------------------------------------

    @staticmethod
    def _barrier(x: jnp.ndarray) -> None:
        """Reliable device fence: pull one element to host. On relay-backed
        TPU runtimes ``block_until_ready`` can return before remote execution
        finishes; a host data dependency cannot."""
        np.asarray(jax.device_get(x[(0,) * x.ndim]))

    # one-time host-link probe result: True => link is fast enough that
    # multi-stream pulls only add thread overhead (directly-attached TPU).
    # ClassVar: a process-wide cache, NOT a dataclass field (an annotated
    # plain assignment here would become an __init__ parameter and a
    # per-instance attribute shadowing the class-level cache).
    _fast_link: ClassVar[bool | None] = None

    @classmethod
    def _parallel_get(
        cls, x: jnp.ndarray, parts: int | None = None, workers: int | None = None
    ) -> np.ndarray:
        """Device->host pull over parallel streams.

        Tunneled/relay-backed TPU runtimes are PER-STREAM bound (~13 MB/s
        single stream on the measured link); concurrent pulls of contiguous
        chunks reach ~63 MB/s at the default 64 parts x 32 threads
        (measured; >32 worker threads can deadlock the relay client — do
        not raise the default). Directly-attached chips pull GB/s on one
        stream, so the first large pull probes the link and disables the
        multi-stream workaround on fast links. Tunables:
        ``DOVE_PULL_PARTS`` / ``DOVE_PULL_THREADS`` (0 parts = force
        single-stream). Small arrays always pull directly."""
        import os

        nbytes = x.size * x.dtype.itemsize
        if nbytes < (2 << 20):
            return np.asarray(jax.device_get(x))
        if parts is None:
            parts = int(os.environ.get("DOVE_PULL_PARTS", "64"))
            # mid-size arrays (streaming latent/x0 segments, a few MB):
            # full 64-way splitting makes sub-128KB parts whose per-stream
            # setup dominates — scale parts to ~512 KB each
            parts = max(1, min(parts, nbytes // (512 << 10)))
        if workers is None:
            workers = int(os.environ.get("DOVE_PULL_THREADS", "32"))
        if cls._fast_link is None and "DOVE_PULL_PARTS" not in os.environ:
            # One-time link probe. Must NOT time a pull of `x` itself: x's
            # producer program may still be executing, so the measurement
            # would include compute time and latch _fast_link=False forever
            # on a genuinely fast link (and with it, mis-gate the streaming
            # path). _probe_fast_link times a fenced standalone buffer.
            cls._probe_fast_link()
        if parts <= 1 or cls._fast_link:
            return np.asarray(jax.device_get(x))
        from concurrent.futures import ThreadPoolExecutor

        shape = x.shape
        flat = x.reshape(-1)
        bounds = np.linspace(0, flat.shape[0], parts + 1).astype(int)
        chunks = [
            flat[a:b] for a, b in zip(bounds[:-1], bounds[1:]) if b > a
        ]
        with ThreadPoolExecutor(min(workers, len(chunks))) as ex:
            outs = list(ex.map(lambda a: np.asarray(jax.device_get(a)), chunks))
        return np.concatenate(outs).reshape(shape)

    @staticmethod
    def _plan_axis(size: int, blend: int, max_tile: int) -> tuple[int, int, int]:
        """Uniform minimal-coverage tiling of one axis -> (tile, stride, n).

        Picks the FEWEST tiles of size <= max_tile with a fixed `blend`
        feather band, sized so (n-1)*stride + tile barely covers `size`
        (stride = tile - blend). The previous range()-based grid both
        over-generated tiles (a start was emitted even when prior tiles
        already covered the axis) and cropped the last tile to the stride in
        assembly — together ~1.6x redundant decode compute at 720p vs this
        plan's ~1.15x.
        """
        if size <= max_tile:
            return size, size, 1
        n = -(-(size - blend) // (max_tile - blend))  # ceil division
        tile = min(-(-(size - blend) // n) + blend, max_tile)
        return tile, tile - blend, n

    @staticmethod
    def _feather_assemble(
        tiles: jnp.ndarray,  # [N, ..., th, tw, C] (leading dims ride along)
        n_rows: int, n_cols: int,
        blend_h: int, blend_w: int,
        out_h: int, out_w: int,
    ) -> jnp.ndarray:
        """Device-side feathered assembly of row-major tiles -> [..., H, W, C].

        h/w are the -3/-2 axes; any leading dims (batch, frames) pass
        through — this is what lets mesh-sharded chunk batches reuse the
        same assembly. Static Python loops over the tile grid — cheap
        elementwise lerps that XLA fuses; keeping assembly on device means
        the host only ever transfers the FINAL clip (transfer bandwidth,
        not FLOPs, dominates on tunneled TPU setups)."""
        th, tw = tiles.shape[-3], tiles.shape[-2]
        nd = tiles.ndim - 1  # per-tile rank
        h_ax, w_ax = nd - 3, nd - 2

        def sl(x, a, b, axis):
            return jax.lax.slice_in_dim(x, a, b, axis=axis)

        def lerp(a_band, b_band, extent, axis):
            shape = [1] * b_band.ndim
            shape[axis] = extent
            w = (jnp.arange(extent, dtype=jnp.float32) / extent).reshape(shape)
            af = a_band.astype(jnp.float32)
            bf = b_band.astype(jnp.float32)
            return (af * (1 - w) + bf * w).astype(b_band.dtype)

        row_limit_h = th - blend_h
        row_limit_w = tw - blend_w
        result_rows = []
        prev_row: list | None = None
        for r in range(n_rows):
            row = [tiles[r * n_cols + c] for c in range(n_cols)]
            out_row = []
            for c, tile in enumerate(row):
                if prev_row is not None and blend_h > 0:
                    band = lerp(sl(prev_row[c], th - blend_h, th, h_ax),
                                sl(tile, 0, blend_h, h_ax), blend_h, h_ax)
                    tile = jnp.concatenate(
                        [band, sl(tile, blend_h, th, h_ax)], axis=h_ax
                    )
                if c > 0 and blend_w > 0:
                    band = lerp(sl(row[c - 1], tw - blend_w, tw, w_ax),
                                sl(tile, 0, blend_w, w_ax), blend_w, w_ax)
                    tile = jnp.concatenate(
                        [band, sl(tile, blend_w, tw, w_ax)], axis=w_ax
                    )
                # interior tiles place `stride` px; the LAST row/col keeps its
                # full extent so minimal-coverage plans need no extra tile
                h_keep = th if r == n_rows - 1 else row_limit_h
                w_keep = tw if c == n_cols - 1 else row_limit_w
                out_row.append(sl(sl(tile, 0, h_keep, h_ax), 0, w_keep, w_ax))
            result_rows.append(jnp.concatenate(out_row, axis=w_ax))
            prev_row = row
        out = jnp.concatenate(result_rows, axis=h_ax)
        return sl(sl(out, 0, out_h, h_ax), 0, out_w, w_ax)

    def _window_map(
        self, fn: Callable, params: Any, x: jnp.ndarray, coords: jnp.ndarray
    ) -> jnp.ndarray:
        """Map an independent spatial-window work-list, mesh-sharded.

        ``fn(params, x, ij) -> window_out``; returns the stack with a
        leading window axis (like ``lax.map``). Without a serving mesh this
        IS ``lax.map`` — sequential windows, bounding live temps to one
        window. On a mesh, the window axis shards over every mesh axis not
        already carrying the batch (x's batch dim rides "data" when it
        divides it — the chunk-parallel case), and each shard lax.maps its
        LOCAL windows, so per-device memory matches the single-device path
        while a 720p decode's 8-window plan spreads over 8 chips. The
        work-list pads to the shard count by repeating the last window;
        padded outputs are redundant compute only (the feather assembly
        reads windows by index, never the pad).

        Window outputs are computed by identical per-window programs either
        way, so mesh and single-device results are bit-identical (the DiT's
        tensor parallelism is the only approximate reshard in mesh serving).
        """
        mesh = self._serve_mesh
        n = int(coords.shape[0])
        if mesh is None or mesh.size == 1 or n == 1:
            return jax.lax.map(lambda ij: fn(params, x, ij), coords)
        from jax.sharding import PartitionSpec as P

        B = x.shape[0]
        data_ax = None
        if (
            B > 1
            and mesh.shape.get("data", 1) > 1
            and B % mesh.shape["data"] == 0
        ):
            data_ax = "data"
        win_axes = tuple(
            a for a in mesh.axis_names if a != data_ax and mesh.shape[a] > 1
        )
        if not win_axes:
            return jax.lax.map(lambda ij: fn(params, x, ij), coords)
        nshards = 1
        for a in win_axes:
            nshards *= mesh.shape[a]
        pad = (-n) % nshards
        if pad:
            coords = jnp.concatenate(
                [coords, jnp.repeat(coords[-1:], pad, axis=0)]
            )
        win_entry = win_axes if len(win_axes) > 1 else win_axes[0]

        def body(c, xx, pp):
            return jax.lax.map(lambda ij: fn(pp, xx, ij), c)

        out = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(win_entry), P(data_ax), P()),
            out_specs=P(win_entry, data_ax),
            check_vma=False,
        )(coords, x, params)
        return out[:n] if pad else out

    def _window_budget(self) -> tuple[int, tuple[int, int], tuple[int, int]]:
        """(blend_lat, (enc_max_h, enc_max_w), (dec_max_h, dec_max_w)).

        Feather band: 2 latents (16 px) — hides seams at every measured
        geometry. Max tile areas are HBM-budgeted: decoder temps scale
        ~linearly with latent tile area (measured 2.6 GB at 24x24 next to
        a 10.4 GB bf16 DiT); int8 halves the resident DiT (10.4 -> 5.2 GB),
        buying 46-latent tiles: a 720p clip (90x160 latent) plans 2x4
        windows of 46x42 (1.09x redundant compute) instead of 3x5 of 32x34
        (1.13x), and decoder temps stay ~8.7 GB for a 9-latent batch
        (measured-linear in tile area from the 2.6 GB @ 24x24 bf16 point).
        """
        if self._dit_quantized and self._vae_quantized:
            budget = 2, (46, 42), (46, 42)
        elif self.quantize == "int8-dit-dec":
            # int8 decoder temps allow the full int8 DECODE budget; the
            # bf16 encoder keeps the int8-dit encode budget
            budget = 2, (40, 38), (46, 42)
        elif self._dit_resident_int8:
            # int8-dit: the halved resident DiT buys bigger-than-bf16
            # windows, but NOT the full int8 budget — the bf16 VAE's decode
            # temps run ~1.4x the int8 VAE's per latent² (AOT-measured on
            # chip: dec_all temps 14.41 G at 46x42 bf16 vs 10.21 G int8;
            # the 46x42 bf16 decode OOMs a 16 G chip next to the 6.35 G
            # residency). 36x34 probes at 8.44 G temps / 15.1 G total.
            budget = 2, (40, 38), (36, 34)
        else:
            budget = 2, (32, 32), (28, 28)
        if self.dec_window_cap is not None:
            blend, enc_max, dec_max = budget
            budget = blend, enc_max, (
                min(dec_max[0], self.dec_window_cap[0]),
                min(dec_max[1], self.dec_window_cap[1]),
            )
        return budget

    def _quantize_frames(self, out01: jnp.ndarray) -> jnp.ndarray:
        """[B, F, H, W, 3] float in [0,1] -> uint8 RGB, or packed I420."""
        Bp, Fp, Hp, Wp = out01.shape[:4]
        if self.output_i420 and Hp % 2 == 0 and Wp % 2 == 0:
            # BT.601 STUDIO-swing (Y 16-235, chroma 16-240) — cv2's
            # I420<->BGR convention, so host-side cvtColor round-trips.
            r, g, b = out01[..., 0], out01[..., 1], out01[..., 2]
            ey = 0.299 * r + 0.587 * g + 0.114 * b
            y = 16.0 + 219.0 * ey
            u = 128.0 + (112.0 / 0.886) * (b - ey)
            v = 128.0 + (112.0 / 0.701) * (r - ey)
            u2 = u.reshape(Bp, Fp, Hp // 2, 2, Wp // 2, 2).mean(axis=(3, 5))
            v2 = v.reshape(Bp, Fp, Hp // 2, 2, Wp // 2, 2).mean(axis=(3, 5))

            def q(x):
                return jnp.round(jnp.clip(x, 0.0, 255.0)).astype(jnp.uint8)

            flat = jnp.concatenate(
                [q(y).reshape(Bp, Fp, -1), q(u2).reshape(Bp, Fp, -1),
                 q(v2).reshape(Bp, Fp, -1)], axis=2,
            )
            return flat.reshape(Bp, Fp, Hp * 3 // 2, Wp)
        return jnp.round(out01 * 255.0).astype(jnp.uint8)

    def _staged_fns(self):
        if self._staged:
            return self._staged
        cfg = self.config
        s = cfg.vae.spatial_scale

        BLEND_LAT, (enc_max_h, enc_max_w), (dec_max_h, dec_max_w) = (
            self._window_budget()
        )

        def enc_all(params, lq):
            """Upscale + window + encode + feather-assemble, ONE program.

            lq: [1, F, H, W, 3] in [-1, 1] at LQ resolution (tiny upload);
            returns assembled moments [1, F', H*u/8, W*u/8, 2C]."""
            B, F, H, W, _ = lq.shape
            u = cfg.upscale
            Hu, Wu = H * u, W * u
            up = jax.image.resize(
                lq.astype(jnp.float32), (B, F, Hu, Wu, 3), "bilinear"
            ).astype(lq.dtype)
            lat_h, lat_w = Hu // s, Wu // s
            tile_h, stride_h, n_rows = self._plan_axis(lat_h, BLEND_LAT, enc_max_h)
            tile_w, stride_w, n_cols = self._plan_axis(lat_w, BLEND_LAT, enc_max_w)
            if n_rows == 1 and n_cols == 1:
                return vae_mod.encode_moments(cfg.vae, params, up)
            th, tw = tile_h * s, tile_w * s
            cover_h = ((n_rows - 1) * stride_h + tile_h) * s
            cover_w = ((n_cols - 1) * stride_w + tile_w) * s
            up = jnp.pad(
                up,
                ((0, 0), (0, 0), (0, cover_h - Hu), (0, cover_w - Wu), (0, 0)),
                mode="edge",
            )
            coords = jnp.asarray(
                [(r * stride_h * s, c * stride_w * s)
                 for r in range(n_rows) for c in range(n_cols)], jnp.int32
            )

            def one(p, x, ij):
                # sizes from x, not the enclosing scope: under _window_map's
                # mesh sharding x is the LOCAL batch shard
                tile = jax.lax.dynamic_slice(
                    x, (0, 0, ij[0], ij[1], 0),
                    (x.shape[0], x.shape[1], th, tw, 3),
                )
                return vae_mod.encode_moments(cfg.vae, p, tile)

            tiles = self._window_map(one, params, up, coords)  # [N, B, F', th, tw, 2C]
            return self._feather_assemble(
                tiles, n_rows, n_cols,
                BLEND_LAT if n_rows > 1 else 0,
                BLEND_LAT if n_cols > 1 else 0,
                lat_h, lat_w,
            )

        def dec_all(params, z):
            """Window + decode + feather-assemble + uint8 quantize, ONE
            program. z: [B, F', h, w, C] (unscaled latent); returns
            [B, F, H, W, 3] uint8 (or packed I420 [B, F, H*3//2, W])."""
            B, Fl, zh, zw, C = z.shape
            tile_h, stride_h, n_rows = self._plan_axis(zh, BLEND_LAT, dec_max_h)
            tile_w, stride_w, n_cols = self._plan_axis(zw, BLEND_LAT, dec_max_w)
            if n_rows == 1 and n_cols == 1:
                pixels = vae_mod.decode(cfg.vae, params, z)
            else:
                cover_h = (n_rows - 1) * stride_h + tile_h
                cover_w = (n_cols - 1) * stride_w + tile_w
                zp = jnp.pad(
                    z,
                    ((0, 0), (0, 0), (0, cover_h - zh), (0, cover_w - zw), (0, 0)),
                    mode="edge",
                ) if cover_h > zh or cover_w > zw else z

                def one(p, x, ij):
                    # sizes from x: under _window_map's mesh sharding x is
                    # the LOCAL batch shard
                    tile = jax.lax.dynamic_slice(
                        x, (0, 0, ij[0], ij[1], 0),
                        (x.shape[0], x.shape[1], tile_h, tile_w, C),
                    )
                    return vae_mod.decode(cfg.vae, p, tile)

                tiles = self._window_map(one, params, zp, jnp.asarray(
                    [(r * stride_h, c * stride_w)
                     for r in range(n_rows) for c in range(n_cols)], jnp.int32
                ))  # [N, B, F, th*s, tw*s, 3]
                pixels = self._feather_assemble(
                    tiles, n_rows, n_cols,
                    (BLEND_LAT if n_rows > 1 else 0) * s,
                    (BLEND_LAT if n_cols > 1 else 0) * s,
                    zh * s, zw * s,
                )
            out01 = jnp.clip(pixels.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)
            return self._quantize_frames(out01)

        def dit_step(dit_params, prompt, moments, rng):
            # moments: [B, F', h, w, 2C] -> sample, one-step denoise, unscale
            from dove_tpu.train.losses import one_step_x0_latent

            enc_rng, noise_rng = jax.random.split(rng)
            latent = vae_mod.sample_latent(
                moments, enc_rng if self.sample_posterior else None,
                cfg.vae.scaling_factor,
            )
            B = latent.shape[0]
            text = jnp.broadcast_to(prompt[None], (B,) + prompt.shape)
            x0 = one_step_x0_latent(
                cfg, self.schedule, dit_params, latent, text,
                noise_rng, remat=False, attention_backend=self.attention_backend,
                bounded_logits=True,  # frozen qk-layernorm gains at inference
                dit_fn=self._dit_call,  # tensor-parallel forward when meshed
            )
            return x0 / jnp.asarray(cfg.vae.scaling_factor, x0.dtype)

        self._staged = {
            "enc_all": jax.jit(enc_all),
            "dec_all": jax.jit(dec_all),
            "dit": jax.jit(dit_step),
        }
        return self._staged

    # ------------------------------------------------------------------
    # Streaming segmented path: long clips as contiguous fixed-size
    # segments with causal conv caches threaded ACROSS segment calls.
    #
    # The legacy long-clip path re-runs the whole enc->DiT->dec stack on
    # overlapping 33-frame chunks (reference semantics). Only the DiT
    # actually needs temporal windowing (attention is quadratic in S);
    # the causal VAE streams exactly: encode/decode touch every frame
    # ONCE and decode has no temporal seams. Spatial windows process
    # WINDOW-MAJOR in groups (a group's caches live across all segments;
    # all-window cache stacks would not fit next to the weights — see
    # docs/DESIGN.md §10), window outputs stay on device, and a
    # per-segment assembly program feathers in float and emits the final
    # latent / uint8 segment. The latent/x0 streams live on HOST (tiny:
    # ~0.9 MB per latent frame at 720p bf16), so every device program's
    # shape is independent of clip length — any length reuses the same
    # compiled segment programs. Perf vs legacy is link-dependent
    # (DESIGN §10): the DiT windows are identical in both paths, so the
    # savings are the encode/decode overlap minus the schedule's fences.
    # ------------------------------------------------------------------

    @staticmethod
    def _free(tree) -> None:
        """Eagerly release a pytree's device buffers (e.g. the ~GB-scale
        conv caches between the encode and decode phases)."""
        for leaf in jax.tree_util.tree_leaves(tree):
            try:
                leaf.delete()
            except Exception:  # pragma: no cover - already donated/deleted
                pass

    def _stream_enabled(self, mesh) -> bool:
        import os

        env = os.environ.get("DOVE_STREAMING")
        if env is not None:
            return env.lower() not in ("0", "false", "off", "no", "")
        if mesh is not None and mesh.size > 1:
            # mesh serving (chunk-parallel over "data" and/or window+tensor
            # parallel with "model") scales across chips; streaming is a
            # single-chip path (takes precedence over an explicit "on").
            return False
        # accept the CLI's on/off vocabulary for library callers too —
        # bool("off") is True, a silent footgun with a `str | bool` field
        if isinstance(self.streaming, str) and self.streaming != "auto":
            if self.streaming.lower() in ("0", "false", "off", "no"):
                return False
            if self.streaming.lower() in ("1", "true", "on", "yes"):
                return True
            raise ValueError(
                f"streaming={self.streaming!r}: expected auto/on/off"
            )
        if self.streaming == "auto":
            # bf16 cannot hold the decode-phase conv caches next to a
            # 10.4 GB resident DiT on a 16 GB chip; int8 can. And on a
            # RELAY-tunneled chip the per-call fences + round trips the
            # window-major schedule needs (measured: +8s on a 100-frame
            # clip, docs/DESIGN.md §10) cost more than the overlap compute
            # they remove, so auto also requires a directly-attached host
            # link (same probe as _parallel_get).
            return self._dit_resident_int8 and self._probe_fast_link()
        return bool(self.streaming)

    @classmethod
    def _probe_fast_link(cls) -> bool:
        if cls._fast_link is None:
            try:
                probe = jnp.zeros((4 << 20,), jnp.uint8) + 1  # defeat dedupe
                cls._barrier(probe)
                t0 = time.time()
                np.asarray(jax.device_get(probe))
                bw = (4 << 20) / max(time.time() - t0, 1e-9)
                cls._fast_link = bw > 500e6
                if cls._fast_link:
                    logger.info(
                        "host link probe: %.0f MB/s single-stream — using "
                        "direct pulls", bw / 1e6,
                    )
            except Exception:  # pragma: no cover
                cls._fast_link = False
        return cls._fast_link

    def _stream_fns(self):
        if self._stream:
            return self._stream
        cfg = self.config
        s = cfg.vae.spatial_scale
        BLEND_LAT, (enc_max_h, enc_max_w), (dec_max_h, dec_max_w) = (
            self._window_budget()
        )

        def enc_grp(params, lq, coords, cache):
            """Encode a GROUP of spatial windows for one temporal segment.

            lq: [1, f, H, W, 3] in [-1, 1] at LQ resolution (the x4 upscale
            runs on device); coords: [g, 2] PIXEL offsets of the group's
            windows in the padded upscaled frame; cache: None for the
            clip's first segment, else the group's per-window cache stack.
            Returns (moment windows [g, B, f', tl_h, tl_w, 2C], cache)."""
            B, F, H, W, _ = lq.shape
            u = cfg.upscale
            Hu, Wu = H * u, W * u
            up = jax.image.resize(
                lq.astype(jnp.float32), (B, F, Hu, Wu, 3), "bilinear"
            ).astype(lq.dtype)
            lat_h, lat_w = Hu // s, Wu // s
            tile_h, stride_h, n_rows = self._plan_axis(lat_h, BLEND_LAT, enc_max_h)
            tile_w, stride_w, n_cols = self._plan_axis(lat_w, BLEND_LAT, enc_max_w)
            th, tw = tile_h * s, tile_w * s
            cover_h = ((n_rows - 1) * stride_h + tile_h) * s
            cover_w = ((n_cols - 1) * stride_w + tile_w) * s
            if cover_h > Hu or cover_w > Wu:
                up = jnp.pad(
                    up,
                    ((0, 0), (0, 0), (0, cover_h - Hu), (0, cover_w - Wu), (0, 0)),
                    mode="edge",
                )

            def one(args):
                ij, c = args if cache is not None else (args, None)
                tile = jax.lax.dynamic_slice(
                    up, (0, 0, ij[0], ij[1], 0), (B, F, th, tw, 3)
                )
                return vae_mod.encode_moments_cached(cfg.vae, params, tile, c)

            return jax.lax.map(
                one, (coords, cache) if cache is not None else coords
            )

        def asm_enc(tiles_groups, rng, n_rows, n_cols, lat_h, lat_w, n_w):
            """Feather a segment's moment windows + posterior-sample.

            tiles_groups: tuple of [g, B, f', tl_h, tl_w, 2C] stacks in
            row-major window order (padded group tails dropped via n_w).
            Returns the segment's SCALED latent [B, f', lat_h, lat_w, C]."""
            tiles = jnp.concatenate(tiles_groups, axis=0)[:n_w]
            m = self._feather_assemble(
                tiles, n_rows, n_cols,
                BLEND_LAT if n_rows > 1 else 0,
                BLEND_LAT if n_cols > 1 else 0,
                lat_h, lat_w,
            )
            return vae_mod.sample_latent(
                m, rng if self.sample_posterior else None,
                cfg.vae.scaling_factor,
            )

        def dit_win(dit_params, prompt, lat_win, rng):
            """One-step denoise of a latent window [1, w, h, w, C] (scaled);
            returns x0 UNSCALED (divided by scaling_factor), decode-ready."""
            from dove_tpu.train.losses import one_step_x0_latent

            B = lat_win.shape[0]
            text = jnp.broadcast_to(prompt[None], (B,) + prompt.shape)
            x0 = one_step_x0_latent(
                cfg, self.schedule, dit_params, lat_win, text, rng,
                remat=False, attention_backend=self.attention_backend,
                bounded_logits=True, dit_fn=self._dit_call,
            )
            return x0 / jnp.asarray(cfg.vae.scaling_factor, x0.dtype)

        def dec_grp(params, z, coords, cache):
            """Decode a GROUP of spatial windows for one latent segment.

            z: [1, f', zh, zw, C] unscaled latent segment; coords: [g, 2]
            LATENT offsets. Returns (pixel windows [g, B, f_px, th*s, tw*s,
            3] in model dtype, cache)."""
            B, Fl, zh, zw, C = z.shape
            fb = self.stream_decode_latents
            tile_h, stride_h, n_rows = self._plan_axis(zh, BLEND_LAT, dec_max_h)
            tile_w, stride_w, n_cols = self._plan_axis(zw, BLEND_LAT, dec_max_w)
            cover_h = (n_rows - 1) * stride_h + tile_h
            cover_w = (n_cols - 1) * stride_w + tile_w
            zp = jnp.pad(
                z,
                ((0, 0), (0, 0), (0, cover_h - zh), (0, cover_w - zw), (0, 0)),
                mode="edge",
            ) if cover_h > zh or cover_w > zw else z

            def one(args):
                ij, c = args if cache is not None else (args, None)
                tile = jax.lax.dynamic_slice(
                    zp, (0, 0, ij[0], ij[1], 0), (B, Fl, tile_h, tile_w, C)
                )
                return vae_mod.decode_cached(cfg.vae, params, tile, c, fb)

            return jax.lax.map(
                one, (coords, cache) if cache is not None else coords
            )

        def asm_dec(tiles_groups, n_rows, n_cols, out_h, out_w, n_w):
            """Feather a segment's pixel windows (FLOAT — exactness kept)
            and quantize to uint8 RGB / packed I420."""
            tiles = jnp.concatenate(tiles_groups, axis=0)[:n_w]
            pixels = self._feather_assemble(
                tiles, n_rows, n_cols,
                (BLEND_LAT if n_rows > 1 else 0) * s,
                (BLEND_LAT if n_cols > 1 else 0) * s,
                out_h, out_w,
            )
            out01 = jnp.clip(pixels.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)
            return self._quantize_frames(out01)

        self._stream = {
            # first-segment variants trace with cache=None (fresh caches
            # out); steady variants DONATE the incoming cache so a group's
            # cache stack never exists twice in HBM.
            "enc0": jax.jit(lambda p, lq, ij: enc_grp(p, lq, ij, None)),
            "enc": jax.jit(enc_grp, donate_argnums=(3,)),
            "asm_enc": jax.jit(asm_enc, static_argnums=(2, 3, 4, 5, 6)),
            "dit": jax.jit(dit_win),
            "dec0": jax.jit(lambda p, z, ij: dec_grp(p, z, ij, None)),
            "dec": jax.jit(dec_grp, donate_argnums=(3,)),
            "asm_dec": jax.jit(asm_dec, static_argnums=(1, 2, 3, 4, 5)),
        }
        return self._stream

    @staticmethod
    def _window_groups(
        coords: list[tuple[int, int]], group: int
    ) -> list[np.ndarray]:
        """Row-major window coords -> fixed-shape [g, 2] groups (the tail
        group pads by repeating its last window; padded outputs are dropped
        at assembly via the n_w static)."""
        g = max(1, min(group, len(coords)))
        out = []
        for i in range(0, len(coords), g):
            chunk = list(coords[i : i + g])
            while len(chunk) < g:
                chunk.append(chunk[-1])
            out.append(np.asarray(chunk, np.int32))
        return out

    def _sr_clip_streamed(
        self, clip: np.ndarray, rng: jax.Array, overlap_lat: int | None = None
    ) -> np.ndarray:
        """Streaming SR of a whole clip. clip: [F, H, W, 3] np float32 in
        [-1, 1] at LQ resolution with (F-1) % 4 == 0. Returns the full
        uint8 RGB [F, H*u, W*u, 3] (or packed I420) clip.

        Three phases, all window-major over spatial windows with causal
        conv caches threaded across temporal segments (group residency
        only), then per-segment device assembly:
          encode  -> moment windows (device) -> feather+sample -> latents
          DiT     -> overlapping latent windows, midpoint trim (host stream)
          decode  -> pixel windows (device)  -> feather+quantize -> pull
        """
        import os

        timing = bool(os.environ.get("DOVE_STAGE_TIMING"))
        fns = self._stream_fns()
        cfg = self.config
        sscale = cfg.vae.spatial_scale
        F, Hl, Wl, _ = clip.shape
        u = cfg.upscale
        Hp, Wp = Hl * u, Wl * u
        lat_h, lat_w = Hp // sscale, Wp // sscale
        n_lat = cfg.vae.latent_frames(F)
        BLEND_LAT, (emh, emw), (dmh, dmw) = self._window_budget()
        _, esh, enr = self._plan_axis(lat_h, BLEND_LAT, emh)
        _, esw, enc_ = self._plan_axis(lat_w, BLEND_LAT, emw)
        enc_coords = [
            (r * esh * sscale, c * esw * sscale)
            for r in range(enr) for c in range(enc_)
        ]
        _, dsh, dnr = self._plan_axis(lat_h, BLEND_LAT, dmh)
        _, dsw, dnc = self._plan_axis(lat_w, BLEND_LAT, dmw)
        dec_coords = [
            (r * dsh, c * dsw) for r in range(dnr) for c in range(dnc)
        ]
        segs = plan_stream_segments(F)
        lat0 = cfg.vae.latent_frames(segs[0][1])

        def lat_span(i: int) -> tuple[int, int]:
            s0, e0 = segs[i]
            if i == 0:
                return 0, lat0
            ls = lat0 + (s0 - segs[0][1]) // 4
            return ls, ls + (e0 - s0) // 4

        rng_enc, rng_dit = jax.random.split(rng)
        np_bf16 = np.asarray(jnp.zeros((), self.dtype)).dtype

        # ---- encode: window-major groups, exact cache handoff ----
        t0 = time.time()
        mom: list[list] = [[] for _ in segs]
        lq_segs: dict[int, jnp.ndarray] = {}  # uploaded once, reused per group
        for grp in self._window_groups(enc_coords, self.stream_enc_group):
            coords = jnp.asarray(grp)
            cache = None
            for si, (s0, e0) in enumerate(segs):
                if si not in lq_segs:
                    lq_segs[si] = jnp.asarray(clip[None, s0:e0], self.dtype)
                if cache is None:
                    tiles, cache = fns["enc0"](self.vae_params, lq_segs[si], coords)
                else:
                    tiles, cache = fns["enc"](
                        self.vae_params, lq_segs[si], coords, cache
                    )
                # REQUIRED serialization, not just timing: queued programs
                # allocate temps at enqueue on relay-backed runtimes, so an
                # unfenced loop stacks every call's temps in HBM at once.
                self._barrier(tiles)
                mom[si].append(tiles)
            self._free(cache)
        lq_segs.clear()

        lat_stream = np.empty(
            (1, n_lat, lat_h, lat_w, cfg.vae.latent_channels), np_bf16
        )
        for si in range(len(segs)):
            lat = fns["asm_enc"](
                tuple(mom[si]), jax.random.fold_in(rng_enc, si),
                enr, enc_, lat_h, lat_w, len(enc_coords),
            )
            ls, le = lat_span(si)
            lat_stream[:, ls:le] = self._parallel_get(lat)
            mom[si] = None  # free the segment's moment windows
        t1 = time.time()
        self.stage_times["enc"] = self.stage_times.get("enc", 0.0) + (t1 - t0)
        if timing:
            print(
                f"stream enc: {t1 - t0:.2f}s ({len(segs)} segments x "
                f"{len(enc_coords)} windows)", flush=True,
            )

        # ---- DiT: overlapping windows, midpoint trim in latent space ----
        wplan = plan_dit_windows(
            n_lat, self.dit_window_latents,
            self.dit_overlap_latents if overlap_lat is None else overlap_lat,
        )
        x0_stream = np.empty_like(lat_stream)
        if self._probe_fast_link():
            # dispatch every window before the first pull: the windows are
            # independent, so the device chains them without host
            # round-trips (the x0 pulls then drain a finished queue)
            x0_wins = [
                fns["dit"](
                    self.dit_params, self.prompt_embedding,
                    jnp.asarray(lat_stream[:, ws:we]),
                    jax.random.fold_in(rng_dit, j),
                )
                for j, (ws, we, _, _) in enumerate(wplan)
            ]
            for (ws, we, klo, khi), x0 in zip(wplan, x0_wins):
                x0_stream[:, ws + klo : ws + khi] = (
                    self._parallel_get(x0)[:, klo:khi]
                )
        else:
            # relay-backed runtime: queued programs allocate temps at
            # ENQUEUE (docs/DESIGN.md §10) — dispatching every window ahead
            # stacks ~2 GB of DiT activation temps per window in HBM next
            # to the resident weights and window caches (OOM at ~10
            # windows). Fence each window before dispatching the next; the
            # per-dispatch round trip (~10-30 ms) is noise next to a
            # multi-second window.
            for j, (ws, we, klo, khi) in enumerate(wplan):
                x0 = fns["dit"](
                    self.dit_params, self.prompt_embedding,
                    jnp.asarray(lat_stream[:, ws:we]),
                    jax.random.fold_in(rng_dit, j),
                )
                self._barrier(x0)
                x0_stream[:, ws + klo : ws + khi] = (
                    self._parallel_get(x0)[:, klo:khi]
                )
        t2 = time.time()
        self.stage_times["dit"] = self.stage_times.get("dit", 0.0) + (t2 - t1)
        if timing:
            print(f"stream dit: {t2 - t1:.2f}s ({len(wplan)} windows)", flush=True)

        # ---- decode: window-major groups, exact cache handoff, no seams ----
        px: list[list] = [[] for _ in segs]
        z_segs: dict[int, jnp.ndarray] = {}
        for grp in self._window_groups(dec_coords, self.stream_dec_group):
            coords = jnp.asarray(grp)
            cache = None
            for si in range(len(segs)):
                if si not in z_segs:
                    ls, le = lat_span(si)
                    z_segs[si] = jnp.asarray(x0_stream[:, ls:le])
                if cache is None:
                    tiles, cache = fns["dec0"](self.vae_params, z_segs[si], coords)
                else:
                    tiles, cache = fns["dec"](
                        self.vae_params, z_segs[si], coords, cache
                    )
                self._barrier(tiles)  # see encode loop: fence queued temps
                px[si].append(tiles)
            self._free(cache)
        z_segs.clear()  # symmetric with lq_segs: drop the latent stream's
        # device buffers before the assembly/pull phase needs its headroom

        i420 = self.output_i420
        out = np.empty(
            (F, Hp * 3 // 2, Wp) if i420 else (F, Hp, Wp, 3), np.uint8
        )
        # Two-slot assembly/pull pipeline: dispatch segment si+1's feather
        # assembly BEFORE pulling segment si, so the host-link transfer of
        # si overlaps si+1's assembly compute (the pull blocks only until
        # si's program is done; the TPU runtime DMAs while si+1 executes).
        # Peak memory is unchanged — every segment's pixel windows are
        # already alive at the end of the decode loop above, and assembly
        # temps never coexist (programs run serially).
        pending = None
        for si, (s0, e0) in enumerate(segs):
            u8 = fns["asm_dec"](
                tuple(px[si]), dnr, dnc, lat_h * sscale, lat_w * sscale,
                len(dec_coords),
            )
            if pending is not None:
                psi, ps0, pe0, pu8 = pending
                out[ps0:pe0] = self._parallel_get(pu8)[0]
                px[psi] = None  # free the segment's pixel windows
            pending = (si, s0, e0, u8)
        psi, ps0, pe0, pu8 = pending
        out[ps0:pe0] = self._parallel_get(pu8)[0]
        px[psi] = None
        t3 = time.time()
        self.stage_times["dec"] = self.stage_times.get("dec", 0.0) + (t3 - t2)
        if timing:
            print(
                f"stream dec: {t3 - t2:.2f}s ({len(segs)} segments x "
                f"{len(dec_coords)} windows)", flush=True,
            )
        return out

    def _sr_clip_staged(
        self, clip: np.ndarray, rng: jax.Array, *, return_device: bool = False
    ) -> np.ndarray:
        """One temporal chunk with on-device x4 upscale + internal VAE tiling.

        clip: [F, H, W, 3] np float32 in [-1, 1] at LQ resolution (the x4
        upscale runs inside enc_all). Returns [F, H*u, W*u, 3] in [0, 1].

        return_device=True returns the READY on-device uint8 clip instead of
        pulling it: the multi-chunk loop pulls it on a background thread so
        chunk k's host pull (the serial term on a relay-attached chip, ~0.7 s
        per 33-frame 720p chunk at the measured 63 MB/s) overlaps chunk
        k+1's device programs — the single-chip analog of the mesh path's
        pull/dispatch overlap below."""
        import os

        timing = bool(os.environ.get("DOVE_STAGE_TIMING"))
        t0 = time.time()
        fns = self._staged_fns()

        # Upload the tiny LQ clip; everything else (x4 upscale, windows,
        # feathered assembly, uint8 quantization) happens on device, and one
        # uint8 clip comes back. Transfer volume drops ~6x vs moving the
        # upscaled video + decoded tiles across the host boundary.
        lq = jnp.asarray(clip[None], self.dtype)
        prompt = self.prompt_embedding
        if self._serve_mesh is not None and self._serve_mesh.size > 1:
            # mesh serving of a SINGLE chunk: replicate the inputs so they
            # compose with the mesh-placed weights (windows shard over free
            # mesh axes; the DiT runs tensor-parallel over "model")
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self._serve_mesh, P())
            lq = jax.device_put(lq, rep)
            prompt = jax.device_put(prompt, rep)
        moments = fns["enc_all"](self.vae_params, lq)
        # Stage barriers are REQUIRED, not just for timing: with 10.4 GB of
        # resident DiT weights, a queued DiT program's temp allocation must
        # not overlap the encode program's still-live temps.
        self._barrier(moments)
        t1 = time.time()
        self.stage_times["enc"] = self.stage_times.get("enc", 0.0) + (t1 - t0)
        if timing:
            print(f"stage enc: {t1 - t0:.2f}s", file=sys.stderr, flush=True)

        z = fns["dit"](self.dit_params, prompt, moments, rng)
        self._barrier(z)
        t2 = time.time()
        self.stage_times["dit"] = self.stage_times.get("dit", 0.0) + (t2 - t1)
        if timing:
            print(f"stage dit: {t2 - t1:.2f}s", file=sys.stderr, flush=True)

        dec = fns["dec_all"](self.vae_params, z)
        if return_device:
            # barrier so the caller's background pull measures TRANSFER
            # only, and so the device timing here stays honest
            self._barrier(dec)
            t3 = time.time()
            self.stage_times["dec"] = self.stage_times.get("dec", 0.0) + (t3 - t2)
            if timing:
                print(f"stage dec/device: {t3 - t2:.2f}s", file=sys.stderr, flush=True)
            return dec
        if os.environ.get("DOVE_STAGE_TIMING") == "2":
            # split decode into device time vs host-pull time (the barrier
            # is one scalar pull — free)
            self._barrier(dec)
            t_dev = time.time()
            self.stage_times["dec_device"] = (
                self.stage_times.get("dec_device", 0.0) + (t_dev - t2)
            )
            print(f"stage dec/device: {t_dev - t2:.2f}s", file=sys.stderr, flush=True)
        out_u8 = self._parallel_get(dec)[0]
        t3 = time.time()
        self.stage_times["dec"] = self.stage_times.get("dec", 0.0) + (t3 - t2)
        if timing:
            print(f"stage dec: {t3 - t2:.2f}s", file=sys.stderr, flush=True)
        if self.output_uint8:
            return out_u8  # writers accept uint8 directly
        return out_u8.astype(np.float32) / 255.0

    def _staged_mesh_params(self, mesh):
        """Place the weights on a serving mesh (cached per mesh).

        VAE weights replicate; DiT weights replicate too unless the mesh has
        a "model" axis > 1, in which case they take the Megatron tensor-
        parallel layout (dove_tpu/parallel/tp.py) and self._dit_call becomes
        the shard_map TP forward every serving path routes through.

        The re-placed copies REPLACE self.*_params (keeping the originals
        committed to one device next to the replicas would double parameter
        residency there — a bf16 5B DiT alone would then exceed a v5e chip).
        Under donate_weights the reshard runs as a DONATED jit identity so
        XLA frees/aliases source buffers safely (a manual delete would
        corrupt shards that alias the source — e.g. the source device's own
        replica). The prompt is re-placed on every call: it is tiny and the
        inference CLI swaps it per video.
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        # equality, not identity: a caller building a fresh (but ==) Mesh
        # per clip must hit the cache — a miss re-places 5B-scale weights
        # and drops every compiled program
        if self._mesh_key != mesh:
            tp_n = mesh.shape.get("model", 1)
            if tp_n > 1:
                from dove_tpu.parallel import tp as tp_mod

                # clear ValueError (not a low-level device_put sharding
                # error) when the TP degree doesn't divide heads/widths —
                # library callers pass meshes directly, bypassing the CLIs;
                # validate BEFORE any weights move/donate
                tp_mod.validate_tp(self.config.dit, tp_n)
            if self.donate_weights:
                reshard = jax.jit(
                    lambda t: t, out_shardings=rep, donate_argnums=0
                )
            else:
                reshard = lambda t: jax.device_put(t, rep)
            self.vae_params = reshard(self.vae_params)
            if tp_n > 1:
                self.dit_params = tp_mod.shard_dit_tp(
                    self.dit_params, mesh, donate=self.donate_weights
                )
                self._dit_call = tp_mod.make_tp_dit(
                    mesh, self.config.dit,
                    attention_backend=self.attention_backend,
                    bounded_logits=True,
                )
            else:
                self.dit_params = reshard(self.dit_params)
                self._dit_call = None
            self._mesh_key = mesh
            self._serve_mesh = mesh
            # compiled programs trace against the mesh state (window
            # sharding, the TP dit_fn) — drop them so they rebuild
            self._staged = {}
            self._stream = {}
            self._compiled = {}
        prompt = jax.device_put(self.prompt_embedding, rep)
        return self.vae_params, self.dit_params, prompt

    def _sr_chunk_batch_staged(
        self, batch: np.ndarray, rng: jax.Array, mesh
    ) -> np.ndarray:
        """Temporal chunks in PARALLEL across a mesh's "data" axis.

        batch: [B, F, H, W, 3] np float32 in [-1, 1] (B chunks, same
        length); chunks are independent, so each chip runs the identical
        staged programs on its own chunk — zero model-internal collectives,
        wall time ~ one chunk. Returns the stacked uint8/I420 outputs."""
        import os

        timing = bool(os.environ.get("DOVE_STAGE_TIMING"))
        t0 = time.time()
        from jax.sharding import NamedSharding, PartitionSpec as P

        # mesh params FIRST: a mesh change drops the cached staged programs
        vae_p, dit_p, prompt = self._staged_mesh_params(mesh)
        fns = self._staged_fns()
        lq = jax.device_put(
            jnp.asarray(batch, self.dtype), NamedSharding(mesh, P("data"))
        )
        moments = fns["enc_all"](vae_p, lq)
        self._barrier(moments)
        t1 = time.time()
        self.stage_times["enc"] = self.stage_times.get("enc", 0.0) + (t1 - t0)
        z = fns["dit"](dit_p, prompt, moments, rng)
        self._barrier(z)
        t2 = time.time()
        self.stage_times["dit"] = self.stage_times.get("dit", 0.0) + (t2 - t1)
        dec = fns["dec_all"](vae_p, z)
        self._barrier(dec)
        t3 = time.time()
        self.stage_times["dec"] = self.stage_times.get("dec", 0.0) + (t3 - t2)
        if timing:
            print(
                f"mesh batch({batch.shape[0]}): enc {t1 - t0:.2f}s "
                f"dit {t2 - t1:.2f}s dec {t3 - t2:.2f}s", flush=True,
            )
        # DEVICE array: the caller overlaps this group's host pull with the
        # next group's dispatch (the pull is host-relay-bound — the N-chunk
        # output funnel through one host link is the mesh path's real
        # serial term, MULTICHIP.md "Host-bound correction").
        return dec

    def compiled_sr(self, shape: tuple) -> Callable:
        """jit-compiled sr_tile for a given [B, F, H, W, 3] tile shape."""
        if shape not in self._compiled:
            fn = jax.jit(
                self._sr_tile_fn(),
                donate_argnums=(3,) if self.donate_input else (),
            )
            self._compiled[shape] = fn
        return self._compiled[shape]

    # ------------------------------------------------------------------
    # Host-side driver for one clip
    # ------------------------------------------------------------------

    def process_frames(
        self,
        frames: np.ndarray,  # [F, H, W, 3] float32 in [0, 1] (LQ input)
        *,
        upscale: int | None = None,
        chunk_len: int = 0,
        tile_size_hw: tuple[int, int] = (0, 0),
        # None = defaults: 8 frames for the legacy chunk path (reference
        # default), the pipeline's dit_overlap_latents for streaming.
        # An EXPLICIT value (including 0) is honored by both paths.
        overlap_t: int | None = None,
        overlap_hw: tuple[int, int] = (32, 32),
        seed: int = 42,
        tile_batch: int = 1,
        mesh=None,
        upscale_mode: str = "bilinear",
    ) -> np.ndarray:
        """Full one-step SR of a clip -> [F, H*s, W*s, 3] float32 in [0, 1].

        tile_batch > 1 batches same-geometry tiles through one jitted call
        (throughput mode); with a mesh the batch is sharded over its "data"
        axis, so independent tiles run on independent chips with zero
        cross-chip communication (SURVEY.md §2.7's serving strategy).
        """
        upscale = self.config.upscale if upscale is None else upscale
        padded, (pad_f, pad_h, pad_w) = tiling.pad_video(frames)

        if (
            mesh is not None
            and mesh.shape.get("model", 1) > 1
            and not (self.vae_tiling and tuple(tile_size_hw) == (0, 0))
        ):
            # the fused outer-tile path only shards tile batches over
            # "data" — a silent idle model axis would misreport scaling
            raise ValueError(
                "a mesh 'model' axis (tensor parallelism) requires the "
                "staged path: vae_tiling=True without outer tiles"
            )

        if self.vae_tiling and tuple(tile_size_hw) == (0, 0):
            # Reference-default path: full-frame DiT, VAE handles memory.
            # The x4 upscale happens ON DEVICE inside the staged encode, so
            # only the tiny LQ clip crosses the host boundary.
            if upscale != self.config.upscale:
                raise ValueError(
                    "the staged (--is_vae_st) path upscales on device using "
                    "config.upscale; rebuild the pipeline config to change it"
                )
            import os as _os

            _timing = bool(_os.environ.get("DOVE_STAGE_TIMING"))
            self.stage_times = {}
            _t_pre = time.time()
            if mesh is not None and mesh.size > 1:
                # place weights on the mesh up front so EVERY staged route
                # below (single chunk included) serves distributed: spatial
                # windows shard over free axes, the DiT runs tensor-parallel
                # when the mesh has a "model" axis (parallel/tp.py)
                self._staged_mesh_params(mesh)
            lq = padded * 2.0 - 1.0  # [-1, 1] at LQ resolution
            F, Hl, Wl, _ = lq.shape
            H, W = Hl * upscale, Wl * upscale

            # Auto temporal chunking: a 720p-output pass budget of ~33 frames
            # keeps enc/dec temps (~3 GB each) inside HBM next to the 10.4 GB
            # resident DiT. Longer clips split into uniform overlapping
            # chunks; the clip is tail-padded so every chunk has the SAME
            # length (uniform stride -> exact-coverage trim works, and the
            # reference's merge-short-tail rule can't collapse the plan).
            MAX_FRAMES_PER_PASS = 33
            if (
                chunk_len == 0
                and MAX_FRAMES_PER_PASS < F
                and F <= self.stream_max_frames
                and self._stream_enabled(mesh)
            ):
                # Streaming segmented path: exact causal-cache handoff
                # across fixed-size segments (no VAE overlap recompute, no
                # decode seams); only the DiT runs on overlapping latent
                # windows. pad_video already padded to (F-1)%8==0, the
                # invariant plan_stream_segments' (F-1)%4==0 assert needs.
                assert tiling.next_valid_frames(F) == F, F
                data = lq
                if _timing:
                    print(f"stage pre: {time.time() - _t_pre:.2f}s", file=sys.stderr, flush=True)
                out = self._sr_clip_streamed(
                    data, jax.random.PRNGKey(seed),
                    # honor an explicit temporal-overlap request like the
                    # legacy auto-chunk path does: pixel overlap -> latent
                    # frames (4x temporal ratio), window shape unchanged
                    # (same compiled programs, different window count/trim);
                    # default to the pipeline's configured latent overlap
                    overlap_lat=(
                        None if overlap_t is None
                        else max(0, round(overlap_t / 4))
                    ),
                )[:F]
                out = _trim_output(out, pad_f, pad_h, pad_w, upscale)
                if not self.output_uint8:
                    return out.astype(np.float32) / 255.0
                return out
            if overlap_t is None:
                overlap_t = 8  # reference default (inference_script.py)
            if chunk_len == 0 and F > MAX_FRAMES_PER_PASS:
                chunk_len = MAX_FRAMES_PER_PASS
                logger.warning(
                    "staged path: auto temporal chunking %d frames into "
                    "%d-frame passes", F, chunk_len,
                )
            effective_ot = overlap_t if chunk_len > 0 else 0
            if chunk_len and chunk_len <= effective_ot:
                # same bar tiling.temporal_chunks enforces — fail here with
                # the clear message rather than a ZeroDivisionError below
                raise ValueError("chunk_len must be greater than overlap_t")
            extra_f = 0
            if chunk_len and F > chunk_len:
                import math as _math

                stride = chunk_len - effective_ot
                k = _math.ceil((F - chunk_len) / stride)
                f_ext = chunk_len + k * stride
                extra_f = f_ext - F
                if extra_f:
                    lq = np.concatenate(
                        [lq, np.repeat(lq[-1:], extra_f, axis=0)], axis=0
                    )
                F = f_ext
            chunks = tiling.temporal_chunks(F, chunk_len, effective_ot)
            rng = jax.random.PRNGKey(seed)
            if len(chunks) == 1:
                # fast path: no temporal stitching, no [C,F,H,W] transposes
                valid_nf = tiling.next_valid_frames(F)
                data = lq
                if valid_nf != F:
                    data = np.concatenate(
                        [data, np.repeat(data[-1:], valid_nf - F, axis=0)],
                        axis=0,
                    )
                if _timing:
                    print(f"stage pre: {time.time() - _t_pre:.2f}s", file=sys.stderr, flush=True)
                out = self._sr_clip_staged(data, rng)[:F]
                _t_post = time.time()
                if extra_f:
                    out = out[:-extra_f]
                out = _trim_output(out, pad_f, pad_h, pad_w, upscale)
                if _timing:
                    print(f"stage post: {time.time() - _t_post:.2f}s", file=sys.stderr, flush=True)
                return out
            def chunk_data(ts, te):
                data = lq[ts:te]
                nf = data.shape[0]
                valid_nf = tiling.next_valid_frames(nf)
                if valid_nf != nf:
                    data = np.concatenate(
                        [data, np.repeat(data[-1:], valid_nf - nf, axis=0)],
                        axis=0,
                    )
                return data, nf

            def chunk_out(ts, te, rng_key):
                data, nf = chunk_data(ts, te)
                return self._sr_clip_staged(data, rng_key)[:nf]

            n_par = mesh.shape.get("data", 1) if mesh is not None else 1

            def assemble_uint8(produced):
                """(ts, te) -> uint8 chunk pairs -> final trimmed clip.

                Temporal stitching is TRIM-based (write_count == 1), so
                chunks write straight into the preallocated output — no
                float roundtrip. Measured: the float Stitcher detour cost
                ~29 s host time on a 100-frame 720p clip (vs ~55 s device).
                """
                i420 = self.output_i420  # even dims guaranteed by padding
                Hf = H * 3 // 2 if i420 else H
                out_arr = np.empty(
                    (F, Hf, W) if i420 else (F, H, W, 3), np.uint8
                )
                covered = np.zeros(F, bool)
                for (ts, te), out in produced:
                    vr = tiling.valid_region(
                        tiling.Tile(ts, te, 0, Hf, 0, W), (F, Hf, W),
                        effective_ot, (0, 0),
                    )
                    out_arr[vr.dst[0]] = out[: te - ts][vr.src[0]]
                    covered[vr.dst[0]] = True
                if not covered.all():
                    raise RuntimeError("temporal chunk coverage gap")
                return _trim_output(
                    out_arr, pad_f + extra_f, pad_h, pad_w, upscale
                )

            if n_par > 1 and len(chunks) > 1:
                # Multi-chip serving of the production path: temporal chunks
                # shard over the mesh's "data" axis (uniform chunk plan ->
                # one geometry -> one compile). An N-chip mesh cuts a long
                # clip's wall time ~N-fold. The float/metrics path rides the
                # same uint8 trim-assembly (the decode stage quantizes to
                # uint8 regardless) and converts host-side at the end —
                # identical numerics to the sequential float path, which
                # also round-trips through uint8.
                def mesh_chunks():
                    nonlocal rng
                    # Pull/dispatch overlap: group g's decode output pulls
                    # on a background thread WHILE group g+1's programs run
                    # on the mesh (the stage barriers block the main
                    # thread, so the overlap needs its own thread; the DMA
                    # releases the GIL). The pull is the mesh path's serial
                    # term — all chunks' outputs funnel through ONE host
                    # link (MULTICHIP.md "Host-bound correction") — and
                    # this hides it behind device time for every group but
                    # the last.
                    from concurrent.futures import ThreadPoolExecutor

                    pending = None  # (group, pull_future, real_count)
                    with ThreadPoolExecutor(1) as pull_pool:
                        for g0 in range(0, len(chunks), n_par):
                            group = chunks[g0 : g0 + n_par]
                            datas = [chunk_data(ts, te)[0] for ts, te in group]
                            real = len(datas)
                            while len(datas) < n_par:  # pad the tail group
                                datas.append(datas[-1])
                            rng, step_rng = jax.random.split(rng)
                            dev = self._sr_chunk_batch_staged(
                                np.stack(datas), step_rng, mesh
                            )
                            fut = pull_pool.submit(self._parallel_get, dev)
                            if pending is not None:
                                pgroup, pfut, preal = pending
                                yield from zip(pgroup, pfut.result()[:preal])
                            pending = (group, fut, real)
                        pgroup, pfut, preal = pending
                        yield from zip(pgroup, pfut.result()[:preal])

                assembled = assemble_uint8(mesh_chunks())
                if not self.output_uint8:
                    return assembled.astype(np.float32) / 255.0
                return assembled

            if self.output_uint8:
                def seq_chunks():
                    nonlocal rng
                    # Single-chip pull/dispatch overlap (mesh_chunks'
                    # pattern): chunk k's uint8 output is READY when
                    # _sr_clip_staged(return_device=True) returns (stage
                    # barrier), so the background pull is pure host-link
                    # transfer and overlaps chunk k+1's device programs.
                    from concurrent.futures import ThreadPoolExecutor

                    def pull(dev, nf):
                        t0 = time.time()
                        out = self._parallel_get(dev)[0][:nf]
                        # only this thread writes the "pull" key
                        self.stage_times["pull"] = (
                            self.stage_times.get("pull", 0.0)
                            + (time.time() - t0)
                        )
                        return out

                    pending = None
                    with ThreadPoolExecutor(1) as pull_pool:
                        for ts, te in chunks:
                            rng, step_rng = jax.random.split(rng)
                            data, nf = chunk_data(ts, te)
                            dev = self._sr_clip_staged(
                                data, step_rng, return_device=True
                            )
                            fut = pull_pool.submit(pull, dev, nf)
                            if pending is not None:
                                yield pending[0], pending[1].result()
                            pending = ((ts, te), fut)
                        yield pending[0], pending[1].result()

                return assemble_uint8(seq_chunks())

            stitcher = tiling.Stitcher(3, F, H, W, effective_ot, (0, 0))
            for ts, te in chunks:
                rng, step_rng = jax.random.split(rng)
                out = chunk_out(ts, te, step_rng)
                if out.dtype == np.uint8:
                    out = out.astype(np.float32) / 255.0
                stitcher.add(
                    tiling.Tile(ts, te, 0, H, 0, W), out.transpose(3, 0, 1, 2)
                )
            result = stitcher.finalize()
            result = tiling.unpad_video(
                result, pad_f + extra_f, pad_h * upscale, pad_w * upscale
            )
            return result.transpose(1, 2, 3, 0)

        if overlap_t is None:
            overlap_t = 8  # reference default (inference_script.py)

        from dove_tpu import native

        if native.available() and upscale_mode == "bilinear":
            # multithreaded C++ upscale with the [-1,1] normalize fused in
            up = native.upscale_bilinear(padded, upscale, normalize=True)
        else:
            up = video_io.bilinear_upscale(padded, upscale, upscale_mode) * 2.0 - 1.0

        F, H, W, _ = up.shape

        tiles = tiling.plan_tiles(
            F, H, W, chunk_len, tile_size_hw, overlap_t, overlap_hw
        )
        effective_ot = overlap_t if chunk_len > 0 else 0
        geoms = tiling.tile_geometries(tiles)
        if mesh is not None:
            tile_batch = max(tile_batch, mesh.shape.get("data", 1))
        logger.info(
            "clip: %d frames %dx%d -> %d tiles (batch %d), %d geometries %s",
            F, H, W, len(tiles), tile_batch, len(geoms), sorted(geoms),
        )

        if native.available():
            stitcher = native.NativeStitcher(
                3, F, H, W, effective_ot, overlap_hw
            )
            to_stitch = lambda o: o  # native takes [f, h, w, C] directly
        else:
            stitcher = tiling.Stitcher(3, F, H, W, effective_ot, overlap_hw)
            to_stitch = lambda o: o.transpose(3, 0, 1, 2)
        rng = jax.random.PRNGKey(seed)

        def tile_data(t: tiling.Tile) -> tuple[np.ndarray, int]:
            data = up[t.t_start : t.t_end, t.h_start : t.h_end, t.w_start : t.w_end]
            # Causal-VAE frame rule: pad odd-length chunks (e.g. a merged
            # tail) up to the next roundtrip-exact length, trim after.
            nf = data.shape[0]
            valid_nf = tiling.next_valid_frames(nf)
            if valid_nf != nf:
                data = np.concatenate(
                    [data, np.repeat(data[-1:], valid_nf - nf, axis=0)], axis=0
                )
            return data, nf

        # Group same-shaped tiles so each geometry compiles once and batches.
        by_geom: dict[tuple, list[tiling.Tile]] = {}
        for t in tiles:
            by_geom.setdefault(t.shape, []).append(t)

        sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(mesh, P("data"))

        # Async dispatch: materialize batch k's result only after batch k+1
        # is enqueued, overlapping host stitching with device compute.
        pending: tuple | None = None

        def drain(p):
            out, batch_tiles, nfs, n_real = p
            out_np = self._parallel_get(out[:n_real]).astype(np.float32)
            for t, nf, o in zip(batch_tiles, nfs, out_np):
                stitcher.add(t, to_stitch(o[:nf]))

        for group in by_geom.values():
            for s in range(0, len(group), tile_batch):
                batch_tiles = group[s : s + tile_batch]
                arrays, nfs = zip(*(tile_data(t) for t in batch_tiles))
                n_real = len(arrays)
                if n_real < tile_batch and tile_batch > 1:
                    arrays = arrays + (arrays[-1],) * (tile_batch - n_real)
                batch = jnp.asarray(np.stack(arrays), self.dtype)
                if sharding is not None:
                    batch = jax.device_put(batch, sharding)
                rng, step_rng = jax.random.split(rng)
                fn = self.compiled_sr(batch.shape)
                out = fn(
                    self.dit_params, self.vae_params, self.prompt_embedding,
                    batch, step_rng,
                )
                if pending is not None:
                    drain(pending)
                pending = (out, batch_tiles, nfs, n_real)
        if pending is not None:
            drain(pending)

        result = stitcher.finalize()  # [3, F, H, W]
        result = tiling.unpad_video(result, pad_f, pad_h * upscale, pad_w * upscale)
        return result.transpose(1, 2, 3, 0)  # [F, H, W, 3]

    def process_video_file(
        self, path: str | Path, **kwargs
    ) -> np.ndarray:
        frames = video_io.read_video_frames(path)
        t0 = time.time()
        out = self.process_frames(frames, **kwargs)
        logger.info("processed %s in %.2fs", path, time.time() - t0)
        return out
