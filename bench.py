#!/usr/bin/env python
"""Benchmark: one-step 4x VSR throughput of the flagship pipeline on TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Scenario matches the reference's headline benchmark (BASELINE.md +
inference.sh): a UDM10-style clip (32 frames, 180x320 LQ -> 720x1280 output)
through the reference-default mode — full-frame one-step DiT with internal
feathered VAE tiling (--is_vae_st), no outer tiles. Baseline: DOVE runs one
clip in 14.90 s on A100-class GPU; vs_baseline = baseline_time / our_time
(>1 is faster than the reference).

Weights are zeros (no released checkpoint in this environment) — identical
compute/memory profile to real weights.

Flags: --tiny runs the tiny config on CPU as a smoke test.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache — DEFAULT ON (round-5: measured to work over
# this remote-compile tunnel; DOVE_JAX_CACHE=off disables, =path relocates).
# Cold 5B compiles cost ~17 min (BENCH_r04); a warm cache is disk reads.
import os as _os

# Record the decode device-vs-pull split in every bench run: the relay
# link's weather swings the headline by ±2 s run to run (docs/DESIGN.md
# §9); detail.stage_seconds.dec_device makes the captured number
# interpretable without a re-run. The barrier it adds is one scalar pull.
_os.environ.setdefault("DOVE_STAGE_TIMING", "2")

from dove_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

BASELINE_CLIP_SECONDS = 14.90  # DOVE on A100-class GPU (BASELINE.md)


def require_backend(timeout_s: int = 240) -> None:
    """Fail fast (one explanatory JSON line) if the TPU backend is down.

    When the relay tunnel behind the axon backend drops, jax.devices()
    HANGS on connection retries instead of erroring — a bare bench run
    would block forever. Probe device discovery on a daemon thread and
    bail with a parseable record if it does not come up.
    """
    import threading

    result = {}

    def probe():
        try:
            result["devices"] = [str(d) for d in jax.devices()]
        except Exception as e:  # pragma: no cover - infra failure path
            result["error"] = str(e)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" not in result:  # pragma: no cover - infra failure path
        print(json.dumps({
            "metric": "one_step_4x_vsr_clip_seconds",
            "value": None,
            "unit": "TPU backend unavailable — no measurement",
            "vs_baseline": None,
            "error": result.get(
                "error", f"backend init did not complete in {timeout_s}s "
                "(relay tunnel down?); see docs/reports/BENCH_r03_onchip"
                ".jsonl for the round's recorded on-chip runs"
            ),
        }))
        sys.exit(1)


def zeros_tree(shapes):
    return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)


def build_pipeline(preset: str, vae_tiling: bool = True, quantize: str | None = None,
                   exclude: tuple[str, ...] = ()):
    from dove_tpu.config import cogvideox1_5_5b, cogvideox_2b, tiny_test
    from dove_tpu.models.dit import init_dit_params
    from dove_tpu.models.vae import init_vae_params
    from dove_tpu.pipeline import DovePipeline

    tiny = preset == "tiny"
    cfg = {"tiny": tiny_test, "cogvideox1.5-5b": cogvideox1_5_5b,
           "cogvideox-2b": cogvideox_2b}[preset]()
    dtype = jnp.float32 if tiny else jnp.bfloat16
    dit_shapes = jax.eval_shape(lambda k: init_dit_params(k, cfg.dit, dtype),
                                jax.random.PRNGKey(0))
    vae_shapes = jax.eval_shape(lambda k: init_vae_params(k, cfg.vae, dtype),
                                jax.random.PRNGKey(1))
    prompt = jnp.zeros((cfg.dit.max_text_seq_length, cfg.dit.text_embed_dim), dtype)
    vae_params = zeros_tree(vae_shapes)
    # VAE-quantizing modes bench the EQUALIZED serving program (SmoothQuant
    # calibration is how they are served — docs/reports/QUANT_FRONTIER.md);
    # unit stats compile the identical op graph as real stats, so the
    # measured seconds transfer (ops/quant.py:synthetic_vae_calib).
    vae_calib = None
    if quantize in ("int8", "int8-vae", "int8-dit-dec") and not _os.environ.get(
        "DOVE_BENCH_NO_CALIB"
    ):  # env: A/B the unequalized program (perf bisection)
        from dove_tpu.ops.quant import synthetic_vae_calib

        vae_calib = synthetic_vae_calib(vae_params)
    return DovePipeline(
        config=cfg,
        dit_params=zeros_tree(dit_shapes),
        vae_params=vae_params,
        prompt_embedding=prompt,
        dtype=dtype,
        vae_tiling=vae_tiling,
        quantize=quantize,
        vae_calib=vae_calib,
        vae_exclude=exclude,
        output_uint8=vae_tiling,  # measure through to the writable artifact
        # the written artifact is a yuv420 mp4: pull planar I420 (half bytes)
        output_i420=vae_tiling,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU smoke run")
    ap.add_argument("--preset", default="cogvideox1.5-5b",
                    choices=["cogvideox1.5-5b", "cogvideox-2b", "tiny"])
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--height", type=int, default=180, help="LQ input height")
    ap.add_argument("--width", type=int, default=320, help="LQ input width")
    ap.add_argument("--chunk_len", type=int, default=0)
    ap.add_argument("--tile", type=int, nargs=2, default=(0, 0))
    ap.add_argument("--no_vae_tiling", action="store_true",
                    help="use the outer pixel-space tiler instead")
    ap.add_argument("--repeats", type=int, default=5,
                    help="timed passes; the JSON reports the min (decode "
                         "drifts downward over the first passes on the "
                         "tunneled chip — take the min of >=4 before "
                         "concluding anything)")
    ap.add_argument("--tile_batch", type=int, default=1)
    ap.add_argument("--profile", type=str, default=None,
                    help="write a jax.profiler trace to this directory")
    ap.add_argument("--quantize", type=str, default="int8-dit",
                    choices=["int8", "int8-dit", "int8-vae", "int8w", "int8-dit-dec", "none"],
                    help="serving mode to bench. Default int8-dit — the "
                         "RECOMMENDED serving config (int8 W8A8 DiT + qk8 "
                         "flash attention, bf16 VAE): quality-safe on BOTH "
                         "synthetic weight families (49.1/48.9 dB drift) "
                         "and the fastest measured quality-safe point — "
                         "the int8-decoder modes' runtime quality "
                         "machinery currently eats their conv-rate gains "
                         "(measured same-window: docs/reports/"
                         "QUANT_FRONTIER.md). int8 / int8-vae / int8w / "
                         "int8-dit-dec bench the other frontier points; "
                         "'none' benches the bf16 bit-parity path")
    ap.add_argument("--exclude", type=str, default=None,
                    help="comma-separated VAE conv names kept in bf16, or "
                         "'lowres' (the cost-aware below-full-res decoder "
                         "set). Default: 'lowres' when --quantize "
                         "int8-dit-dec (that mode's measured frontier "
                         "point), empty otherwise")
    ap.add_argument("--row100", dest="row100", action="store_true",
                    default=None,
                    help="also measure the 100-frame long-clip row "
                         "(BASELINE.md north star: <10 s/chip) and embed "
                         "it as detail.row_100frames. Default: on for the "
                         "flagship preset at the headline geometry")
    ap.add_argument("--no-row100", dest="row100", action="store_false")
    ap.add_argument("--row100_repeats", type=int, default=3)
    ap.add_argument("--data_parallel", type=int, default=1,
                    help="multi-chip mesh 'data' axis (temporal chunks / "
                         "spatial windows shard); needs that many devices")
    ap.add_argument("--tensor_parallel", type=int, default=1,
                    help="multi-chip mesh 'model' axis (Megatron DiT TP, "
                         "parallel/tp.py); needs data*model devices")
    args = ap.parse_args()
    if args.exclude is None:
        args.exclude = "lowres" if args.quantize == "int8-dit-dec" else ""

    if args.tiny:
        args.preset = "tiny"
        args.frames, args.height, args.width = 9, 32, 32
        args.chunk_len, args.tile = 0, (0, 0)
        # --tiny is the CPU smoke: force the platform in-process (the site
        # plugin ignores JAX_PLATFORMS env, and the axon backend HANGS when
        # its relay tunnel is down). Must run before first backend use.
        jax.config.update("jax_platforms", "cpu")
    else:
        require_backend()

    pipe = build_pipeline(
        args.preset, vae_tiling=not args.no_vae_tiling,
        quantize=None if args.quantize == "none" else args.quantize,
        exclude=tuple(n for n in args.exclude.split(",") if n.strip()),
    )

    mesh = None
    n_mesh = args.data_parallel * args.tensor_parallel
    if args.tensor_parallel > 1 and args.no_vae_tiling:
        # fused outer-tile path only shards the tile batch over "data"; a
        # model axis would sit idle while the JSON reported N-chip scaling
        # (inference.py guards the same combination)
        ap.error("--tensor_parallel serves the staged (VAE-tiling) path; "
                 "drop --no_vae_tiling")
    if n_mesh > 1:
        from dove_tpu.parallel.mesh import make_mesh

        have = len(jax.devices())
        if have < n_mesh:
            print(json.dumps({
                "metric": "one_step_4x_vsr_clip_seconds", "value": None,
                "unit": f"{n_mesh}-chip mesh requested, {have} devices",
                "vs_baseline": None,
            }))
            sys.exit(1)
        if args.tensor_parallel > 1:
            from dove_tpu.parallel.tp import validate_tp

            validate_tp(pipe.config.dit, args.tensor_parallel)
        mesh = make_mesh(data=args.data_parallel, model=args.tensor_parallel)

    rng = np.random.default_rng(0)
    frames = rng.random((args.frames, args.height, args.width, 3), np.float32)

    # Warm-up pass: compiles every tile geometry.
    t0 = time.time()
    out = pipe.process_frames(
        frames,
        chunk_len=args.chunk_len,
        tile_size_hw=tuple(args.tile),
        tile_batch=args.tile_batch,
        mesh=mesh,
    )
    compile_and_first = time.time() - t0

    # Timed passes (compiled).
    import contextlib

    profile_ctx = (
        jax.profiler.trace(args.profile) if args.profile
        else contextlib.nullcontext()
    )
    times = []
    stage_splits = []
    with profile_ctx:
        for _ in range(args.repeats):
            t0 = time.time()
            out = pipe.process_frames(
                frames,
                chunk_len=args.chunk_len,
                tile_size_hw=tuple(args.tile),
                tile_batch=args.tile_batch,
                mesh=mesh,
            )
            times.append(time.time() - t0)
            stage_splits.append(dict(pipe.stage_times))
            if _os.environ.get("DOVE_STAGE_TIMING"):
                print(f"repeat total: {times[-1]:.2f}s", file=sys.stderr, flush=True)
    best = int(np.argmin(times))
    clip_seconds = times[best]
    stage_split = {k: round(v, 2) for k, v in stage_splits[best].items()}

    # Standing long-clip row (VERDICT r4 item 3): the 100-frame clip is the
    # BASELINE.md north-star geometry (<10 s/chip). Measured through the
    # streaming segmented path (process_frames auto-streams past 33 frames).
    row100 = None
    if args.row100 is None:
        args.row100 = (args.preset == "cogvideox1.5-5b" and args.frames == 32
                       and not args.tiny and tuple(args.tile) == (0, 0))
    if args.row100:
        frames100 = rng.random((100, args.height, args.width, 3), np.float32)
        t0 = time.time()
        out100 = pipe.process_frames(
            frames100, chunk_len=args.chunk_len,
            tile_size_hw=tuple(args.tile), tile_batch=args.tile_batch,
            mesh=mesh,
        )
        first100 = time.time() - t0
        t100, splits100 = [], []
        for _ in range(args.row100_repeats):
            t0 = time.time()
            out100 = pipe.process_frames(
                frames100, chunk_len=args.chunk_len,
                tile_size_hw=tuple(args.tile), tile_batch=args.tile_batch,
                mesh=mesh,
            )
            t100.append(time.time() - t0)
            splits100.append(dict(pipe.stage_times))
        b100 = int(np.argmin(t100))
        row100 = {
            "metric": "one_step_4x_vsr_100frame_seconds",
            "value": round(t100[b100], 3),
            "unit": f"s per 100-frame {args.height * 4}x{args.width * 4} "
                    f"clip ({n_mesh} chip{'s' if n_mesh > 1 else ''})",
            "north_star_s_per_chip": 10.0,
            "vs_north_star": round(10.0 / t100[b100], 3),
            "stage_seconds": {k: round(v, 2)
                              for k, v in splits100[b100].items()},
            "all_repeats_s": [round(t, 2) for t in t100],
            "first_pass_with_compile_s": round(first100, 2),
            "output_shape": list(out100.shape),
        }

    out_frames = out.shape[0]
    fps = out_frames / clip_seconds
    result = {
        "metric": "one_step_4x_vsr_clip_seconds",
        "value": round(clip_seconds, 3),
        "unit": f"s per {args.frames}-frame {args.height * 4}x{args.width * 4} clip "
                f"({n_mesh} chip{'s' if n_mesh > 1 else ''})",
        "vs_baseline": round(BASELINE_CLIP_SECONDS / clip_seconds, 3),
        "detail": {
            "frames_per_second": round(fps, 2),
            "seconds_per_100_frames": round(100.0 / fps, 2),
            "first_pass_with_compile_s": round(compile_and_first, 2),
            "stage_seconds": stage_split,  # enc/dit/dec split (staged path)
            "all_repeats_s": [round(t, 2) for t in times],
            "output_shape": list(out.shape),
            "output_format": (
                "i420_uint8" if out.ndim == 3 else "rgb"
            ),
            "device": str(jax.devices()[0]),
            "preset": args.preset,
            "quantize": args.quantize,
            "vae_exclude": [n for n in args.exclude.split(",") if n.strip()],
            "mesh": {"data": args.data_parallel, "model": args.tensor_parallel}
                    if mesh is not None else None,
            "row_100frames": row100,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
