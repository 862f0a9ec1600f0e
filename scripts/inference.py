#!/usr/bin/env python
"""DOVE-TPU inference CLI — one-step 4x video super-resolution.

Mirrors the reference CLI surface (/root/reference/inference_script.py:506-554)
on the TPU-native pipeline:

    python scripts/inference.py \
        --input_dir datasets/demo --model_path <ckpt_dir> \
        --output_path results --tile_size_hw 384 384 --chunk_len 16

Without --model_path (or with --preset tiny) the pipeline runs with randomly
initialized weights — useful for smoke runs and benchmarking on machines
without the released checkpoints.
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from dove_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()  # default-on; DOVE_JAX_CACHE=off|path overrides


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="VSR using DOVE (TPU-native)")
    p.add_argument("--input_dir", type=str, required=True)
    p.add_argument("--input_json", type=str, default=None,
                   help="JSON {video_name: prompt}; non-empty prompts need a T5 checkpoint")
    p.add_argument("--gt_dir", type=str, default=None)
    p.add_argument("--eval_metrics", type=str, default="",
                   help="comma list, e.g. psnr,ssim")
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--lora_path", type=str, default=None)
    p.add_argument("--preset", type=str, default="cogvideox1.5-5b",
                   choices=["cogvideox1.5-5b", "cogvideox-2b", "tiny"])
    p.add_argument("--output_path", type=str, default="./results")
    p.add_argument("--fps", type=int, default=16)
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float16", "bfloat16", "float32"])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--upscale_mode", type=str, default="bilinear")
    p.add_argument("--upscale", type=int, default=4)
    p.add_argument("--noise_step", type=int, default=0)
    p.add_argument("--sr_noise_step", type=int, default=399)
    p.add_argument("--is_cpu_offload", action="store_true",
                   help="accepted for parity; TPU path relies on tiling instead")
    p.add_argument("--is_vae_st", action="store_true",
                   help="VAE slicing+tiling: full-frame DiT, feathered VAE "
                        "tiles handle memory (the reference's default mode)")
    p.add_argument("--png_save", action="store_true")
    p.add_argument(
        "--save_format", type=str, default="yuv444p",
        choices=["yuv444p", "yuv420p", "lossless"],
        help="yuv444p/yuv420p -> best available OpenCV mp4 encode (this "
             "environment has no ffmpeg/PyAV, so CRF/pix_fmt cannot be "
             "driven directly — reference writes x264 crf0 yuv444p; the "
             "encoder consumes yuv420, so mp4 runs pull device-side I420, "
             "half the host-link bytes); "
             "lossless -> FFV1/mkv, bit-exact round trip (the reference's "
             "lossless artifact; HuffYUV then PNG-frames fallback)",
    )
    p.add_argument("--tile_size_hw", type=int, nargs=2, default=(0, 0))
    p.add_argument("--overlap_hw", type=int, nargs=2, default=(32, 32))
    p.add_argument("--chunk_len", type=int, default=0)
    p.add_argument("--overlap_t", type=int, default=8)
    p.add_argument("--tile_batch", type=int, default=1,
                   help="batch same-geometry tiles through one device call")
    p.add_argument("--quantize", type=str, default=None,
                   choices=["int8", "int8-dit", "int8-vae", "int8w", "int8-dit-dec"],
                   help="int8 serving modes: per-channel int8 weights + "
                        "dynamic int8 activations. 'int8' quantizes DiT+VAE "
                        "(fastest); 'int8-dit'/'int8-vae' quantize one "
                        "component, 'int8w' stores int8 weights but computes "
                        "bf16 (weight-rounding drift only); each is one "
                        "component (drift/speed frontier points — see "
                        "docs/reports/QUANT_FRONTIER.md)")
    p.add_argument("--vae_calib", type=str, default=None,
                   help="npz of per-conv calibration stats "
                        "(scripts/int8_drift_report.py --calib_out): folds "
                        "SmoothQuant-style channel equalization — and, when "
                        "the npz carries #tapcorr entries, GPTQ tap-space "
                        "weight rounding — into the quantized VAE convs "
                        "(int8/int8-vae/int8-dit-dec)")
    p.add_argument("--vae_exclude", type=str, default="",
                   help="comma list of VAE conv names kept in bf16 inside a "
                        "quantized VAE (mixed precision), or the literal "
                        "'lowres' for the cost-aware below-full-res decoder "
                        "set (ops/quant.py lowres_decoder_exclusions)")
    p.add_argument("--data_parallel", type=int, default=0,
                   help="N-chip data mesh: shards tile batches (fused path) "
                        "or temporal chunks (staged --is_vae_st path) — "
                        "independent work, ~N-fold wall-time cut")
    p.add_argument("--tensor_parallel", type=int, default=0,
                   help="Megatron-style tensor parallelism for the DiT over "
                        "the mesh 'model' axis (staged --is_vae_st path "
                        "only): cuts SINGLE-clip latency, composes with "
                        "--data_parallel (mesh = data x model; spatial VAE "
                        "windows also shard over free mesh axes). Must "
                        "divide the DiT's head count / widths")
    p.add_argument("--streaming", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="long-clip streaming: contiguous segments with "
                        "causal conv caches threaded across calls (zero VAE "
                        "overlap recompute, no decode seams; only the DiT "
                        "windows temporally). auto = on for --quantize int8 "
                        "single-chip (bf16 keeps the reference-semantics "
                        "overlap-chunk path: its caches don't fit next to "
                        "the bf16 DiT on a 16 GB chip)")
    p.add_argument("--dec_window_cap", type=int, nargs=2, default=None,
                   metavar=("H", "W"),
                   help="cap the staged decode window (latents). HBM "
                        "headroom knob for processes running near the "
                        "chip's limit: decoder temps shrink ~linearly with "
                        "window area at the cost of a little extra "
                        "feather-overlap compute (docs/DESIGN.md §2)")
    return p


def load_pipeline(args):
    import dataclasses

    from dove_tpu import config as cfg_mod
    from dove_tpu.pipeline import DovePipeline

    dtype = {"float16": jnp.float16, "bfloat16": jnp.bfloat16,
             "float32": jnp.float32}[args.dtype]

    if args.model_path:
        cfg = cfg_mod.pipeline_config_from_pretrained(args.model_path)
    elif args.preset == "tiny":
        cfg = cfg_mod.tiny_test()
    elif args.preset == "cogvideox-2b":
        cfg = cfg_mod.cogvideox_2b()
    else:
        cfg = cfg_mod.cogvideox1_5_5b()
    cfg = dataclasses.replace(
        cfg, sr_noise_step=args.sr_noise_step, noise_step=args.noise_step,
        upscale=args.upscale,
    )

    if args.model_path:
        from dove_tpu import weights

        dit_params = weights.load_dit(args.model_path, cfg.dit, dtype)
        if args.lora_path:
            lora_file = Path(args.lora_path)
            if lora_file.is_dir():
                lora_file = lora_file / "pytorch_lora_weights.safetensors"
            from safetensors import safe_open

            with safe_open(str(lora_file), framework="np") as fp:
                lora = {k: fp.get_tensor(k) for k in fp.keys()}
            dit_params = weights.fuse_lora_into_dit(dit_params, lora)
            logging.info("fused LoRA weights from %s", lora_file)
        vae_params = weights.load_vae(args.model_path, cfg.vae, dtype)
    else:
        logging.warning(
            "no --model_path: zero weights, %s preset (smoke/bench mode; "
            "random 5B init would need RNG temp buffers beyond chip HBM)",
            args.preset,
        )
        from dove_tpu.models.dit import init_dit_params
        from dove_tpu.models.vae import init_vae_params

        key = jax.random.PRNGKey(0)
        if args.preset == "tiny":
            dit_params = init_dit_params(key, cfg.dit, dtype)
            vae_params = init_vae_params(jax.random.fold_in(key, 1), cfg.vae, dtype)
        else:
            zeros = lambda shapes: jax.tree.map(
                lambda x: jnp.zeros(x.shape, x.dtype), shapes
            )
            dit_params = zeros(jax.eval_shape(
                lambda k: init_dit_params(k, cfg.dit, dtype), key))
            vae_params = zeros(jax.eval_shape(
                lambda k: init_vae_params(k, cfg.vae, dtype), key))

    # Empty-prompt embedding: the shipped cache bypasses the T5 encoder.
    emb_path = Path("pretrained_models/prompt_embeddings/"
                    "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855.safetensors")
    candidates = [emb_path, Path("/root/reference") / emb_path]
    prompt_embedding = None
    for c in candidates:
        if c.exists():
            from dove_tpu.weights import load_prompt_embedding

            emb = load_prompt_embedding(c, dtype)
            if emb.shape[-1] == cfg.dit.text_embed_dim:
                prompt_embedding = emb[: cfg.dit.max_text_seq_length]
                logging.info("loaded empty-prompt embedding from %s", c)
            break
    if prompt_embedding is None:
        prompt_embedding = jnp.zeros(
            (cfg.dit.max_text_seq_length, cfg.dit.text_embed_dim), dtype
        )

    return DovePipeline(
        config=cfg, dit_params=dit_params, vae_params=vae_params,
        prompt_embedding=prompt_embedding, dtype=dtype,
        vae_tiling=args.is_vae_st,
        quantize=args.quantize,
        vae_exclude=tuple(
            n for n in args.vae_exclude.split(",") if n.strip()
        ),
        vae_calib=(
            {k: jnp.asarray(v) for k, v in np.load(args.vae_calib).items()}
            if args.vae_calib else None
        ),
        # writers take uint8 directly; keep float when metrics need [0,1]
        output_uint8=args.is_vae_st and not args.eval_metrics,
        # For plain mp4 output the H.264 encoder consumes yuv420 anyway, so
        # pull planar I420 from the device (half the bytes). RGB is kept for
        # PNG/lossless outputs and whenever inline metrics need it.
        output_i420=(
            args.is_vae_st and not args.eval_metrics and not args.png_save
            and args.save_format != "lossless"
        ),
        streaming={"auto": "auto", "on": True, "off": False}[args.streaming],
        dec_window_cap=(
            tuple(args.dec_window_cap) if args.dec_window_cap else None
        ),
    )


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)

    from dove_tpu.eval.metrics import MetricAccumulator
    from dove_tpu.io import video as video_io

    videos = video_io.list_videos(args.input_dir)
    if not videos:
        raise SystemExit(f"No video files found in {args.input_dir}")

    out_dir = Path(args.output_path)
    out_dir.mkdir(parents=True, exist_ok=True)

    pipe = load_pipeline(args)

    if args.gt_dir and not args.png_save and args.save_format != "lossless":
        logging.warning(
            "--gt_dir with --save_format %s: the written mp4 is LOSSY "
            "(OpenCV cannot drive x264 CRF), so file-based re-evaluation "
            "(scripts/eval_metrics.py) on these outputs under-reports "
            "quality vs the reference's crf0 workflow. Inline --eval_metrics "
            "use the exact float frames; for exact files use "
            "--save_format lossless (FFV1/mkv) or --png_save.",
            args.save_format,
        )

    metric_names = [m.strip() for m in args.eval_metrics.split(",") if m.strip()]
    accumulator = MetricAccumulator(metric_names) if metric_names else None

    from concurrent.futures import ThreadPoolExecutor

    save_pool = ThreadPoolExecutor(max_workers=1)
    save_futures = []

    mesh = None
    if args.tensor_parallel > 1:
        if not args.is_vae_st:
            raise SystemExit(
                "--tensor_parallel serves the staged path; add --is_vae_st"
            )
        from dove_tpu.parallel.mesh import make_mesh
        from dove_tpu.parallel.tp import validate_tp

        validate_tp(pipe.config.dit, args.tensor_parallel)
        mesh = make_mesh(
            data=max(1, args.data_parallel), model=args.tensor_parallel
        )
        # weight placement (TP DiT shardings + replicated VAE) happens in
        # the pipeline's _staged_mesh_params on first use
    elif args.data_parallel > 1:
        from dove_tpu.parallel.mesh import make_mesh, shard_params

        mesh = make_mesh(data=args.data_parallel, model=1)
        pipe.dit_params = shard_params(pipe.dit_params, mesh)
        pipe.vae_params = shard_params(pipe.vae_params, mesh)

    prompt_map = {}
    prompt_encoder = None
    if args.input_json:
        prompt_map = json.loads(Path(args.input_json).read_text())
        if any(prompt_map.values()) and args.model_path and (
            Path(args.model_path) / "text_encoder"
        ).exists():
            from dove_tpu.models.t5 import PromptEncoder

            prompt_encoder = PromptEncoder(
                args.model_path, max_length=pipe.config.dit.max_text_seq_length
            )

    default_prompt_embedding = pipe.prompt_embedding
    for vpath in videos:
        prompt = prompt_map.get(vpath.name, prompt_map.get(vpath.stem, ""))
        if prompt and prompt_encoder is not None:
            pipe.prompt_embedding = jnp.asarray(prompt_encoder(prompt), pipe.dtype)
        else:
            if prompt:
                logging.warning(
                    "prompt for %s ignored (no text_encoder in --model_path)",
                    vpath.name,
                )
            pipe.prompt_embedding = default_prompt_embedding
        t0 = time.time()
        try:
            out = pipe.process_video_file(
                vpath,
                upscale=args.upscale,
                chunk_len=args.chunk_len,
                tile_size_hw=tuple(args.tile_size_hw),
                overlap_t=args.overlap_t,
                overlap_hw=tuple(args.overlap_hw),
                seed=args.seed,
                tile_batch=args.tile_batch,
                mesh=mesh,
                upscale_mode=args.upscale_mode,
            )
        except Exception as e:  # noqa: BLE001 - re-raised below
            msg = str(e)
            if "memory" in msg.lower() and "hbm" in msg.lower():
                logging.error(
                    "%s: device out of HBM. The fused path keeps full decoder "
                    "activations resident; for large clips use --is_vae_st "
                    "(staged, VAE-tiled — the production 720p path) or add "
                    "spatial tiling, e.g. --tile_size_hw 256 256.", vpath.name,
                )
            raise
        dt = time.time() - t0
        logging.info("%s: %s in %.2fs (%.2f frames/s)",
                     vpath.name, out.shape, dt, out.shape[0] / dt)

        if accumulator is not None:
            gt = None
            if args.gt_dir:
                gt = video_io.load_sequence(Path(args.gt_dir) / vpath.name)
            accumulator.add(vpath.name, out, gt)

        # overlap the (host-only) encode/write of this clip with the next
        # clip's device work
        if args.png_save:
            save_futures.append(save_pool.submit(
                video_io.save_frames_as_png, out, out_dir / vpath.stem
            ))
        elif args.save_format == "lossless":
            # FFV1/mkv — bit-exact round trip (the reference's lossless
            # artifact); falls back to HuffYUV, then PNG frames
            save_futures.append(save_pool.submit(
                video_io.save_video_lossless, out,
                out_dir / (vpath.stem + ".mkv"), args.fps,
            ))
        else:
            save_futures.append(save_pool.submit(
                video_io.save_video, out, out_dir / (vpath.stem + ".mp4"),
                args.fps,
                # explicit: the pipeline may fall back to RGB on odd dims
                "i420" if (pipe.output_i420 and out.ndim == 3) else "rgb",
            ))

    if accumulator is not None:
        summary = accumulator.summary()
        print("\n=== Overall Average Metrics ===")
        for name, val in summary["average"].items():
            print(f"{name.upper()}: {val:.4f}")
        out_name = "metrics_" + "_".join(metric_names) + ".json"
        (out_dir / out_name).write_text(json.dumps(summary, indent=2))

    save_pool.shutdown(wait=True)
    # surface write failures (codec error, disk full, bad path): shutdown()
    # alone swallows exceptions and would report success with missing clips
    for fut in save_futures:
        fut.result()
    print("All videos processed.")


if __name__ == "__main__":
    main()
