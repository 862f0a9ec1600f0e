#!/usr/bin/env python
"""AOT HBM accounting for the staged serving programs (no execution).

Compiles enc_all / dit / dec_all for the headline 720p geometry and prints
each program's argument + temp HBM from compile().memory_analysis() — the
cheap way to validate tile budgets before a 20-minute bench run.

    python scripts/probe_memory.py [--quantize int8] [--frames 33]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def fmt(n):
    return f"{n / (1 << 30):.2f}G"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quantize", default=None,
                    choices=["int8", "int8-dit", "int8-vae", "int8w",
                             "int8-dit-dec"])
    ap.add_argument("--exclude", type=str, default="",
                    help="comma list of VAE convs kept bf16 (or 'lowres')")
    ap.add_argument("--frames", type=int, default=33)
    ap.add_argument("--height", type=int, default=180)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--dec_cap", type=int, nargs=2, default=None,
                    help="probe a candidate decode-window cap (latents)")
    args = ap.parse_args()

    import bench as bench_mod

    pipe = bench_mod.build_pipeline(
        "cogvideox1.5-5b", vae_tiling=True, quantize=args.quantize,
        exclude=tuple(n for n in args.exclude.split(",") if n.strip()),
    )
    if args.dec_cap:
        # direct field set (dataclasses.replace would re-run __post_init__
        # and double-quantize); read at trace time in _window_budget
        pipe.dec_window_cap = tuple(args.dec_cap)
    params_bytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves((pipe.dit_params, pipe.vae_params))
    )
    print(f"resident params: {fmt(params_bytes)}")

    fns = pipe._staged_fns()
    cfg = pipe.config
    F, H, W = args.frames, args.height, args.width
    Fl = cfg.vae.latent_frames(F)
    h, w = H * cfg.upscale // 8, W * cfg.upscale // 8

    lq = jax.ShapeDtypeStruct((1, F, H, W, 3), pipe.dtype)
    vae_shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), pipe.vae_params
    )
    dit_shapes = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), pipe.dit_params
    )
    prompt = jax.ShapeDtypeStruct(pipe.prompt_embedding.shape, pipe.dtype)
    moments = jax.ShapeDtypeStruct((1, Fl, h, w, 2 * cfg.vae.latent_channels),
                                   pipe.dtype)
    z = jax.ShapeDtypeStruct((1, Fl, h, w, cfg.vae.latent_channels), pipe.dtype)
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)

    for name, fn, shapes in (
        ("enc_all", fns["enc_all"], (vae_shapes, lq)),
        ("dit", fns["dit"], (dit_shapes, prompt, moments, rng)),
        ("dec_all", fns["dec_all"], (vae_shapes, z)),
    ):
        compiled = fn.lower(*shapes).compile()
        m = compiled.memory_analysis()
        if m is None:
            print(f"{name}: memory_analysis unavailable")
            continue
        print(
            f"{name}: args {fmt(m.argument_size_in_bytes)}  "
            f"temp {fmt(m.temp_size_in_bytes)}  "
            f"output {fmt(m.output_size_in_bytes)}  "
            f"total {fmt(m.argument_size_in_bytes + m.temp_size_in_bytes + m.output_size_in_bytes)}"
        )


if __name__ == "__main__":
    main()
