#!/usr/bin/env python
"""Quantized-vs-bf16 serving drift at full model scale (VERDICT r2 item 3,
r3 item 6: distribution-matched weights + per-stage qk8 attribution, and the
r3 item 2 drift/speed frontier's quality axis).

The headline bench runs the int8 W8A8 serving mode; this tool quantifies
each quantize mode's quality cost END TO END at the flagship scale:

  1. generates REALISTIC-MAGNITUDE synthetic weights deterministically,
     leaf by leaf on device (generating via init_* directly would need fp32
     RNG temp buffers beyond chip HBM at 5B). Two families:
       --weights gaussian  fan-in-scaled normals (init statistics);
       --weights outlier   CONSERVATIVE trained-checkpoint proxy: Student-t
                           (df=4) heavy-tailed entries x log-normal
                           per-output-channel gains (sigma=0.6), unit total
                           variance. Trained transformers carry outlier
                           channels (LLM.int8() / SmoothQuant observations);
                           per-channel weight scales absorb the weight-side
                           spread, but the heavy channels drive outlier
                           ACTIVATIONS downstream, which is exactly what
                           per-tensor/per-row dynamic activation scales pay
                           for — so this family stresses the scheme HARDER
                           than a real checkpoint's mostly-Gaussian bulk.
  2. runs the staged pipeline's three stages (enc_all / dit / dec_all) on a
     fixed fixture clip and dumps the stage outputs (moments, x0 latent,
     uint8 pixels) to an .npz;
  3. in a second run with --mode <quantized> --compare <bf16.npz>, reports
     per-stage relative error and end-to-end PSNR(mode, bf16) over the
     uint8 outputs, as JSON.

Modes: int8 (DiT+VAE), int8-dit, int8-vae, int8w (weight-only W8A16) —
the frontier's mixed points.
--attention flash forces bf16 attention inside an int8/int8-dit run, so
(int8 vs int8@flash) isolates the flash-qk8 attention kernel's share of the
DiT stage drift.

Caveat (documented, not hidden): neither weight family IS the released
checkpoint — none exists in this environment. Use
scripts/parity_dump_torch.py on a weights-bearing machine to dump real
per-tensor stats, and the bf16 path remains the bit-parity reference
(ops/quant.py). The int8 run is forced onto the bf16 mode's VAE window plan
(see build_pipe) so the numbers isolate quantization: with untrained random
weights, per-window GroupNorm statistics make the window geometry itself
the dominant output difference (measured 22.5 dB Y-PSNR when comparing
across the two modes' native window plans — a number about random
projections, not about int8).

Usage (two processes — the bf16 and int8 trees cannot co-reside in 16 GB):
  python scripts/int8_drift_report.py --mode bf16 --out /tmp/drift_bf16.npz
  python scripts/int8_drift_report.py --mode int8 --compare /tmp/drift_bf16.npz \
      --report docs/reports/INT8_DRIFT.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache, default-on (same contract as bench.py): the
# sweep runs one process per mode (HBM: bf16 + int8 trees cannot co-reside),
# so without this every process pays the full 5B compile again.
from dove_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()


def _outlier_leaf(key, shape, fan_in: float, dtype):
    """Heavy-tailed entries x per-output-channel gains, unit total variance.

    Entries ~ Student-t(df=4) (variance df/(df-2) = 2, normalized out);
    per-output-channel gains ~ LogNormal(0, 0.6^2), normalized to unit mean
    square IN the leaf (so the leaf's overall scale still matches init
    statistics and forward activations stay bounded). The result: every
    tensor has a few channels ~4-6x the median channel scale and entry
    kurtosis >> 3 — the activation-outlier regime that per-tensor dynamic
    quantization pays for (script header, weights family rationale).
    """
    kt, kg = jax.random.split(key)

    # Student-t(4) synthesized as Z / sqrt(chi2_4 / 4) with
    # chi2_4 = -2 ln(U1 U2) (sum of two Exp(2) draws). jax.random.t's
    # rejection-sampling gamma kernel CRASHES the remote TPU compiler at
    # 5B stacked-leaf shapes (HTTP 500 from tpu_compile_helper, measured);
    # this closed form compiles to elementwise ops. Stacked [L, in, out]
    # leaves generate per layer under lax.map so the 3 RNG temp buffers
    # stay at one layer's footprint (a direct 3.2 GB bf16 leaf would need
    # ~16 GB of uniform/normal temps).
    def t4(k, s):
        kz, k1, k2 = jax.random.split(k, 3)
        z = jax.random.normal(kz, s, dtype)
        u1 = jax.random.uniform(k1, s, jnp.float32, 1e-7, 1.0)
        u2 = jax.random.uniform(k2, s, jnp.float32, 1e-7, 1.0)
        inv = jax.lax.rsqrt(-0.5 * (jnp.log(u1) + jnp.log(u2)))
        return z * inv.astype(dtype)

    if len(shape) >= 3:
        t = jax.lax.map(lambda k: t4(k, shape[1:]),
                        jax.random.split(kt, shape[0]))
    else:
        t = t4(kt, shape)
    t = t * jnp.asarray((fan_in * 2.0) ** -0.5, dtype)
    gains = jnp.exp(0.6 * jax.random.normal(kg, (shape[-1],), jnp.float32))
    gains = (gains / jnp.sqrt(jnp.mean(gains**2))).astype(dtype)
    return t * gains


def realistic_params(shapes, seed: int, dtype=jnp.bfloat16,
                     family: str = "gaussian"):
    """Deterministic per-leaf synthesis with init-like statistics.

    family="gaussian": kernels / embeddings N(0, fan_in^-0.5) (fan_in =
    product of all dims except the last). family="outlier": heavy-tailed
    entries + per-channel gain spread at the same total variance (see
    _outlier_leaf — the conservative trained-checkpoint proxy).
    1-D leaves: biases and scales are both 1-D; scales init at 1, biases at
    0. We set 1-D leaves to zeros EXCEPT multiplicative patterns (norm
    scales), which a zeros value would collapse; the tree is traversed with
    paths so scale/bias names are used directly.
    """
    leaves = jax.tree_util.tree_leaves_with_path(shapes)
    out = []
    for i, (path, leaf) in enumerate(leaves):
        name = jax.tree_util.keystr(path).lower()
        key = jax.random.fold_in(jax.random.PRNGKey(seed), i)
        if leaf.ndim <= 1:
            if any(t in name for t in ("scale", "gamma", "weight_norm")) or (
                name.endswith("['weight']") and leaf.ndim == 1
            ):
                arr = jnp.ones(leaf.shape, dtype)
            else:
                arr = jnp.zeros(leaf.shape, dtype)
        else:
            fan_in = int(np.prod(leaf.shape[:-1]))
            # generate at the target dtype (an fp32 tree would be 21 GB of
            # temps) and fence periodically: the relay runtime allocates
            # queued-program temps at ENQUEUE time, so hundreds of unfenced
            # leaf dispatches stack their temps in HBM (docs/DESIGN.md §10)
            if family == "outlier":
                arr = jax.jit(
                    lambda k, s=leaf.shape, f=fan_in, d=dtype:
                    _outlier_leaf(k, s, f, d)
                )(key)
            else:
                arr = jax.jit(
                    lambda k, s=leaf.shape, c=fan_in ** -0.5, d=dtype:
                    jax.random.normal(k, s, d) * jnp.asarray(c, d)
                )(key)
        out.append(arr)
        if i % 16 == 15:
            np.asarray(jax.device_get(arr.ravel()[:1]))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(shapes), out
    )


def compact_hbm(pipe):
    """Round-trip the weight trees through the host (numerically a no-op).

    realistic_params materializes ~700 leaves as individual device programs
    whose RNG temps interleave with the weight buffers, and int8 quantization
    then donates the bf16 kernels away. The resulting allocator state OOMs
    dec_all at the int8 serving window budget (46x42, ~8.7 GB temps) even
    though bytes_in_use exactly matches a working bench.py process
    (6,608,655,334 both) — and this round-trip alone does NOT recover the
    margin (measured: still OOMs at 46x42 after compaction; the arena's
    chunk structure survives). What actually clears the OOM is the smaller
    bf16-budget decode windows this script forces anyway for geometry
    matching (build_pipe). The round-trip is kept as cheap belt-and-braces
    against upload-order fragmentation; see docs/DESIGN.md §2.
    """
    from dove_tpu.utils.memory import get_memory_statistics

    t0 = time.time()
    for attr in ("dit_params", "vae_params", "prompt_embedding"):
        tree = getattr(pipe, attr)
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        host = []
        for leaf in leaves:
            # _parallel_get only pays off on big leaves (the scan-stacked
            # DiT kernels); per-part latency dominates on small ones
            if leaf.nbytes > (16 << 20):
                host.append(pipe._parallel_get(leaf))
            else:
                host.append(np.asarray(jax.device_get(leaf)))
            leaf.delete()
        new_leaves = []
        for i, h in enumerate(host):
            arr = jax.device_put(h)
            new_leaves.append(arr)
            if i % 16 == 15:  # bound enqueue-time staging on the relay
                np.asarray(jax.device_get(arr.ravel()[:1]))
        setattr(pipe, attr, jax.tree_util.tree_unflatten(treedef, new_leaves))
    stats = get_memory_statistics()
    print(
        f"compact_hbm: {time.time() - t0:.0f}s, bytes_in_use="
        f"{stats.get('bytes_in_use')}", file=sys.stderr,
    )


def build_pipe(preset: str, quantize: str | None, weights: str = "gaussian",
               attention: str | None = None, vae_calib: dict | None = None,
               vae_exclude: tuple[str, ...] = ()):
    from dove_tpu.config import cogvideox1_5_5b, cogvideox_2b, tiny_test
    from dove_tpu.models.dit import init_dit_params
    from dove_tpu.models.vae import init_vae_params
    from dove_tpu.pipeline import DovePipeline

    cfg = {"tiny": tiny_test, "cogvideox1.5-5b": cogvideox1_5_5b,
           "cogvideox-2b": cogvideox_2b}[preset]()
    dtype = jnp.float32 if preset == "tiny" else jnp.bfloat16
    key = jax.random.PRNGKey(0)
    dit_shapes = jax.eval_shape(lambda k: init_dit_params(k, cfg.dit, dtype), key)
    vae_shapes = jax.eval_shape(lambda k: init_vae_params(k, cfg.vae, dtype), key)
    pipe = DovePipeline(
        config=cfg,
        attention_backend=attention,
        dit_params=realistic_params(dit_shapes, seed=1, dtype=dtype,
                                    family=weights),
        vae_params=realistic_params(vae_shapes, seed=2, dtype=dtype,
                                    family=weights),
        prompt_embedding=jnp.zeros(
            (cfg.dit.max_text_seq_length, cfg.dit.text_embed_dim), dtype
        ),
        dtype=dtype,
        vae_tiling=True,
        output_uint8=True,
        # match the headline bench fixture exactly (bench.py): packed-I420
        # output. Also a practical HBM constraint at 5B: the uint8-RGB
        # epilogue's larger output + round/clip working set tips the
        # 9-latent 720p dec_all program over 16 GB (measured OOM, twice).
        output_i420=preset != "tiny",
        quantize=quantize,
        vae_calib=vae_calib,
        vae_exclude=vae_exclude,
        sample_posterior=False,  # deterministic: drift only, no sampling
    )
    if quantize and preset != "tiny":
        # The int8 serving mode normally plans LARGER VAE windows (46x42 vs
        # bf16's 32x32/28x28) — legitimate for serving, but a confound
        # here: GroupNorm statistics are computed per spatial window, so
        # with UNTRAINED random weights the window plan alone moves outputs
        # by hundreds of u8 steps (a trained VAE is window-consistent;
        # random projections are not — see test_dec_window_cap: a window
        # change alone shifts 79% of tiny-config pixels). Force the bf16
        # window budget so the comparison isolates QUANTIZATION drift.
        # Side benefit: 28x28 decode windows need ~3.5 GB of temps instead
        # of 8.7 GB, clearing the fragmentation OOM this process otherwise
        # hits at the 46x42 budget (docs/DESIGN.md §2, allocator history).
        pipe._window_budget = lambda: (2, (32, 32), (28, 28))
    return pipe


def run_stages(pipe, frames: int, height: int, width: int):
    fns = pipe._staged_fns()
    rng = np.random.default_rng(0)
    lq = jnp.asarray(
        rng.random((1, frames, height, width, 3), np.float32) * 2.0 - 1.0,
        pipe.dtype,
    )
    t0 = time.time()
    moments = fns["enc_all"](pipe.vae_params, lq)
    pipe._barrier(moments)
    z = fns["dit"](pipe.dit_params, pipe.prompt_embedding, moments,
                   jax.random.PRNGKey(42))
    pipe._barrier(z)
    out = pipe._parallel_get(fns["dec_all"](pipe.vae_params, z))
    dt = time.time() - t0
    return {
        "moments": np.asarray(moments, np.float32),
        "x0": np.asarray(z, np.float32),
        "out_u8": out,
        "seconds": np.float64(dt),
    }


def rel_err(a: np.ndarray, b: np.ndarray) -> float:
    num = np.linalg.norm((a - b).ravel().astype(np.float64))
    den = max(np.linalg.norm(b.ravel().astype(np.float64)), 1e-12)
    return float(num / den)


def psnr_u8(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float(100.0 if mse == 0 else 10.0 * np.log10(255.0**2 / mse))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the site plugin ignores "
                         "JAX_PLATFORMS env; tiny-preset tests use this)")
    ap.add_argument("--mode", required=True,
                    choices=["bf16", "int8", "int8-dit", "int8-vae", "int8w", "int8-dit-dec"])
    ap.add_argument("--weights", default="gaussian",
                    choices=["gaussian", "outlier"],
                    help="synthetic weight family (outlier = conservative "
                         "trained-checkpoint proxy; script header)")
    ap.add_argument("--attention", default=None,
                    choices=["flash", "flash-qk8"],
                    help="force the attention backend (flash = bf16 "
                         "attention inside a quantized run; the delta vs "
                         "the default flash-qk8 isolates the attention "
                         "kernel's drift share)")
    ap.add_argument("--preset", default="cogvideox1.5-5b")
    ap.add_argument("--frames", type=int, default=33)
    ap.add_argument("--height", type=int, default=180)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--out", type=str, default=None,
                    help="npz dump of stage outputs (bf16 reference run)")
    ap.add_argument("--compare", type=str, default=None,
                    help="bf16 npz to compare against (int8 run)")
    ap.add_argument("--report", type=str, default=None)
    ap.add_argument("--calib_out", type=str, default=None,
                    help="(bf16 run) dump per-conv per-channel activation "
                         "amax for SmoothQuant-style equalization")
    ap.add_argument("--calib", type=str, default=None,
                    help="(quantized run) equalize VAE conv quantization "
                         "with these calibration stats")
    ap.add_argument("--exclude", type=str, default=None,
                    help="comma-separated conv names (calib_name "
                         "convention) to KEEP in bf16 — the mixed-"
                         "precision knob from the attribution ranking")
    ap.add_argument("--attribution", action="store_true",
                    help="(bf16 run) rank every quantizable VAE conv by "
                         "its LOCAL int8 output error in one pass "
                         "(vae.attribute_quant_error) — with --calib the "
                         "measured quantizer is the equalized one. Writes "
                         "top-layer ranking into --report")
    ap.add_argument("--compact_hbm", action="store_true",
                    help="round-trip the weight trees through the host "
                         "after build. Measured NOT to fix the 46x42-"
                         "window OOM it was built for (the window cap "
                         "does; see compact_hbm docstring) — off by "
                         "default, costs minutes of link time")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    vae_calib = None
    if args.calib:
        loaded = np.load(args.calib)
        vae_calib = {k: jnp.asarray(loaded[k]) for k in loaded.files}
        print(f"equalizing with {len(vae_calib)} calibrated convs "
              f"({args.calib})", file=sys.stderr)

    exclude = tuple(
        n for n in (args.exclude or "").split(",") if n.strip()
    )
    pipe = build_pipe(args.preset, None if args.mode == "bf16" else args.mode,
                      weights=args.weights, attention=args.attention,
                      vae_calib=vae_calib, vae_exclude=exclude)
    if args.compact_hbm:
        compact_hbm(pipe)
    stages = run_stages(pipe, args.frames, args.height, args.width)
    print(f"{args.mode} stages done in {float(stages['seconds']):.1f}s",
          file=sys.stderr)

    if args.out:
        np.savez_compressed(args.out, **stages)
        print(f"wrote {args.out}", file=sys.stderr)

    if args.calib_out:
        # per-channel activation amax of every named VAE conv, captured on
        # windows of THIS run's fixture (bf16 weights): the decoder sees a
        # decode-ready x0 window, the encoder a pixel window. Equalization
        # uses channel RATIOS, so window-local amax is representative.
        if args.mode != "bf16":
            raise SystemExit("--calib_out requires --mode bf16")
        from dove_tpu.models import vae as vae_mod

        cfg = pipe.config.vae
        z = jnp.asarray(stages["x0"], pipe.dtype)[:, :3, :16, :24]
        _, dec_stats = vae_mod.calibrate(
            lambda q: vae_mod.decoder_forward(
                cfg, pipe.vae_params["decoder"], q, None
            ),
            z,
        )
        rng = np.random.default_rng(0)
        lq = jnp.asarray(
            rng.random((1, args.frames, args.height, args.width, 3),
                       np.float32) * 2.0 - 1.0,
            pipe.dtype,
        )[:, :9, :96, :96]
        _, enc_stats = vae_mod.calibrate(
            lambda v: vae_mod.encoder_forward(
                cfg, pipe.vae_params["encoder"], v, None
            ),
            lq,
        )
        calib = {k: np.asarray(v, np.float32)
                 for k, v in {**enc_stats, **dec_stats}.items()}
        np.savez_compressed(args.calib_out, **calib)
        print(f"wrote {args.calib_out} ({len(calib)} convs)", file=sys.stderr)
        if args.attribution and vae_calib is None:
            # same-process flow: --calib_out + --attribution ranks layers
            # under the EQUALIZED quantizer the stats were just captured
            # for, without a second bf16 process (each costs a 5B build)
            vae_calib = {k: jnp.asarray(v) for k, v in calib.items()}
            print("attribution will use the freshly captured calib",
                  file=sys.stderr)

    if args.attribution:
        # One doubled-conv bf16 pass per VAE half ranks every quantizable
        # conv by its LOCAL int8 output error (models/vae.py:
        # attribute_quant_error — first-order additive attribution; no
        # leave-one-out recompiles). Windows mirror --calib_out's capture.
        if args.mode != "bf16":
            raise SystemExit("--attribution requires --mode bf16")
        from dove_tpu.models import vae as vae_mod

        cfg = pipe.config.vae
        z = jnp.asarray(stages["x0"], pipe.dtype)[:, :3, :16, :24]
        _, dec_err = vae_mod.attribute_quant_error(
            lambda q: vae_mod.decoder_forward(
                cfg, pipe.vae_params["decoder"], q, None
            ),
            z, calib=vae_calib,
        )
        rng = np.random.default_rng(0)
        lq = jnp.asarray(
            rng.random((1, args.frames, args.height, args.width, 3),
                       np.float32) * 2.0 - 1.0,
            pipe.dtype,
        )[:, :9, :96, :96]
        _, enc_err = vae_mod.attribute_quant_error(
            lambda v: vae_mod.encoder_forward(
                cfg, pipe.vae_params["encoder"], v, None
            ),
            lq, calib=vae_calib,
        )
        ranking = sorted(
            (
                (name,
                 float(np.sqrt(float(np.asarray(e, np.float64))
                               / max(float(np.asarray(n, np.float64)),
                                     1e-30))))
                for name, (e, n) in {**enc_err, **dec_err}.items()
            ),
            key=lambda kv: -kv[1],
        )
        attribution = {
            "preset": args.preset,
            "weights_family": args.weights,
            "equalized": bool(vae_calib),
            "metric": "per-layer LOCAL output rel-err of the int8 conv vs "
                      "bf16 on the same input (first-order attribution)",
            "top10": [{"layer": k, "rel_err": round(v, 6)}
                      for k, v in ranking[:10]],
            "rel_err_by_layer": {k: round(v, 6) for k, v in ranking},
        }
        print(json.dumps({"attribution_top10": attribution["top10"]},
                         indent=2))
        if args.report and not args.compare:
            Path(args.report).write_text(json.dumps(attribution, indent=2))
            print(f"wrote {args.report}", file=sys.stderr)

    if args.compare:
        ref = np.load(args.compare)
        if ref["out_u8"].shape != stages["out_u8"].shape:
            raise SystemExit(
                f"--compare npz output shape {ref['out_u8'].shape} != this "
                f"run's {stages['out_u8'].shape} — the reference was dumped "
                "with different fixture/output settings; re-dump with "
                "--mode bf16 using the same flags"
            )
        report = {
            "preset": args.preset,
            "mode": args.mode,
            "attention_backend": pipe.attention_backend,
            "fixture": [args.frames, args.height, args.width],
            "weights": (
                "synthetic fan-in-scaled normals (see script header)"
                if args.weights == "gaussian" else
                "synthetic outlier family: Student-t(4) entries x "
                "log-normal(0.6) per-channel gains — conservative "
                "trained-checkpoint proxy (see script header)"
            ),
            "window_plan": (
                "int8 run forced onto the bf16 VAE window budget — isolates "
                "quantization from per-window GroupNorm geometry (script "
                "header caveat 2)"
                if args.preset != "tiny" else "single window (tiny)"
            ),
            "sample_posterior": False,
            "equalized": bool(vae_calib),
            "vae_exclude": list(exclude),
            "rel_err": {
                "enc_moments": rel_err(stages["moments"], ref["moments"]),
                "dit_x0": rel_err(stages["x0"], ref["x0"]),
            },
            "end_to_end": {
                # 5B runs emit packed I420 (the headline artifact, bench.py);
                # ndim 4 = [B, F, H*3//2, W] planes, ndim 5 = uint8 RGB
                # (tiny). The keys say which space the PSNR lives in — a
                # packed-plane PSNR pools Y with 2x2-subsampled chroma and
                # is NOT comparable to an RGB PSNR under one name.
                **(
                    {
                        "psnr_y_vs_bf16_db": psnr_u8(
                            stages["out_u8"][
                                :, :, : stages["out_u8"].shape[2] * 2 // 3
                            ],
                            ref["out_u8"][:, :, : ref["out_u8"].shape[2] * 2 // 3],
                        ),
                        "psnr_i420_packed_db": psnr_u8(
                            stages["out_u8"], ref["out_u8"]
                        ),
                    }
                    if stages["out_u8"].ndim == 4
                    else {
                        "psnr_rgb_vs_bf16_db": psnr_u8(
                            stages["out_u8"], ref["out_u8"]
                        )
                    }
                ),
                "max_abs_u8": int(
                    np.abs(
                        stages["out_u8"].astype(np.int32)
                        - ref["out_u8"].astype(np.int32)
                    ).max()
                ),
                "mean_abs_u8": float(
                    np.abs(
                        stages["out_u8"].astype(np.float64)
                        - ref["out_u8"].astype(np.float64)
                    ).mean()
                ),
            },
        }
        print(json.dumps(report, indent=2))
        if args.report:
            Path(args.report).write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
