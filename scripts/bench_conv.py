#!/usr/bin/env python
"""Decoder-conv rate probes at the 720p streaming/staged shapes.

The decode stage is ~half the 100-frame clip time on both long-clip paths,
and the int8 causal conv measured 98 TOP/s in round 2 — 25% of the v5e's
int8 peak. This tool isolates where the ceiling is:

  direct3d-int8 : the shipped int8 path (dynamic-quant + NDHWC 3D conv,
                  int32 accumulate, rescale)
  stacked-int8  : tap-stacked 2D lowering, int8 (round-2: did NOT engage
                  the int8 MXU mode — re-verify)
  stacked-bf16  : the bf16 path's lowering
  matmul-int8   : a pure int8 matmul with the SAME FLOPs as one conv
                  (im2col-equivalent contraction K=3*3*3*C) — the ceiling
                  an ideal Pallas im2col conv kernel could approach
  matmul-bf16   : same in bf16

Chains >=8 ops per program (per-dispatch latency swamps single ops through
the relay). Run on the TPU: python scripts/bench_conv.py
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _barrier(x):
    np.asarray(jax.device_get(x.ravel()[:1]))


def timed(fn, *args, repeats=4, warmup=1):
    for _ in range(warmup):
        out = fn(*args)
    _barrier(out)
    ts = []
    for i in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        _barrier(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f", type=int, default=10, help="frames incl. cache")
    ap.add_argument("--h", type=int, default=368)
    ap.add_argument("--w", type=int, default=336)
    ap.add_argument("--c", type=int, default=128)
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()
    F, H, W, C, N = args.f, args.h, args.w, args.c, args.chain
    print(f"device: {jax.devices()[0]}  shape [1,{F},{H},{W},{C}] chain {N}")

    kt, kh, kw = 3, 3, 3
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, F, H, W, C), jnp.bfloat16)
    k3 = jax.random.normal(rng, (kt, kh, kw, C, C), jnp.bfloat16) * 0.05
    Fo = F - (kt - 1)
    flops_per = 2.0 * Fo * H * W * C * C * kt * kh * kw
    flops = flops_per * N

    def report(name, fn, *a):
        t = timed(fn, *a)
        print(f"{name:14s}: {t*1e3:8.1f} ms  {flops/t/1e12:6.1f} TOP/s", flush=True)

    def q(v):
        amax = jnp.maximum(jnp.max(jnp.abs(v.astype(jnp.float32))), 1e-6)
        s = amax / 127.0
        return jnp.clip(jnp.round(v.astype(jnp.float32) / s), -127, 127).astype(jnp.int8), s

    k3q, sk = q(k3)

    @jax.jit
    def direct3d_int8(x):
        h = x
        for _ in range(N):
            hq, sx = q(h)
            acc = jax.lax.conv_general_dilated(
                hq, k3q, (1, 1, 1), ((0, 0), (1, 1), (1, 1)),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.int32,
            )
            h = (acc.astype(jnp.float32) * (sx * sk)).astype(jnp.bfloat16)
            h = jnp.pad(h, ((0, 0), (kt - 1, 0), (0, 0), (0, 0), (0, 0)))
        return h

    @jax.jit
    def direct3d_bf16(x):
        h = x
        for _ in range(N):
            y = jax.lax.conv_general_dilated(
                h, k3, (1, 1, 1), ((0, 0), (1, 1), (1, 1)),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            h = jnp.pad(y, ((0, 0), (kt - 1, 0), (0, 0), (0, 0), (0, 0)))
        return h

    k2 = k3.transpose(1, 2, 0, 3, 4).reshape(kh, kw, kt * C, C)
    k2q, sk2 = q(k2)

    @jax.jit
    def stacked_bf16(x):
        h = x
        for _ in range(N):
            xs = jnp.concatenate(
                [h[:, dt : dt + Fo] for dt in range(kt)], axis=-1
            ).reshape(Fo, H, W, kt * C)
            y = jax.lax.conv_general_dilated(
                xs, k2, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            h = jnp.pad(y[None], ((0, 0), (kt - 1, 0), (0, 0), (0, 0), (0, 0)))
        return h

    @jax.jit
    def stacked_int8(x):
        h = x
        for _ in range(N):
            xs = jnp.concatenate(
                [h[:, dt : dt + Fo] for dt in range(kt)], axis=-1
            ).reshape(Fo, H, W, kt * C)
            xq, sx = q(xs)
            acc = jax.lax.conv_general_dilated(
                xq, k2q, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            h = (acc.astype(jnp.float32) * (sx * sk2)).astype(jnp.bfloat16)
            h = jnp.pad(h[None], ((0, 0), (kt - 1, 0), (0, 0), (0, 0), (0, 0)))
        return h

    from dove_tpu.ops.pallas.conv3d_int8 import conv3d_w8a8

    @jax.jit
    def pallas_int8(x):
        # same chain structure as direct3d_int8: dynamic per-tensor quant,
        # int8 conv w/ int32 accumulate, fp32 rescale, causal repad
        h = x
        sk_vec = jnp.broadcast_to(sk, (C,))
        for _ in range(N):
            hq, sx = q(h)
            hq = jnp.pad(
                hq[0], ((0, 0), (1, 1), (1, 1), (0, 0))
            )  # spatial same-pad; temporal taps already in F
            h = conv3d_w8a8(hq, k3q, sx, sk_vec, out_dtype=jnp.bfloat16)[None]
            h = jnp.pad(h, ((0, 0), (kt - 1, 0), (0, 0), (0, 0), (0, 0)))
        return h

    from dove_tpu.ops.pallas.conv3d_int8 import conv3d_bf16

    @jax.jit
    def pallas_bf16(x):
        h = x
        for _ in range(N):
            hp = jnp.pad(h[0], ((0, 0), (1, 1), (1, 1), (0, 0)))
            h = conv3d_bf16(hp, k3, out_dtype=jnp.bfloat16)[None]
            h = jnp.pad(h, ((0, 0), (kt - 1, 0), (0, 0), (0, 0), (0, 0)))
        return h

    @jax.jit
    def pallas_bf16_fold(x):
        h = x
        for _ in range(N):
            hp = jnp.pad(h[0], ((0, 0), (1, 1), (1, 1), (0, 0)))
            h = conv3d_bf16(hp, k3, out_dtype=jnp.bfloat16, dh_fold=True)[None]
            h = jnp.pad(h, ((0, 0), (kt - 1, 0), (0, 0), (0, 0), (0, 0)))
        return h

    report("direct3d-int8", direct3d_int8, x)
    report("direct3d-bf16", direct3d_bf16, x)
    report("stacked-bf16", stacked_bf16, x)
    report("stacked-int8", stacked_int8, x)
    report("pallas-int8", pallas_int8, x)
    report("pallas-bf16", pallas_bf16, x)
    report("pallas-bf16-dhfold", pallas_bf16_fold, x)
    del x

    # im2col-equivalent matmul: [M, K] x [K, C], K = kt*kh*kw*C. M is capped
    # well below Fo*H*W (a full im2col buffer at 720p shapes is ~7 GB and
    # OOMs next to the conv probes); the per-element rate is what we are
    # measuring, and M=128k rows already saturates the MXU pipeline. FLOPs
    # are recomputed per-probe to match the reduced M.
    M = min(Fo * H * W, 131072)
    K = kt * kh * kw * C
    mm_flops = 2.0 * M * K * C * N
    a_bf = jax.random.normal(rng, (M, K), jnp.bfloat16)
    b_bf = jax.random.normal(rng, (K, C), jnp.bfloat16)
    a_i8 = jnp.clip(jnp.round(a_bf.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)
    b_i8 = jnp.clip(jnp.round(b_bf.astype(jnp.float32) * 10), -127, 127).astype(jnp.int8)

    def report_mm(name, fn, *a):
        t = timed(fn, *a)
        print(f"{name:14s}: {t*1e3:8.1f} ms  {mm_flops/t/1e12:6.1f} TOP/s", flush=True)

    @jax.jit
    def matmul_bf16(a, b):
        h = a
        for _ in range(N):
            y = jax.lax.dot(h, b, preferred_element_type=jnp.float32)  # [M, C]
            h = jnp.concatenate([y.astype(jnp.bfloat16)] * (K // C), axis=1)
        return h

    @jax.jit
    def matmul_int8(a, b):
        h = a
        for _ in range(N):
            y = jax.lax.dot(h, b, preferred_element_type=jnp.int32)
            y8 = jnp.clip(y // 1024, -127, 127).astype(jnp.int8)
            h = jnp.concatenate([y8] * (K // C), axis=1)
        return h

    report_mm("matmul-bf16", matmul_bf16, a_bf, b_bf)
    report_mm("matmul-int8", matmul_int8, a_i8, b_i8)


if __name__ == "__main__":
    main()
