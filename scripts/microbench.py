#!/usr/bin/env python
"""TPU micro-benchmarks for the optimization log (docs/DESIGN.md §7).

Measures the primitive rates that bound the one-step VSR pipeline: bf16 vs
int8 matmul (MXU), bf16 vs int8 conv at VAE-decoder shapes, and the
quantize/dequantize overhead of a dynamic W8A8 conv. Run on the real chip:

    python scripts/microbench.py [--which matmul,conv,qconv]
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


def _barrier(out):
    """Reliable fence on relay-backed TPU runtimes: block_until_ready can
    return before remote execution finishes; a host data pull cannot."""
    x = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(x[(0,) * x.ndim]))


def timed(fn, *args, repeats=5, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _barrier(out)
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        _barrier(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


N_ITER = 10  # ops chained inside one program (amortizes tunnel dispatch)


def chain(op, n=N_ITER):
    """x -> op(op(...op(x))) with a data dependency between iterations."""

    def f(x, *rest):
        for _ in range(n):
            x = op(x, *rest)
        return x

    return jax.jit(f)


def bench_matmul():
    M = K = N = 8192
    flops = 2 * M * K * N * N_ITER
    a16 = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
    b16 = jax.random.normal(jax.random.PRNGKey(1), (K, N), jnp.bfloat16)
    f_bf16 = chain(lambda a, b: (a @ b) * jnp.bfloat16(1e-2))
    t = timed(f_bf16, a16, b16)
    print(f"matmul bf16 {M}x{K}x{N}: {t*1e3:.1f} ms  {flops/t/1e12:.0f} TF/s")

    a8 = jnp.ones((M, K), jnp.int8)
    b8 = jnp.ones((K, N), jnp.int8)
    f_int8 = chain(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        ).astype(jnp.int8)
    )
    t = timed(f_int8, a8, b8)
    print(f"matmul int8 {M}x{K}x{N}: {t*1e3:.1f} ms  {flops/t/1e12:.0f} TOP/s")


def conv3d(x, k, pet):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=pet,
    )


def bench_conv():
    # VAE decoder hot shape: full-res resblock conv on one decode tile
    F, H, W, C = 13, 192, 192, 128
    x16 = jax.random.normal(jax.random.PRNGKey(0), (1, F, H, W, C), jnp.bfloat16)
    k16 = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, C, C), jnp.bfloat16) * 0.05
    flops = 2 * F * H * W * C * C * 27 * N_ITER
    f = chain(lambda x, k: conv3d(x, k, jnp.bfloat16))
    t = timed(f, x16, k16)
    print(f"conv3d bf16 {F}x{H}x{W}x{C}: {t*1e3:.1f} ms  {flops/t/1e12:.0f} TF/s")

    x8 = jnp.ones((1, F, H, W, C), jnp.int8)
    k8 = jnp.ones((3, 3, 3, C, C), jnp.int8)
    try:
        f8 = chain(lambda x, k: conv3d(x, k, jnp.int32).astype(jnp.int8))
        t = timed(f8, x8, k8)
        print(f"conv3d int8 {F}x{H}x{W}x{C}: {t*1e3:.1f} ms  {flops/t/1e12:.0f} TOP/s")
    except Exception as e:
        print(f"conv3d int8: UNSUPPORTED ({type(e).__name__}: {e})")

    # 2D variant (temporal taps folded into input channels)
    x2 = jax.random.normal(jax.random.PRNGKey(2), (F, H, W, C), jnp.bfloat16)
    k2 = jax.random.normal(jax.random.PRNGKey(3), (3, 3, C, C), jnp.bfloat16) * 0.05
    flops2 = 2 * F * H * W * C * C * 9 * N_ITER
    f2 = chain(lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16,
    ))
    t = timed(f2, x2, k2)
    print(f"conv2d bf16 {F}x{H}x{W}x{C}: {t*1e3:.1f} ms  {flops2/t/1e12:.0f} TF/s")

    x2_8 = jnp.ones((F, H, W, C), jnp.int8)
    k2_8 = jnp.ones((3, 3, C, C), jnp.int8)
    try:
        f2_8 = chain(lambda x, k: jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ).astype(jnp.int8))
        t = timed(f2_8, x2_8, k2_8)
        print(f"conv2d int8 {F}x{H}x{W}x{C}: {t*1e3:.1f} ms  {flops2/t/1e12:.0f} TOP/s")
    except Exception as e:
        print(f"conv2d int8: UNSUPPORTED ({type(e).__name__}: {e})")


def bench_shifted_matmul_conv():
    """3x3x3 SAME conv expressed as 27 shifted [S,C]@[C,C] matmuls: tests
    whether bypassing XLA's conv path reaches plain-matmul MXU rates."""
    F, H, W, C = 13, 192, 192, 128
    flops = 2 * F * H * W * C * C * 27 * N_ITER

    def shifted(x, w):  # x: [F, H, W, C]; w: [27, C, C]
        xp = jnp.pad(x, ((1, 1), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((F * H * W, C), jnp.float32)
        i = 0
        for dt in range(3):
            for dy in range(3):
                for dx in range(3):
                    sl = jax.lax.dynamic_slice(xp, (dt, dy, dx, 0), (F, H, W, C))
                    acc = acc + jax.lax.dot_general(
                        sl.reshape(F * H * W, C), w[i],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    i += 1
        return acc.reshape(F, H, W, C).astype(x.dtype)

    x = jax.random.normal(jax.random.PRNGKey(0), (F, H, W, C), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (27, C, C), jnp.bfloat16) * 0.02
    t = timed(chain(shifted), x, w)
    print(f"conv3d-as-27-matmuls bf16: {t*1e3:.1f} ms  {flops/t/1e12:.0f} TF/s")

    def shifted8(x, w):  # int8 variant, int32 accumulation
        xp = jnp.pad(x, ((1, 1), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((F * H * W, C), jnp.int32)
        i = 0
        for dt in range(3):
            for dy in range(3):
                for dx in range(3):
                    sl = jax.lax.dynamic_slice(xp, (dt, dy, dx, 0), (F, H, W, C))
                    acc = acc + jax.lax.dot_general(
                        sl.reshape(F * H * W, C), w[i],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    i += 1
        return jnp.clip(acc >> 7, -127, 127).reshape(F, H, W, C).astype(jnp.int8)

    x8 = jnp.ones((F, H, W, C), jnp.int8)
    w8 = jnp.ones((27, C, C), jnp.int8)
    t = timed(chain(shifted8), x8, w8)
    print(f"conv3d-as-27-matmuls int8: {t*1e3:.1f} ms  {flops/t/1e12:.0f} TOP/s")

    # wider-channel decoder level (256ch at half res, full temporal)
    F2, H2, W2, C2 = 13, 96, 96, 256
    flops2 = 2 * F2 * H2 * W2 * C2 * C2 * 27 * N_ITER
    x2 = jax.random.normal(jax.random.PRNGKey(2), (1, F2, H2, W2, C2), jnp.bfloat16)
    k2 = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 3, C2, C2), jnp.bfloat16) * 0.02
    t = timed(chain(lambda x, k: conv3d(x, k, jnp.bfloat16)), x2, k2)
    print(f"conv3d bf16 {F2}x{H2}x{W2}x{C2}: {t*1e3:.1f} ms  {flops2/t/1e12:.0f} TF/s")


def bench_qconv():
    """Full dynamic W8A8 conv incl. quantize + dequant epilogue."""
    F, H, W, C = 13, 192, 192, 128
    flops = 2 * F * H * W * C * C * 27 * N_ITER
    x = jax.random.normal(jax.random.PRNGKey(0), (1, F, H, W, C), jnp.bfloat16)
    k8 = jnp.ones((3, 3, 3, C, C), jnp.int8)
    w_scale = jnp.full((C,), 0.05, jnp.float32)

    def qconv(x, k8, w_scale):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        s = jnp.maximum(amax, 1e-6) / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
        acc = conv3d(xq, k8, jnp.int32)
        return (acc.astype(jnp.float32) * (s * w_scale)).astype(jnp.bfloat16)

    try:
        f = chain(lambda x, k, ws: qconv(x, k, ws))
        t = timed(f, x, k8, w_scale)
        print(f"qconv W8A8 dynamic {F}x{H}x{W}x{C}: {t*1e3:.1f} ms  "
              f"{flops/t/1e12:.0f} TOP/s effective")
    except Exception as e:
        print(f"qconv: UNSUPPORTED ({type(e).__name__}: {e})")


def bench_matmul_dit():
    # DiT hot shape: 18k tokens x 3072, MLP 12288 (square the chain by
    # alternating up/down projections)
    S, D, Dff = 18432, 3072, 12288
    flops = 2 * S * D * Dff * 2 * (N_ITER // 2)
    a = jax.random.normal(jax.random.PRNGKey(0), (S, D), jnp.bfloat16)
    up = jax.random.normal(jax.random.PRNGKey(1), (D, Dff), jnp.bfloat16) * 0.01
    down = jax.random.normal(jax.random.PRNGKey(2), (Dff, D), jnp.bfloat16) * 0.01

    def f(a, up, down):
        for _ in range(N_ITER // 2):
            a = (a @ up) @ down
        return a

    t = timed(jax.jit(f), a, up, down)
    print(f"matmul bf16 {S}x{D}x{Dff} mlp: {t*1e3:.1f} ms  {flops/t/1e12:.0f} TF/s")

    a8 = jnp.ones((S, D), jnp.int8)
    up8 = jnp.ones((D, Dff), jnp.int8)
    down8 = jnp.ones((Dff, D), jnp.int8)

    def f8(a, up, down):
        for _ in range(N_ITER // 2):
            h = jax.lax.dot_general(
                a, up, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            ).astype(jnp.int8)
            a = jax.lax.dot_general(
                h, down, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            ).astype(jnp.int8)
        return a

    t = timed(jax.jit(f8), a8, up8, down8)
    print(f"matmul int8 {S}x{D}x{Dff} mlp: {t*1e3:.1f} ms  {flops/t/1e12:.0f} TOP/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="matmul,dit,conv,qconv")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}")
    which = set(args.which.split(","))
    if "matmul" in which:
        bench_matmul()
    if "dit" in which:
        bench_matmul_dit()
    if "conv" in which:
        bench_conv()
    if "shifted" in which:
        bench_shifted_matmul_conv()
    if "qconv" in which:
        bench_qconv()


if __name__ == "__main__":
    main()
