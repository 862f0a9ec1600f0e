#!/usr/bin/env python
"""Flash-attention ablations at the DiT bench shape (48 heads, S=18226, D=64).

Measured round-1 state: bounded-logits + exp2 kernel at ~79 ms (52 TF/s);
the D=64 QK^T contraction caps the MXU at ~50% peak (~98 TF/s), so the gap
to the cap is per-step VPU work (exp2 + rowsum over 1M logits) serialized
against the MXU. Variants probed here:

  base   : shipped bounded kernel (ops/pallas/flash_attention.py)
  vones  : rowsum folded into the PV matmul via a ones column appended to V
           (V is [*, 64] — lanes are padded to 128 anyway, so the extra
           column is MXU-free; removes the VPU rowsum)
  ksplit : block_k processed as two halves inside one grid step so the
           second half's QK^T (MXU) can overlap the first half's exp2 (VPU)
  both   : vones + ksplit

Run: python scripts/bench_attention.py [--sq 18226 --heads 48]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _barrier(x):
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


def _pad_to(x, axis, multiple):
    pad = (-x.shape[axis]) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _kernel_qk8(
    scale_ref,  # SMEM [2]: [eff_logit_scale (incl. s_q*s_k*log2e), out_scale]
    q_ref, k_ref, v_ref, o_ref, acc_scr,
    *, kv_len, block_k, pv8,
):
    """int8 QK^T (and optionally int8 PV): q/k arrive pre-quantized int8;
    the D=64 contraction runs at the MXU int8 rate. Rowsum rides as a ones
    column on V (vones)."""
    kj = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kj == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * scale_ref[0]
    if kv_len % block_k:
        col = kj * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, -jnp.inf)
    p = jnp.exp2(s)
    if pv8:
        # per-block dynamic int8 for P (non-negative). The P-scale cancels in
        # the final acc/acc_ones ratio; only V's scale survives (out_scale).
        amax = jnp.maximum(jnp.max(p), 1e-6)
        acc = jax.lax.dot(
            jnp.clip(jnp.round(p * (127.0 / amax)), 0, 127).astype(jnp.int8),
            v_ref[0], preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * amax
    else:
        acc = jax.lax.dot(
            p.astype(jnp.bfloat16), v_ref[0], preferred_element_type=jnp.float32
        )
    acc_scr[:] += acc

    @pl.when(kj == nk - 1)
    def _finish():
        o_ref[0] = (
            acc_scr[:, :-1] / acc_scr[:, -1:] * scale_ref[1]
        ).astype(o_ref.dtype)


def qk8_fwd(q, k, v, scale, block_q, block_k, pv8=False):
    """q, k (and v when pv8) quantized per-tensor OUTSIDE the kernel."""
    bh, sq, d = q.shape
    kv_len = k.shape[1]

    def quant(x):
        amax = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-6)
        s = amax / 127.0
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
        return xq.astype(jnp.int8), s

    q8, s_q = quant(q)
    k8, s_k = quant(k)
    qp = _pad_to(q8, 1, block_q)
    kp = _pad_to(k8, 1, block_k)
    if pv8:
        v8, s_v = quant(v)
        vp = _pad_to(v8, 1, block_k)
        ones = jnp.full(vp.shape[:-1] + (1,), 127, vp.dtype)
        # ones column encodes 1.0 as 127 int8 -> out_scale folds 127*s_v / 127
        out_scale = s_v * 127.0
    else:
        vp = _pad_to(v, 1, block_k)
        ones = jnp.ones(vp.shape[:-1] + (1,), vp.dtype)
        out_scale = jnp.float32(1.0)
    vp = jnp.concatenate([vp, ones], axis=-1)
    nq = qp.shape[1] // block_q
    nk = kp.shape[1] // block_k
    d_out = vp.shape[-1]

    eff = (s_q * s_k * scale * 1.4426950408889634).astype(jnp.float32)
    scales = jnp.stack([eff, jnp.float32(out_scale)])

    kernel = functools.partial(
        _kernel_qk8, kv_len=kv_len, block_k=block_k, pv8=pv8,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d_out), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, qp.shape[1], d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d_out), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(scales, qp, kp, vp)
    return out[:, :sq]


def _kernel_variant(
    q_ref, k_ref, v_ref, o_ref, l_scr, acc_scr,
    *, scale, kv_len, block_k, vones, ksplit,
):
    kj = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kj == 0)
    def _init():
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    eff = scale * 1.4426950408889634

    def half(k_blk, v_blk, base_col):
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * eff
        if kv_len % block_k:
            col = base_col + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, -jnp.inf)
        p = jnp.exp2(s)
        acc = jax.lax.dot(
            p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32
        )
        if vones:
            return acc, None
        return acc, jnp.sum(p, axis=-1, keepdims=True)

    if ksplit:
        h = block_k // 2
        a1, l1 = half(k_ref[0, :h], v_ref[0, :h], kj * block_k)
        a2, l2 = half(k_ref[0, h:], v_ref[0, h:], kj * block_k + h)
        acc = a1 + a2
        lsum = None if vones else l1 + l2
    else:
        acc, lsum = half(k_ref[0], v_ref[0], kj * block_k)

    acc_scr[:] += acc
    if not vones:
        l_scr[:] = l_scr[:] + jnp.broadcast_to(lsum, l_scr.shape)

    @pl.when(kj == nk - 1)
    def _finish():
        if vones:
            # ones column rode along at feature index D (last matmul column)
            l = acc_scr[:, -1:]
            o_ref[0] = (acc_scr[:, :-1] / l).astype(o_ref.dtype)
        else:
            o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)


def variant_fwd(q, k, v, scale, block_q, block_k, vones, ksplit):
    bh, sq, d = q.shape
    kv_len = k.shape[1]
    qp = _pad_to(q, 1, block_q)
    kp = _pad_to(k, 1, block_k)
    vp = _pad_to(v, 1, block_k)
    if vones:
        ones = jnp.ones(vp.shape[:-1] + (1,), vp.dtype)
        vp = jnp.concatenate([vp, ones], axis=-1)  # [bh, skv, d+1]
    nq = qp.shape[1] // block_q
    nk = kp.shape[1] // block_k
    d_out = d + 1 if vones else d

    kernel = functools.partial(
        _kernel_variant, scale=scale, kv_len=kv_len, block_k=block_k,
        vones=vones, ksplit=ksplit,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d_out), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(qp.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, d_out), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(qp, kp, vp)
    return out[:, :sq]


def _kernel_diag(
    q_ref, k_ref, v_ref, o_ref, acc_scr, l_scr,
    *, scale, kv_len, block_k, do_exp, do_mask, do_sum, wide,
):
    """Diagnostic ablation kernel: switch each non-MXU stage off to see its
    cost. wide=True uses the zero-padded ones-column trick: V is [bk, 128]
    with col 64 = 1 for real rows / 0 for padded rows, so the PV matmul
    computes acc AND the rowsum AND the tail mask for free."""
    kj = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kj == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)
        if do_sum:
            l_scr[:] = jnp.zeros_like(l_scr)

    if wide == "qkonly":
        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[:, :64] += s[:, :64]  # consume s cheaply; no PV matmul
        @pl.when(kj == nk - 1)
        def _fin_qk():
            o_ref[0] = acc_scr[:, :64].astype(o_ref.dtype)
        return
    if wide == "pvonly":
        p = jnp.broadcast_to(
            q_ref[0, :, :1], (q_ref.shape[1], block_k)
        ).astype(v_ref.dtype)  # stand-in P with no QK^T
        acc_scr[:, :64] += jax.lax.dot(
            p, v_ref[0][:, :64], preferred_element_type=jnp.float32
        )
        @pl.when(kj == nk - 1)
        def _fin_pv():
            o_ref[0] = acc_scr[:, :64].astype(o_ref.dtype)
        return

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=(
            jnp.bfloat16 if wide == "bf16logits" else jnp.float32
        ),
    ).astype(jnp.float32) * (scale * 1.4426950408889634)
    if do_mask and kv_len % block_k:
        col = kj * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, -jnp.inf)
    p = jnp.exp2(s) if do_exp else s
    acc_scr[:] += jax.lax.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    )
    if do_sum:
        l_scr[:] = l_scr[:] + jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), l_scr.shape
        )

    @pl.when(kj == nk - 1)
    def _finish():
        if wide is True:
            o_ref[0] = (acc_scr[:, :64] / acc_scr[:, 64:65]).astype(o_ref.dtype)
        elif do_sum:
            o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)
        else:
            o_ref[0] = acc_scr[:].astype(o_ref.dtype)


def diag_fwd(q, k, v, scale, block_q, block_k,
             do_exp=True, do_mask=True, do_sum=True, wide=False):
    bh, sq, d = q.shape
    kv_len = k.shape[1]
    qp = _pad_to(q, 1, block_q)
    kp = _pad_to(k, 1, block_k)
    vp = _pad_to(v, 1, block_k)
    if wide is True:
        # ones at col d for REAL rows, zero on padded rows: padded K columns
        # (zero K -> logit 0 -> p=1) then contribute 0 to both acc and sum.
        real = (jnp.arange(vp.shape[1]) < kv_len).astype(vp.dtype)
        cols = jnp.zeros((vp.shape[0], vp.shape[1], LANES - d), vp.dtype)
        cols = cols.at[:, :, 0].set(real[None, :])
        vp = jnp.concatenate([vp, cols], axis=-1)
        do_mask, do_sum = False, False
    nq = qp.shape[1] // block_q
    nk = kp.shape[1] // block_k
    d_out = vp.shape[-1]

    kernel = functools.partial(
        _kernel_diag, scale=scale, kv_len=kv_len, block_k=block_k,
        do_exp=do_exp, do_mask=do_mask, do_sum=do_sum, wide=wide,
    )
    out = pl.pallas_call(
        kernel,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d_out), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, qp.shape[1], d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d_out), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(qp, kp, vp)
    return out[:, :sq]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sq", type=int, default=18226)
    ap.add_argument("--heads", type=int, default=48)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--block_q", type=int, default=1024)
    ap.add_argument("--block_k", type=int, default=1024)
    ap.add_argument("--which", default="base,vones,ksplit,both",
                    help="comma set from: base vones ksplit both qk8 full8 "
                         "headpack mxu_probe")
    args = ap.parse_args()
    print(f"device: {jax.devices()[0]}")

    bh, s, d = args.heads, args.sq, args.d
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (bh, s, d), jnp.bfloat16)
    k = jax.random.normal(kk, (bh, s, d), jnp.bfloat16)
    v = jax.random.normal(kv, (bh, s, d), jnp.bfloat16)
    scale = 1.0 / (d**0.5)
    flops = 4.0 * bh * s * s * d

    from dove_tpu.ops.pallas.flash_attention import flash_attention

    which = set(args.which.split(","))
    ref = None
    if "base" in which:
        f = jax.jit(lambda q, k, v: flash_attention(
            q[None], k[None], v[None], scale,
            args.block_q, args.block_k, True)[0])
        t = timed(f, q, k, v)
        ref = f(q, k, v)
        print(f"base   : {t*1e3:.1f} ms  {flops/t/1e12:.0f} TF/s")

    def report(name, f):
        t = timed(f, q, k, v)
        out = f(q, k, v)
        err = ""
        if ref is not None:
            rel = float(jnp.linalg.norm((out - ref).astype(jnp.float32))
                        / jnp.linalg.norm(ref.astype(jnp.float32)))
            err = f"  rel_err={rel:.2e}"
        print(f"{name:7s}: {t*1e3:.1f} ms  {flops/t/1e12:.0f} TF/s{err}")

    for name, vones, ksplit in (
        ("vones", True, False), ("ksplit", False, True), ("both", True, True),
    ):
        if name not in which:
            continue
        report(name, jax.jit(functools.partial(
            variant_fwd, scale=scale, block_q=args.block_q,
            block_k=args.block_k, vones=vones, ksplit=ksplit)))

    if "qk8" in which:
        report("qk8", jax.jit(functools.partial(
            qk8_fwd, scale=scale, block_q=args.block_q,
            block_k=args.block_k, pv8=False)))
    if "full8" in which:
        report("full8", jax.jit(functools.partial(
            qk8_fwd, scale=scale, block_q=args.block_q,
            block_k=args.block_k, pv8=True)))
    if "headpack" in which:
        report("headpack", jax.jit(functools.partial(
            headpack_fwd, scale=scale, block_q=args.block_q,
            block_k=args.block_k)))
    if "mxu_probe" in which:
        mxu_probe()

    # diagnostic ablations: cost of each non-MXU stage
    for name, kw in (
        ("mxu", dict(do_exp=False, do_mask=False, do_sum=False)),   # pure 2-matmul bound
        ("exp", dict(do_exp=True, do_mask=False, do_sum=False)),    # + exp2
        ("expmask", dict(do_exp=True, do_mask=True, do_sum=False)), # + tail mask
        ("full", dict(do_exp=True, do_mask=True, do_sum=True)),     # == base math
        ("wide", dict(wide=True)),                                  # ones-col, maskless
        ("qkonly", dict(wide="qkonly")),                            # QK^T matmul alone
        ("pvonly", dict(wide="pvonly")),                            # PV matmul alone
        ("bf16logits", dict(wide="bf16logits")),                    # bf16 logits egress
    ):
        if name not in which:
            continue
        report(name, jax.jit(functools.partial(
            diag_fwd, scale=scale, block_q=args.block_q,
            block_k=args.block_k, **kw)))




# ---------------------------------------------------------------------------
# Head packing (VERDICT r2 item 2): two D=64 heads per 128-lane contraction.
#
# Layout: packed q rows [bq, 2d] = [q_h0 | q_h1]; K and V become
# block-diagonal [2bk, 2d] (built in-kernel from the two heads' blocks), so
#   s = q2 @ kdiag^T    -> [bq, 2bk]   (cols 0..bk head0, bk.. head1, exact)
#   o = p  @ vdiag      -> [bq, 2d]    ([o_h0 | o_h1], full 128 output lanes)
# Both matmuls contract over 128 lanes (half zeros). This wins ONLY if the
# MXU charges a D=64 contraction the same as D=128 (i.e. short-K rounds up);
# `mxu_probe` measures that directly.
# ---------------------------------------------------------------------------


def _kernel_headpack(
    q_ref, k_ref, v_ref, o_ref, l_scr, acc_scr,
    *, scale: float, kv_len: int, block_k: int,
):
    kj = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kj == 0)
    def _init():
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    bq, d = q_ref.shape[1], q_ref.shape[2]
    bk = k_ref.shape[1]
    eff = scale * 1.4426950408889634  # bounded-logits exp2 path

    q2 = jnp.concatenate([q_ref[0], q_ref[1]], axis=1)  # [bq, 2d]
    z = jnp.zeros((bk, d), k_ref.dtype)
    kd = jnp.concatenate([
        jnp.concatenate([k_ref[0], z], axis=1),
        jnp.concatenate([z, k_ref[1]], axis=1),
    ], axis=0)  # [2bk, 2d] block-diagonal
    s = jax.lax.dot_general(
        q2, kd, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * eff  # [bq, 2bk]

    if kv_len % block_k:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        col = jnp.where(col >= bk, col - bk, col) + kj * block_k
        s = jnp.where(col < kv_len, s, -jnp.inf)
    p = jnp.exp2(s)

    l0 = jnp.sum(p[:, :bk], axis=-1, keepdims=True)  # [bq, 1]
    l1 = jnp.sum(p[:, bk:], axis=-1, keepdims=True)
    l_scr[:] += jnp.concatenate([
        jnp.broadcast_to(l0, (bq, d)), jnp.broadcast_to(l1, (bq, d))
    ], axis=1)  # lanes 0..d-1 hold l0, d.. hold l1 -> lane-aligned divide

    vd = jnp.concatenate([
        jnp.concatenate([v_ref[0], z], axis=1),
        jnp.concatenate([z, v_ref[1]], axis=1),
    ], axis=0)  # [2bk, 2d]
    acc_scr[:] += jax.lax.dot(
        p.astype(v_ref.dtype), vd, preferred_element_type=jnp.float32
    )  # [bq, 2d]

    @pl.when(kj == nk - 1)
    def _finish():
        o = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)
        o_ref[0] = o[:, :d]
        o_ref[1] = o[:, d:]


def headpack_fwd(q, k, v, scale, block_q, block_k):
    bh, sq, d = q.shape
    assert bh % 2 == 0
    kv_len = k.shape[1]
    qp = _pad_to(q, 1, block_q)
    kp = _pad_to(k, 1, block_k)
    vp = _pad_to(v, 1, block_k)
    nq = qp.shape[1] // block_q
    nk = kp.shape[1] // block_k
    out = pl.pallas_call(
        functools.partial(
            _kernel_headpack, scale=scale, kv_len=kv_len, block_k=block_k
        ),
        grid=(bh // 2, nq, nk),
        in_specs=[
            pl.BlockSpec((2, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((2, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((2, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((2, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, qp.shape[1], d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 2 * d), jnp.float32),
            pltpu.VMEM((block_q, 2 * d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(qp, kp, vp)
    return out[:, :sq]


# ---------------------------------------------------------------------------
# MXU depth probe: is a K=64 contraction charged like K=128?
# Chains `steps` accumulating matmuls over VMEM-resident blocks (no HBM
# traffic inside the loop), M=N=1024.
# ---------------------------------------------------------------------------


def _kernel_mm(a_ref, b_ref, o_ref, acc, *, last: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jax.lax.dot_general(
        a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == last)
    def _fin():
        o_ref[...] = acc[:].astype(o_ref.dtype)


def mxu_probe(m=1024, n=1024, steps=4096):
    print(f"mxu_probe: {steps} chained [{m},K]x[K,{n}] matmuls, bf16")
    for kdim in (64, 128, 256):
        a = jax.random.normal(jax.random.PRNGKey(0), (m, kdim), jnp.bfloat16)
        b = jax.random.normal(jax.random.PRNGKey(1), (kdim, n), jnp.bfloat16)
        f = jax.jit(lambda a, b, kd=kdim: pl.pallas_call(
            functools.partial(_kernel_mm, last=steps - 1),
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((m, kd), lambda i: (0, 0)),
                pl.BlockSpec((kd, n), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((m, n), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((m, n), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=jax.default_backend() != "tpu",
        )(a, b))
        t = timed(f, a, b)
        fl = 2.0 * m * n * kdim * steps
        print(f"  K={kdim:4d}: {t*1e3:7.2f} ms  {fl/t/1e12:6.1f} TF/s "
              f"({t/steps*1e6:.2f} us/matmul)")


if __name__ == "__main__":
    main()
