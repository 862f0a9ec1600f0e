"""Pallas TPU kernel: W8A8 3x3x3 conv with int8 MXU accumulation.

Why it exists (docs/DESIGN.md §10 "decode conv headroom"): the decoder's
3x3x3 convs are ~half of every long-clip's device time. The shipped XLA
int8 lowering (direct NDHWC `conv_general_dilated`, int32 accumulate)
sustains ~100-110 TOP/s at the streaming decode shape — ~60% of this
chip's best-ever measured int8 matmul rate (174 TOP/s at 8192^3). XLA's
conv emitter controls the remaining gap; the only way past it is a hand
schedule. This kernel reformulates the conv as 27 tap matmuls over
row-major pixel blocks:

  grid = cout blocks; internal loop over (row-stripe, frame):
    * frames stream through a 4-slot VMEM ring per row-stripe — each
      input frame-stripe is DMA'd ONCE and reused by the 3 temporal taps
      (kt) of the 3 output frames that read it, with a one-frame
      prefetch overlapping compute;
    * the width taps (dw) never shift the int8 activations (Mosaic can
      neither DMA HBM slices at sublane offsets +-1 nor rotate int8
      vectors, and producing shifted copies in XLA measured ~4 ms/conv
      of strided-copy churn). Instead each dw gets its OWN int32
      accumulator fed by the SAME unshifted operand, and the epilogue
      aligns them with two 32-bit sublane rotates:
          out[w] = sum_dw (x @ W_dw)[w + dw]
                 = (acc_0 + roll(acc_1, -1) + roll(acc_2, -2))[w];
      circular wraparound touches only the padded garbage columns;
    * operands collapse [TH, W32, 128] -> [TH*W32, 128] as a free view
      because W32 is padded to the 32-sublane int8 tile (the padded
      columns compute garbage rows that are never stored — ~5% extra
      FLOPs at the 336-wide decode shape). The merged-row roll crosses
      row-block boundaries only inside those garbage columns;
    * epilogue: sum accumulators, * (sx * sk[cout]) -> bf16, async-store
      to HBM double-buffered against the next step's compute.

Reference semantics matched: dove_tpu.ops.quant's W8A8 scheme — symmetric
per-tensor dynamic activation scale sx, symmetric per-output-channel
weight scales sk, int32 accumulation, fp32 dequant epilogue
(quant.py:1-21). Causal temporal padding is the CALLER's job, as in the
XLA path (vae.causal_conv3d prepends the cache frames).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUB_I8 = 32  # int8 sublane tile
RING = 4  # frame ring slots: 3 live taps + 1 prefetch


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel(
    w_ref,  # [27, Cin, 128] int8/bf16 (VMEM, cout block)
    scale_ref,  # [1, 128] f32 (VMEM, sx*sk for this cout block)
    x_ref,  # [F, Hpad, W32, Cin] int8/bf16 (ANY/HBM)
    out_ref,  # [Fo, nh*TH, W32, Cout] (ANY/HBM; garbage columns >= Wo)
    x_s,  # scratch [RING, ncin, TH+2, W32, LANE] int8/bf16
    out_s,  # scratch [2, TH, W32, LANE] out dtype
    acc_s,  # scratch [3, TH*W32, LANE] int32/f32 (one per dw tap)
    in_sems,  # DMA semaphores [RING, ncin]
    out_sems,  # DMA semaphores [2]
    *,
    TH: int,
    W32: int,
    ncin: int,
    nh: int,
    Fo: int,
    acc_dtype=jnp.int32,
    dh_fold: bool = False,
):
    co = pl.program_id(0)
    F = Fo + 2
    steps = nh * Fo
    M = TH * W32

    def in_dma(frame, row0):
        return [
            pltpu.make_async_copy(
                x_ref.at[
                    frame, pl.ds(row0, TH + 2), :, pl.ds(ci * LANE, LANE)
                ],
                x_s.at[frame % RING, ci],
                in_sems.at[frame % RING, ci],
            )
            for ci in range(ncin)
        ]

    def out_dma(slot, step):
        # store the FULL padded width: slicing out_s to :Wo would need
        # Wo % 8 == 0 (Mosaic sublane tiling) which decode/encode tile
        # widths don't guarantee — the wrapper crops the garbage columns
        f = step % Fo
        row0 = (step // Fo) * TH
        return pltpu.make_async_copy(
            out_s.at[slot],
            out_ref.at[f, pl.ds(row0, TH), :, pl.ds(co * LANE, LANE)],
            out_sems.at[slot],
        )

    def body(step, _):
        f = step % Fo
        row0 = (step // Fo) * TH

        @pl.when(f == 0)
        def _():  # stripe warm-up: frames 0,1 were not prefetched
            for g in (0, 1):
                for dma in in_dma(g, row0):
                    dma.start()
            for g in (0, 1):
                for dma in in_dma(g, row0):
                    dma.wait()
            for dma in in_dma(2, row0):
                dma.start()

        # prefetch frame f+3 (needed next step) while this step computes
        @pl.when(f + 3 < F)
        def _():
            for dma in in_dma(f + 3, row0):
                dma.start()

        # frame f+2 (started last step, or at warm-up) must be resident
        for dma in in_dma(f + 2, row0):
            dma.wait()

        # 27 small dots with per-dw accumulators. A K-folded variant
        # (9 (kt,dh) taps packed into one [M, 9*128] operand so the tap
        # sum runs inside the MXU's K loop) was built and measured SLOWER
        # for int8 (63.2 vs 59.6 ms at TH=8): the operand build + re-reads
        # cost more than the int32 accumulator round-trips they remove.
        # dh_fold is the cheaper middle point (bf16 only): concatenate the
        # 3 row-shifted views on the LANE axis once per (ci, kt) — K=384
        # dots, 3x fewer accumulator round-trips, operand build is one
        # in-VMEM copy reused by all 3 dw dots.
        first = True
        for ci in range(ncin):
            for kt in range(3):
                slot = (f + kt) % RING
                if dh_fold:
                    a3 = jnp.concatenate(
                        [
                            x_s[slot, ci, dh : dh + TH].reshape(M, LANE)
                            for dh in range(3)
                        ],
                        axis=1,
                    )  # [M, 3*LANE]
                    for dw in range(3):
                        w = w_ref[kt * 3 + dw,
                                  ci * 3 * LANE : (ci + 1) * 3 * LANE, :]
                        p = jax.lax.dot_general(
                            a3, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=acc_dtype,
                        )
                        if first:
                            acc_s[dw] = p
                        else:
                            acc_s[dw] += p
                    first = False
                    continue
                for dh in range(3):
                    a = x_s[slot, ci, dh : dh + TH].reshape(M, LANE)
                    for dw in range(3):
                        w = w_ref[kt * 9 + dh * 3 + dw,
                                  ci * LANE : (ci + 1) * LANE, :]
                        p = jax.lax.dot_general(
                            a, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=acc_dtype,
                        )
                        if first:
                            acc_s[dw] = p
                        else:
                            acc_s[dw] += p
                    first = False

        oslot = step % 2

        # the slot's previous store must land before out_s is overwritten
        @pl.when(step >= 2)
        def _():
            out_dma(oslot, step - 2).wait()

        acc = (
            acc_s[0]
            + pltpu.roll(acc_s[1], shift=M - 1, axis=0)
            + pltpu.roll(acc_s[2], shift=M - 2, axis=0)
        )
        out = acc.astype(jnp.float32) * scale_ref[0]
        out_s[oslot] = out.reshape(TH, W32, LANE).astype(out_s.dtype)
        out_dma(oslot, step).start()
        return 0

    jax.lax.fori_loop(0, steps, body, 0)
    if steps >= 2:
        out_dma((steps - 2) % 2, steps - 2).wait()
    out_dma((steps - 1) % 2, steps - 1).wait()


@functools.partial(jax.jit, static_argnames=("out_dtype", "row_block"))
def conv3d_w8a8(
    x_q: jnp.ndarray,  # [F, Hp, Wp, Cin] int8; F = Fo + 2 (temporal taps
    #                    already prepended by the caller: causal cache),
    #                    Hp = Ho + 2, Wp = Wo + 2 (spatial same-padding)
    w_q: jnp.ndarray,  # [3, 3, 3, Cin, Cout] int8
    sx: jnp.ndarray,  # [] f32   per-tensor activation scale
    sk: jnp.ndarray,  # [Cout] f32  per-output-channel weight scale
    out_dtype=jnp.bfloat16,
    row_block: int | None = None,
):
    """VALID 3x3x3 int8 conv of a pre-padded input -> [Fo, Ho, Wo, Cout]."""
    F, Hp, Wp, Cin = x_q.shape
    Cout = w_q.shape[-1]
    assert Cin % LANE == 0 and Cout % LANE == 0, (Cin, Cout)
    assert w_q.shape[:3] == (3, 3, 3)
    assert F >= 3, (
        f"F={F}: input must include the 2 causal cache frames (F = Fo + 2)"
    )
    Fo, Ho, Wo = F - 2, Hp - 2, Wp - 2
    ncin, ncout = Cin // LANE, Cout // LANE
    W32 = _cdiv(Wp, SUB_I8) * SUB_I8

    if row_block is None:
        # VMEM budget ~11 MB across the frame ring (int8), the three
        # int32 accumulators, and the double-buffered output stripe
        per_row = (RING * ncin + 3 * 4 + 2 * 2) * W32 * LANE
        row_block = max(2, min(16, (11 << 20) // per_row - 2))
    TH = min(row_block, Ho)
    nh = _cdiv(Ho, TH)

    # pad rows so every step's DMA window [row0, row0+TH+2) is in bounds
    # (the padded rows produce extra output rows, cropped below), and pad
    # W up to the 32-sublane tile so in-kernel collapses are free views
    pad_rows = max(nh * TH + 2 - Hp, 0)
    x_q = jnp.pad(x_q, ((0, 0), (0, pad_rows), (0, W32 - Wp), (0, 0)))

    w_flat = w_q.reshape(27, Cin, Cout)
    scale = (sx.astype(jnp.float32) * sk.astype(jnp.float32)).reshape(1, Cout)

    out = pl.pallas_call(
        functools.partial(
            _kernel, TH=TH, W32=W32, ncin=ncin, nh=nh, Fo=Fo,
            acc_dtype=jnp.int32,
        ),
        grid=(ncout,),
        in_specs=[
            pl.BlockSpec(
                (27, Cin, LANE), lambda co: (0, 0, co),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, LANE), lambda co: (0, co), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Fo, nh * TH, W32, Cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((RING, ncin, TH + 2, W32, LANE), jnp.int8),
            pltpu.VMEM((2, TH, W32, LANE), out_dtype),
            pltpu.VMEM((3, TH * W32, LANE), jnp.int32),
            pltpu.SemaphoreType.DMA((RING, ncin)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(w_flat, scale, x_q)
    return out[:, :Ho, :Wo]


SUB_BF16 = 16  # bf16 sublane tile


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "row_block", "dh_fold")
)
def conv3d_bf16(
    x: jnp.ndarray,  # [F, Hp, Wp, Cin] bf16; F = Fo + 2 (causal cache frames
    #                  prepended by the caller), Hp = Ho + 2, Wp = Wo + 2
    w: jnp.ndarray,  # [3, 3, 3, Cin, Cout] bf16
    out_dtype=jnp.bfloat16,
    row_block: int | None = None,
    dh_fold: bool = False,
):
    """VALID 3x3x3 bf16 conv of a pre-padded input -> [Fo, Ho, Wo, Cout].

    Same 27-tap-matmul schedule as conv3d_w8a8 with bf16 operands and fp32
    accumulators (the dw-alignment rotates stay 32-bit).

    MEASURED OUTCOME (2026-08-19, scripts/bench_conv.py at the decode
    window shape [10,368,336,128]): 78.5 TOP/s — SLOWER than XLA's
    tap-stacked 2D lowering (90.8). At C=128 each tap dot is a K=128
    contraction; 27 of them round-trip the fp32 accumulators through VMEM
    where XLA's emitter K-folds the taps inside the MXU loop. The kernel
    is kept (correctness-tested, serving wiring behind
    vae.set_pallas_conv / DOVE_PALLAS_CONV=1) as the measured baseline for
    future hand schedules, NOT as the default serving path — the honest
    conclusion is that XLA's bf16 conv emitter wins at these shapes.
    """
    F, Hp, Wp, Cin = x.shape
    Cout = w.shape[-1]
    assert Cin % LANE == 0 and Cout % LANE == 0, (Cin, Cout)
    assert w.shape[:3] == (3, 3, 3)
    assert F >= 3, (
        f"F={F}: input must include the 2 causal cache frames (F = Fo + 2)"
    )
    Fo, Ho, Wo = F - 2, Hp - 2, Wp - 2
    ncin, ncout = Cin // LANE, Cout // LANE
    W16 = _cdiv(Wp, SUB_BF16) * SUB_BF16

    if row_block is None:
        # VMEM budget ~11 MB: bf16 ring (2 B), f32 accumulators, bf16 out
        per_row = (RING * ncin * 2 + 3 * 4 + 2 * 2) * W16 * LANE
        row_block = max(2, min(16, (11 << 20) // per_row - 2))
    TH = min(row_block, Ho)
    nh = _cdiv(Ho, TH)

    pad_rows = max(nh * TH + 2 - Hp, 0)
    x = jnp.pad(x, ((0, 0), (0, pad_rows), (0, W16 - Wp), (0, 0)))

    if dh_fold:
        # [9 = kt*dw, ncin * (3 dh * LANE), Cout]: per ci block the K rows
        # are the 3 dh taps back-to-back, matching the kernel's lane-axis
        # concat of the 3 row-shifted operand views
        w_flat = (
            w.astype(jnp.bfloat16)
            .reshape(3, 3, 3, ncin, LANE, Cout)
            .transpose(0, 2, 3, 1, 4, 5)
            .reshape(9, 3 * Cin, Cout)
        )
    else:
        w_flat = w.astype(jnp.bfloat16).reshape(27, Cin, Cout)
    scale = jnp.ones((1, Cout), jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _kernel, TH=TH, W32=W16, ncin=ncin, nh=nh, Fo=Fo,
            acc_dtype=jnp.float32, dh_fold=dh_fold,
        ),
        grid=(ncout,),
        in_specs=[
            pl.BlockSpec(
                w_flat.shape[:2] + (LANE,), lambda co: (0, 0, co),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, LANE), lambda co: (0, co), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((Fo, nh * TH, W16, Cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((RING, ncin, TH + 2, W16, LANE), jnp.bfloat16),
            pltpu.VMEM((2, TH, W16, LANE), out_dtype),
            pltpu.VMEM((3, TH * W16, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((RING, ncin)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(w_flat, scale, x.astype(jnp.bfloat16))
    return out[:, :Ho, :Wo]
