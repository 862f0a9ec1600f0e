"""Post-training int8 quantization for inference (W8A8, dynamic activations).

TPU v5e's MXU runs int8 at ~1.5-2x its bf16 rate (measured on this chip:
matmul 203 vs 133 TF/s, conv 92-98 vs 74 — scripts/microbench.py), and int8
weights halve HBM residency (the 5B DiT: 10.4 -> 5.2 GB), freeing headroom
for larger VAE decode tiles. This module implements the standard serving
scheme:

  * weights: symmetric per-output-channel int8, quantized once at load time;
  * activations: symmetric per-tensor int8 with a dynamic (per-call) scale;
  * int8 x int8 -> int32 accumulation on the MXU, fp32 dequant epilogue.

Quantized layers carry ``{"kernel_q": int8, "kernel_scale": f32[out]}`` in
place of ``{"kernel": ...}``; the model forwards (dit._linear, vae.causal_conv3d/
_conv2d) dispatch on key presence, so the same model code serves both modes.
Opt-in via ``DovePipeline(quantize="int8")`` / ``--quantize int8``: expected
quality cost is small but nonzero (validate against released weights with
scripts/parity_check.py — the PSNR>50dB bit-parity bar applies to the bf16
path only).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]

_EPS = 1e-12


def quantize_weight(
    w: jnp.ndarray, clip_search: int = 0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel (last axis) int8 quantization.

    clip_search > 0 runs an MSE-optimal per-channel scale search over that
    many geometrically-spaced candidates in [0.3, 1.0]·amax: a smaller
    scale trades saturation of the channel's few largest entries for a
    finer step on the bulk — for heavy-tailed (trained-checkpoint-like)
    kernels the optimum sits well below amax, and the search includes 1.0
    so it never does worse than the plain amax grid. Load-time only
    (weights quantize once); candidates evaluate one at a time under
    lax.map so the temp footprint stays at one fp32 copy of the kernel.

    Returns (w_q int8 same shape, scale f32 [out]).
    """
    wf = w.astype(jnp.float32)
    axes = tuple(range(w.ndim - 1))
    amax = jnp.max(jnp.abs(wf), axis=axes)
    base = jnp.maximum(amax, _EPS) / 127.0
    if clip_search:
        flat = wf.reshape(-1, wf.shape[-1])
        ratios = jnp.geomspace(0.3, 1.0, clip_search)

        def err(r):
            s = base * r
            q = jnp.clip(jnp.round(flat / s), -127, 127)
            return jnp.sum((q * s - flat) ** 2, axis=0)

        errs = jax.lax.map(err, ratios)  # [R, out]
        scale = base * ratios[jnp.argmin(errs, axis=0)]
    else:
        scale = base
    w_q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


# Donated variants: quantizing a 5B-parameter tree must NOT transiently hold
# both the bf16 and int8 copies in HBM (10.4 + 5.2 GB > a v5e chip next to
# anything else). Donation frees each bf16 kernel as its int8 version lands —
# which also INVALIDATES the caller's references to those arrays on TPU, so
# it is opt-out (DovePipeline.donate_weights=False) for flows that keep the
# bf16 tree alive, e.g. A/B parity on hosts with HBM to spare.
@functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(1,))
def _quantize_weight_donated(w, clip_search=0):
    return quantize_weight(w, clip_search)


_quantize_weight_jit = jax.jit(quantize_weight, static_argnums=(1,))


def _quantize_stacked(w):
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)  # [L, 1, out]
    scale = jnp.maximum(amax, _EPS) / 127.0
    w_q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


_quantize_stacked_donated = functools.partial(
    jax.jit, donate_argnums=(0,)
)(_quantize_stacked)
_quantize_stacked_jit = jax.jit(_quantize_stacked)


def dynamic_quant(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-tensor int8 with a runtime scale (fp32 scalar)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf))
    scale = jnp.maximum(amax, _EPS) / 127.0
    x_q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return x_q, scale


_TAIL_CLIP_CANDIDATES = (0.2, 0.35, 0.5, 0.65, 0.8, 0.9, 1.0)
_SYM_CLIP_CANDIDATES = (0.2, 0.35, 0.5, 0.65, 0.8)


def dynamic_quant_asym(
    x: jnp.ndarray, tail_clip: bool = True,
    eq_inv: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """ASYMMETRIC per-tensor int8: x ~= s * x_q + m (s, m fp32 scalars).

    Conv inputs in the VAE are all SiLU outputs — skewed to [-0.278, amax]
    — so the symmetric grid wastes almost half its range on the negative
    side. Centering the grid at m = (amax + amin)/2 with step
    s = (amax - amin)/254 halves the step size for these distributions
    (~+6 dB per conv, measured end-to-end in docs/reports/QUANT_FRONTIER.md).

    tail_clip additionally runs a runtime MSE-OPTIMAL grid-range search
    over two candidate families (c=1.0 included — never worse than the
    full-range grid); out-of-range entries saturate to the grid edges:
      * tail family  (lo=amin, hi = amin + c*(amax-amin)): SiLU-shaped
        conv inputs — bounded below, long positive tail;
      * symmetric family (±c*max(|amin|,|amax|)): zero-centered
        heavy-tailed inputs (upsampler/shortcut activations, trained-
        checkpoint outlier regime).
    A window tensor's extrema sit far in the tail (farther still for
    heavy-tailed trained checkpoints), so the bulk's step size shrinks by
    whatever the tail was wasting — measured per conv per call on the
    actual tensor, no calibration coupling (the search runs AFTER
    equalization, on the tensor being quantized). Cost: a few fused
    elementwise passes (~1e-4 of the conv's MACs).

    The affine offset is EXACT to fold through a conv whose spatial padding
    is zero-valued: conv(s*x_q + m*1_valid, W) = s*conv(x_q, W)
    + m*conv(1_valid, sum_cin W) — the second term is a cin=1 conv of ones
    against the per-(tap, cout) channel-summed kernel ("kernel_ksum",
    ~1/C of the main conv's FLOPs), see qconv/causal_conv3d. Saturation
    keeps that fold exact: the dequantized tensor is still s*x_q + m
    elementwise, clipping only changes which x_q the quantizer picked.

    eq_inv (per-input-channel fp32, positive) folds the SmoothQuant
    pre-scale INTO the quantizer: the returned x_q/s/m quantize x*eq_inv
    WITHOUT ever materializing a full fp32 copy of the scaled tensor
    (AOT-measured: that copy put equalized 46x42 dec_all temps at 14.3-
    16.7G vs 10.2G unequalized — an OOM next to the 6.3G residency).
    Three exactness-preserving moves:
      * global extrema from per-channel bf16 extrema scaled by eq_inv
        (exact: eq_inv > 0, max commutes with positive per-channel scale);
      * the candidate-MSE search evaluates on a BLOCK-STRATIFIED
        subsample of large tensors — a contiguous 1/16 chunk of every
        2048-row block (rows = spatial positions × all channels):
        contiguous chunks keep the DMA wide (a per-row [::16] stride was
        measured CATASTROPHIC — sub-512-byte gathers put the int8 decode
        BEHIND bf16), stratification keeps it unbiased, and 1/16 volume
        caps the search at ~1 ms per decode window. The fp32 view is
        computed inside the lax.map body, so no full-size fp32 buffer
        ever materializes.
      * the final quantize is one fused elementwise chain
        x -> round(x*(eq_inv/s) - m/s) -> int8 (single consumer, no
        intermediate buffer).
    """
    import os

    if os.environ.get("DOVE_TAIL_CLIP", "").lower() in ("0", "off", "false"):
        tail_clip = False  # A/B perf bisection knob (trace-time)
    e = (eq_inv.astype(jnp.float32).reshape(-1)
         if eq_inv is not None else None)
    if tail_clip:
        # EVERYTHING except the final quantize runs on the block-stratified
        # subsample — extrema included. A slightly-low sampled amax only
        # saturates a few more tail elements, which is the exact mechanism
        # the MSE search already prefers (its optima sit WELL inside the
        # true range), while full-tensor extrema cost 2 extra HBM passes
        # per conv — measured ~1.6 s of the 32f decode. The dense-side
        # extremum (SiLU's -0.278 floor) is abundantly sampled.
        x2 = x.reshape(-1, x.shape[-1])  # free: x is contiguous
        n_rows = x2.shape[0]
        if n_rows >= (1 << 15):
            # 8 CONTIGUOUS row segments (~1/128 total) at static offsets:
            # pure contiguous slices + one small concat — nothing touches
            # the rest of the tensor. (Measured dead ends at decode scale,
            # each ~1.3-1.7 s of a 32f decode: a [::16] row stride lowers
            # to sub-512B gathers; a K-candidate broadcast over a 1/16
            # sample materializes ~400 MB per conv; and slice[:nb*blk]
            # .reshape(nb,blk,C) forces a full-tensor copy — reshape of a
            # slice is not a view.)
            seg_len = max(n_rows // 1024, 1)
            step = n_rows // 8
            x2 = jnp.concatenate(
                [jax.lax.slice(x2, (i * step, 0),
                               (i * step + seg_len, x2.shape[1]))
                 for i in range(8)]
            )
        xs = x2.astype(jnp.float32)
        if e is not None:
            xs = xs * e
        amax = jnp.max(xs)
        amin = jnp.min(xs)

        ct = jnp.asarray(_TAIL_CLIP_CANDIDATES, jnp.float32)
        cs = jnp.asarray(_SYM_CLIP_CANDIDATES, jnp.float32)
        a = jnp.maximum(jnp.abs(amax), jnp.abs(amin))
        lo = jnp.concatenate([jnp.full_like(ct, 1.0) * amin, -cs * a])
        hi = jnp.concatenate([amin + ct * (amax - amin), cs * a])
        m_c = 0.5 * (hi + lo)
        s_c = jnp.maximum((hi - lo) / 254.0, _EPS)

        # UNROLLED over the static candidate count: a lax.map compiles to a
        # while loop whose per-iteration overhead on this runtime costs
        # ~1.4 s across a decode's 136 conv calls (measured via the
        # dec_device split) — 12 unrolled fused reductions schedule freely
        # and cost what the (1/128-subsampled) arithmetic costs: ~nothing.
        def err(sc, mc):
            q = jnp.clip(jnp.round((xs - mc) / sc), -127, 127)
            return jnp.sum(jnp.square(q * sc + mc - xs))

        errs = jnp.stack([err(s_c[k], m_c[k])
                          for k in range(int(s_c.shape[0]))])
        best = jnp.argmin(errs)
        s, m = s_c[best], m_c[best]
    else:
        ch_axes = tuple(range(x.ndim - 1))
        if e is not None:
            cmax = jnp.max(x.astype(jnp.float32), axis=ch_axes)
            cmin = jnp.min(x.astype(jnp.float32), axis=ch_axes)
            amax = jnp.max(cmax * e)
            amin = jnp.min(cmin * e)
        else:
            amax = jnp.max(x.astype(jnp.float32))
            amin = jnp.min(x.astype(jnp.float32))
        m = 0.5 * (amax + amin)
        s = jnp.maximum((amax - amin) / 254.0, _EPS)
    if eq_inv is not None:
        shape = (1,) * (x.ndim - 1) + (-1,)
        x_q = jnp.clip(
            jnp.round(x.astype(jnp.float32) * (e / s).reshape(shape) - m / s),
            -127, 127,
        ).astype(jnp.int8)
    else:
        x_q = jnp.clip(
            jnp.round((x.astype(jnp.float32) - m) / s), -127, 127
        ).astype(jnp.int8)
    return x_q, s, m


def gptq_tap_rounding(
    w: jnp.ndarray, scale: jnp.ndarray, tapcorr: jnp.ndarray,
    damp: float = 0.01,
) -> jnp.ndarray:
    """GPTQ error-feedback rounding restricted to the TAP dimension.

    Plain round-to-nearest minimizes WEIGHT-space error; what matters is
    OUTPUT-space error ||ΔW·X||. Conv inputs are spatially smooth, so a
    kernel's taps see strongly correlated inputs — rounding residuals can
    be re-absorbed by not-yet-quantized taps (GPTQ, arXiv 2210.17323,
    specialized to the k_t*k_h*k_w tap axis with ONE shared Hessian
    H[t,t'] = c(δ_t − δ_t') from the calibrated autocorrelation
    (vae._tap_autocorr), identical for every (cin, cout) column — so the
    whole update is a T-step loop of rank-1 row updates, vectorized over
    channels, using the Cholesky factor of H^{-1} exactly as the paper
    does (measured here: the Cholesky recursion beats a fixed-H^{-1}
    approximation 0.0096 vs 0.0121 output rel-err), plus a per-column
    δᵀHδ safety net against feedback saturation (see below). On the
    synthetic outlier weight family with measured decoder-feature
    correlation this is up to ~2x lower conv output error than
    round-to-nearest at identical serving cost — the emitted int8 tensor
    just has better values — and never worse by construction.

    w: fp32 [(*k), cin, cout] (post-equalization); scale: per-cout [cout];
    tapcorr: [2r+1, 2r+1, 2r+1] with r >= max tap reach. Returns int8 w_q.
    """
    k_dims = w.shape[:-2]
    taps = [()]
    for k in k_dims:
        taps = [t + (i,) for t in taps for i in range(k)]
    T = len(taps)
    r = (tapcorr.shape[0] - 1) // 2
    c = jnp.asarray(tapcorr, jnp.float32)
    rows = []
    for ti in taps:
        row = []
        for tj in taps:
            d = [a - b for a, b in zip(ti, tj)]
            d = [0] * (3 - len(d)) + d  # 2D kernels: temporal offset 0
            row.append(c[d[0] + r, d[1] + r, d[2] + r])
        rows.append(jnp.stack(row))
    H0 = jnp.stack(rows)  # [T, T]
    H = H0 + damp * jnp.eye(T, dtype=jnp.float32)
    # GPTQ recursion: U = upper Cholesky factor of H^{-1} (U^T U = H^{-1});
    # after rounding tap t, the not-yet-quantized taps absorb the residual
    # along U's row t.
    U = jnp.linalg.cholesky(jnp.linalg.inv(H)).T

    W0 = w.astype(jnp.float32).reshape((T,) + w.shape[-2:])  # [T, cin, cout]
    W2 = W0
    s = scale.reshape(1, -1)
    q_rows = []
    for t in range(T):
        q = jnp.clip(jnp.round(W2[t] / s), -127, 127)
        q_rows.append(q)
        if t + 1 < T:
            err = (W2[t] - q * s) / U[t, t]
            W2 = W2.at[t + 1:].add(
                -U[t, t + 1:].reshape(-1, 1, 1) * err[None]
            )
    q_gptq = jnp.stack(q_rows)

    # Per-column safety net: on strongly-correlated Hessians the feedback
    # can push later taps past the int8 grid edge, where clipping breaks
    # the recursion's algebra — MEASURED catastrophic on the heavy-tailed
    # outlier weight family (p90 per-conv weight err 98%, e2e drift
    # 35.5 -> 18.9 dB). The expected output error of a column's rounding
    # δ is exactly δᵀ H δ (H is the tap input Gram), so evaluate both
    # roundings under it and keep GPTQ only where it wins — monotone vs
    # round-to-nearest by construction.
    q_rtn = jnp.clip(jnp.round(W0 / s), -127, 127)
    d_g = q_gptq * s - W0
    d_r = q_rtn * s - W0
    e_g = jnp.einsum("tij,ts,sij->ij", d_g, H0, d_g)
    e_r = jnp.einsum("tij,ts,sij->ij", d_r, H0, d_r)
    w_q = jnp.where((e_g < e_r)[None], q_gptq, q_rtn)
    return w_q.astype(jnp.int8).reshape(w.shape)


# one module-level jit wrapper so the ~10 distinct conv shapes compile
# once per process (a fresh jax.jit per call would re-trace every conv)
_gptq_tap_rounding_jit = jax.jit(gptq_tap_rounding)


def ksum_correction(
    p: Params, shape, strides, padding, dims, dtype
) -> jnp.ndarray:
    """conv(1_valid, kernel_ksum): the affine-offset term's geometry factor.

    shape is the input's shape with the channel axis replaced by 1; interior
    outputs equal the full kernel sum, borders see only the in-image taps —
    matching zero padding exactly.
    """
    ones = jnp.ones(shape, dtype)
    return jax.lax.conv_general_dilated(
        ones, p["kernel_ksum"].astype(dtype),
        strides, padding, dimension_numbers=dims,
    )


def dynamic_quant_rows(x2: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric PER-ROW int8 with runtime scales: x2 [M, K] -> (int8 [M, K],
    f32 [M, 1]).

    For a matmul y = x @ w the row (token) axis is never reduced, so a
    per-row activation scale folds exactly into the dequant epilogue:
    y[m, n] = s_x[m] * s_w[n] * acc[m, n]. vs the per-tensor scale this cuts
    the DiT's int8 activation error ~5x at bench shapes (a single outlier
    token no longer sets every token's step size) for one extra fused VPU
    reduction — see docs/reports/QUANT_FRONTIER.md.
    """
    xf = x2.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    scale = jnp.maximum(amax, _EPS) / 127.0
    x_q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return x_q, scale


def qlinear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """int8 matmul: x [..., in] @ kernel_q [in, out] -> x.dtype [..., out].

    Activations quantize PER ROW (token) — exact scale fold, see
    dynamic_quant_rows. kernel_scale may be [out] or [1, out] (per-scan-layer
    stacked weights sliced by lax.scan keep a leading singleton) — both
    broadcast the same.
    """
    lead = x.shape[:-1]
    x_q, s_x = dynamic_quant_rows(x.reshape(-1, x.shape[-1]))
    acc = jax.lax.dot_general(
        x_q, p["kernel_q"],
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (s_x * p["kernel_scale"].reshape(-1))
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.reshape(lead + (acc.shape[-1],)).astype(x.dtype)


def qconv(
    p: Params,
    x: jnp.ndarray,
    strides,
    padding,
    dimension_numbers,
) -> jnp.ndarray:
    """int8 convolution with fp32 dequant epilogue (kernel layout ...IO).

    With "kernel_ksum" present the activations quantize ASYMMETRICALLY
    (dynamic_quant_asym) and the affine offset folds back exactly through
    the cin=1 correction conv — ~2x finer activation steps on the VAE's
    SiLU-output conv inputs for ~1/C extra FLOPs.

    With "equalize_inv" present the input is pre-scaled per channel by the
    calibrated equalization vector (SmoothQuant-style; the inverse is
    folded into the stored weights, see _quantize_leaf_dict) — exact in
    fp32, it only re-allocates the quantization grids between channels.
    """
    if "kernel_ksum" in p:
        # equalization folds INTO the quantizer (no fp32 pre-scale buffer)
        x_q, s_x, m_x = dynamic_quant_asym(x, eq_inv=p.get("equalize_inv"))
    else:
        x_q, s_x = dynamic_quant(equalize_input(p, x))
        m_x = None
    acc = jax.lax.conv_general_dilated(
        x_q, p["kernel_q"], strides, padding,
        dimension_numbers=dimension_numbers,
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (s_x * p["kernel_scale"])
    if m_x is not None:
        corr = ksum_correction(
            p, x.shape[:-1] + (1,), strides, padding, dimension_numbers,
            jnp.float32,
        )
        y = y + (m_x * p["kernel_scale"]) * corr
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def equalize_input(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Pre-scale the conv input by the calibrated per-channel equalization
    (fp32 — no extra bf16 rounding; the cast feeds the quantizer, which
    works in fp32 anyway). Identity when the leaf is not equalized."""
    if "equalize_inv" in p:
        return x.astype(jnp.float32) * p["equalize_inv"]
    return x


def equalization_vector(
    w: jnp.ndarray, calib_amax: jnp.ndarray, alpha: float = 0.5
) -> jnp.ndarray:
    """SmoothQuant-style per-input-channel equalization d [cin]:
    x/d quantizes, w*d absorbs it (exact in fp32). d balances the
    activation and weight ranges: d = amax_x^alpha / amax_w^(1-alpha),
    normalized to geometric-mean 1 (keeps the per-tensor activation scale
    in the same regime) and clipped to [2^-6, 2^6]. Guards: channels with
    zero observed range keep d=1."""
    a_w = jnp.max(
        jnp.abs(w.astype(jnp.float32)),
        axis=tuple(i for i in range(w.ndim) if i != w.ndim - 2),
    )
    a_x = calib_amax.astype(jnp.float32)
    ok = (a_x > 0) & (a_w > 0)
    d = jnp.where(
        ok,
        jnp.power(jnp.maximum(a_x, 1e-12), alpha)
        / jnp.power(jnp.maximum(a_w, 1e-12), 1.0 - alpha),
        1.0,
    )
    logd = jnp.log(d)
    d = jnp.exp(logd - jnp.mean(logd, where=ok, keepdims=False))
    return jnp.clip(jnp.where(ok, d, 1.0), 2.0**-6, 2.0**6)


def _quantize_leaf_dict(p: Params, donate: bool = True,
                        key: str = "kernel_q",
                        with_ksum: bool = False,
                        calib_amax: jnp.ndarray | None = None,
                        clip_search: int = 0,
                        tapcorr: jnp.ndarray | None = None) -> Params:
    """{"kernel": w, "bias"?} -> {key, "kernel_scale", "bias"?}.

    with_ksum additionally stores "kernel_ksum" = sum_cin(w_q) (f32,
    cin axis kept as 1) — the asymmetric activation scheme's correction
    kernel (see dynamic_quant_asym).

    calib_amax (per-input-channel activation amax from vae.calibrate)
    additionally folds a SmoothQuant-style equalization: the stored
    weights absorb d, "equalize_inv" = 1/d pre-scales the activation at
    run time (equalize_input). The ksum correction stays consistent — it
    is computed from the equalized quantized weights.

    tapcorr (calibrated input autocorrelation, vae._tap_autocorr) switches
    the rounding to GPTQ tap-space error feedback (gptq_tap_rounding) —
    same scales and serving program, better int8 values."""
    w = p["kernel"]
    eq_inv = None
    if calib_amax is not None:
        d = equalization_vector(w, calib_amax)
        shape = (1,) * (w.ndim - 2) + (-1, 1)
        # quantize from fp32: re-rounding the scaled weights to bf16 first
        # would waste the equalization's precision win
        w = w.astype(jnp.float32) * d.reshape(shape)
        eq_inv = (1.0 / d).astype(jnp.float32)
        donate = False  # w is a fresh scaled copy, not the caller's leaf
    if tapcorr is not None and w.ndim >= 4:
        wf = w.astype(jnp.float32)
        amax = jnp.max(jnp.abs(wf), axis=tuple(range(w.ndim - 1)))
        scale = jnp.maximum(amax, _EPS) / 127.0
        w_q = _gptq_tap_rounding_jit(wf, scale, tapcorr)
    else:
        fn = _quantize_weight_donated if donate else _quantize_weight_jit
        w_q, scale = fn(w, clip_search)
    out = {key: w_q, "kernel_scale": scale}
    if eq_inv is not None:
        out["equalize_inv"] = eq_inv
    if with_ksum:
        out["kernel_ksum"] = w_q.astype(jnp.float32).sum(
            axis=-2, keepdims=True
        )
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def quantize_dit(params: Params, donate: bool = True,
                 w_only: bool = False) -> Params:
    """Quantize the DiT's hot matmuls: attention q/k/v/out + both MLP
    projections (per scanned-layer stacked leaves quantize per layer too —
    the output-channel axis is last, the layer axis leads, so per-channel
    scales broadcast per layer: kernel [L, in, out] -> scale [L, 1, out]).

    w_only=True stores the same int8 weights under "kernel_w8" instead:
    the W8A16 serving mode — weights live in HBM at int8 (halved DiT
    residency buys the bigger VAE window budget) but dequantize into the
    bf16 matmul, so activations carry NO quantization error. Drift is the
    per-channel weight rounding alone (frontier point between bf16 and
    int8-dit, docs/reports/QUANT_FRONTIER.md)."""
    key = "kernel_w8" if w_only else "kernel_q"

    def q_stacked(p):
        fn = _quantize_stacked_donated if donate else _quantize_stacked_jit
        w_q, scale = fn(p["kernel"])
        out = {key: w_q, "kernel_scale": scale}
        if "bias" in p:
            out["bias"] = p["bias"]
        return out

    blocks = params["blocks"]
    # spread-then-override so any key OUTSIDE the quantized set (future
    # block additions, variant-specific leaves) passes through unchanged
    # instead of being silently dropped from the int8 tree
    new_blocks = {
        **blocks,
        "attn1": {
            **blocks["attn1"],
            **{k: q_stacked(blocks["attn1"][k])
               for k in ("to_q", "to_k", "to_v", "to_out")},
        },
        "ff": {
            **blocks["ff"],
            **{k: q_stacked(blocks["ff"][k]) for k in ("net_0_proj", "net_2")},
        },
    }
    return {**params, "blocks": new_blocks}


def calib_name(path: tuple) -> str:
    """Translate a VAE param-tree path to the runtime conv name used by
    vae._calib_tap (which mirrors the conv-cache keys):
      ("decoder","up_blocks",0,"resnets",1,"conv1") -> "decoder.up.0.res.1.conv1"
      ("decoder","mid_block","resnets",0,"conv2")   -> "decoder.mid.0.conv2"
      ("encoder","down_blocks",2,"downsampler","conv") -> "encoder.down.2.downsample"
    Covered by tests/test_quant.py: every name quantize_vae derives must
    appear in an actual vae.calibrate capture."""
    out: list[str] = []
    toks = list(path)
    i = 0
    while i < len(toks):
        t = toks[i]
        if t == "down_blocks":
            out.append("down")
        elif t == "up_blocks":
            out.append("up")
        elif t == "mid_block":
            out.append("mid")
            if i + 1 < len(toks) and toks[i + 1] == "resnets":
                i += 1  # cache keys use "mid.{j}", not "mid.res.{j}"
        elif t == "resnets":
            out.append("res")
        elif t in ("downsampler", "upsampler"):
            out.append(t.replace("sampler", "sample"))
            if i + 1 < len(toks) and toks[i + 1] == "conv":
                i += 1  # the leaf dict key "conv" is not in the name
        else:
            out.append(str(t))
        i += 1
    return ".".join(out)


def should_quantize_conv(w) -> bool:
    """The VAE conv quantization policy: FLOP-heavy AND robust only —
    spatial kernel >= 3x3 and >= 64 channels on BOTH sides. This keeps
    conv_in (3->C), conv_out (C->3), the 1x1x1 spatial-norm modulation
    convs (latent->C), and shortcut projections in bf16: together < 2% of
    the FLOPs but the most accuracy-sensitive layers."""
    if getattr(w, "ndim", 0) not in (4, 5):
        return False
    kh, kw = w.shape[-4], w.shape[-3]
    cin, cout = w.shape[-2], w.shape[-1]
    return kh >= 3 and kw >= 3 and cin >= 64 and cout >= 64


def synthetic_vae_calib(params: Params) -> dict[str, jnp.ndarray]:
    """Unit activation-amax stats for every quantizable VAE conv.

    For SPEED measurement only (bench.py): builds the same serving program
    as a real calibration — every matched conv carries "equalize_inv" and
    pays the runtime per-channel pre-scale — without needing a calibration
    run. With all-ones stats (and bench's zeros weights) the equalization
    is numerically the identity, but XLA compiles the identical op graph
    it would for real stats, so the measured seconds transfer."""
    out: dict[str, jnp.ndarray] = {}

    def walk(node, path):
        if isinstance(node, dict):
            if "kernel" in node and should_quantize_conv(node["kernel"]):
                out[calib_name(path)] = jnp.ones(
                    (node["kernel"].shape[-2],), jnp.float32
                )
            for k, v in node.items():
                walk(v, path + (k,))
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, path + (i,))

    walk(params, ())
    return out


def lowres_decoder_exclusions(params: Params) -> tuple[str, ...]:
    """The cost-aware mixed-precision exclusion set: every quantizable
    DECODER conv below the two full-resolution up levels (mid + up.0 ..
    up.{n-3}), by calib_name.

    Rationale (docs/reports/QUANT_FRONTIER.md): at 720p the decoder's FLOPs
    concentrate in the last two up levels (~89% — spatial area grows 4x per
    level while channels only halve, and the temporal upsamples have already
    doubled the frame count), while the attribution error sum is spread
    across ALL levels. Keeping the low-res levels in bf16 buys ~2.6 dB
    (first-order, sum-sq of the attribution ranking) for ~11% of decoder
    FLOPs returning to the bf16 rate. Accepted by the CLI/bench as the
    literal exclude name "lowres"."""
    n_up = len(params["decoder"]["up_blocks"])
    keep_low = tuple(f"up.{i}" for i in range(max(n_up - 2, 0)))
    names: list[str] = []

    def walk(node, path):
        if isinstance(node, dict):
            if "kernel" in node and should_quantize_conv(node["kernel"]):
                name = calib_name(path)
                if name.startswith("decoder.mid") or any(
                    name.startswith(f"decoder.{k}.") for k in keep_low
                ):
                    names.append(name)
                return
            for k, v in node.items():
                walk(v, path + (k,))
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, path + (i,))

    walk(params["decoder"], ("decoder",))
    return tuple(sorted(names))


def quantize_vae(params: Params, donate: bool = True,
                 which: str = "all",
                 calib: dict[str, jnp.ndarray] | None = None,
                 exclude: tuple[str, ...] | list[str] | None = None,
                 weight_clip: int = 0) -> Params:
    """Quantize the VAE's hot conv kernels (policy: should_quantize_conv).

    which: "all" | "decoder" | "encoder". "decoder" is the int8-dit-dec
    serving mode's half: encoder moments feed the DiT, so ENCODER
    quantization error compounds through the whole pipeline (measured: the
    full-int8 mode's 30 dB drift is encoder-dominated, while DiT-only
    drift is 49 dB — docs/reports/QUANT_FRONTIER.md); the decoder's error
    stays local to pixels.

    calib: {name: per-input-channel activation amax} from vae.calibrate —
    folds SmoothQuant-style channel equalization into each matched conv
    (see _quantize_leaf_dict). Convs without a calib entry quantize
    without equalization.

    exclude: runtime conv names (calib_name convention, e.g.
    "decoder.up.0.res.1.conv1") to KEEP IN bf16 — the mixed-precision knob
    for the per-layer drift attribution (vae.attribute_quant_error ranks
    layers; excluding the worst few trades a small speed slice for dB).
    Unknown names raise (a typo would silently quantize the layer it was
    meant to protect).

    weight_clip: candidate count for the per-channel MSE-optimal weight
    scale search (quantize_weight clip_search); 0 (default) keeps the
    plain amax grid. MEASURED to be a no-op on both synthetic weight
    families (the per-channel argmin lands on ratio 1.0: with only ~3.5k
    entries per channel the amax grid is already MSE-optimal, and heavy
    tails are too energy-dense to clip) — the knob exists for real
    checkpoints, whose per-channel statistics may differ.
    """
    if which not in ("all", "decoder", "encoder"):
        raise ValueError(f"which={which!r}")
    exclude_set = set(exclude or ())
    seen_names: set[str] = set()

    def walk(node, path):
        if isinstance(node, dict):
            if "kernel" in node and should_quantize_conv(node["kernel"]):
                name = calib_name(path)
                seen_names.add(name)
                if name in exclude_set:
                    return node
                amax = calib.get(name) if calib else None
                return _quantize_leaf_dict(
                    node, donate, with_ksum=True, calib_amax=amax,
                    clip_search=weight_clip,
                    tapcorr=calib.get(f"{name}#tapcorr") if calib else None,
                )
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, path + (i,)) for i, v in enumerate(node)]
        return node

    if which == "all":
        out = walk(params, ())
    else:
        out = {
            k: (walk(v, (k,)) if k == which else v)
            for k, v in params.items()
        }
    unknown = exclude_set - seen_names
    if unknown:
        raise ValueError(
            f"exclude names not found among quantizable convs in "
            f"which={which!r}: {sorted(unknown)}; known: "
            f"{sorted(seen_names)}"
        )
    return out
