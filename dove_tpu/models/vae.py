"""CogVideoX 3D causal VAE — TPU-native JAX implementation.

Capability-equivalent to diffusers' ``AutoencoderKLCogVideoX`` as used by the
reference (encode at lora_one_s1_trainer.py:65-70, decode at
inference_script.py:500, slicing/tiling at :643-645; SURVEY.md §2.2):

  * 8x spatial / 4x temporal compression, 16 latent channels;
  * *causal* 3D convs: temporal receptive field only looks backwards — the
    first frame of a clip is replicated as left-padding, and chunked
    processing threads an explicit ``conv cache`` (the trailing k_t-1 input
    frames of every causal conv) between chunks so chunked and whole-clip
    results are identical;
  * frame-chunked encode/decode ("slicing") and spatially tiled
    encode/decode with feathered blending ("tiling") for memory control.

TPU-first design decisions:
  * NDHWC ([B, F, H, W, C]) activation layout — channels-last keeps the
    channel dim on the 128-lane axis for MXU-friendly convolutions;
  * norms in fp32, convs in model dtype (bf16 on TPU);
  * the conv cache is a flat {path: array} dict, a stable pytree so the
    per-chunk functions jit cleanly (first chunk and steady-state chunk are
    two compiled shapes);
  * static shapes per (chunk_frames, tile_h, tile_w) geometry.

Parameter tree mirrors diffusers checkpoint naming (see dove_tpu/weights.py);
kernels are stored DHWIO.
"""

from __future__ import annotations

import math
import os
from typing import Any

import jax
import jax.numpy as jnp

from dove_tpu.config import VAEConfig

Params = dict[str, Any]
Cache = dict[str, jnp.ndarray]

# Serving-only switch for the hand-scheduled Pallas bf16 3x3x3 conv
# (ops/pallas/conv3d_int8.conv3d_bf16). Read at TRACE time by
# causal_conv3d; OFF by default because pallas_call has no autodiff rule —
# the stage-2 trainer differentiates through decode, so only the inference
# pipeline flips it on (DovePipeline.__init__, TPU + unquantized VAE), and
# only where the kernel wins (see scripts/bench_conv.py pallas-bf16 row).
# Env override DOVE_PALLAS_CONV=0/1 forces it for A/B benches.
_PALLAS_BF16_CONV = False


def set_pallas_conv(enabled: bool) -> None:
    """Enable the Pallas bf16 conv schedule for subsequent traces.

    Process-global: a Trainer built AFTER a TPU serving pipeline in the
    same process should call set_pallas_conv(False) before building its
    train step (decode-with-grad cannot differentiate the Pallas call).
    """
    global _PALLAS_BF16_CONV
    _PALLAS_BF16_CONV = enabled


def _pallas_conv_enabled() -> bool:
    env = os.environ.get("DOVE_PALLAS_CONV")
    if env is not None:
        return env not in ("0", "off", "false")
    return _PALLAS_BF16_CONV


# --- activation calibration (int8 channel equalization) --------------------
# While _CALIB is a dict, every named conv records the per-input-channel
# amax of its activation into it AT TRACE TIME (the values are traced
# arrays — calibrate_decode/calibrate_encode jit a wrapper that returns the
# drained dict, so the stats come back as device arrays). quantize_vae
# consumes them to fold a per-channel equalization into the weights
# (ops/quant.py: SmoothQuant-style, exact in fp32). Keys are
# "<scope>.<conv name>", where scope is set by encoder_/decoder_forward and
# the names mirror the conv-cache keys ("up.0.res.1.conv1", ...).
_CALIB: dict[str, jnp.ndarray] | None = None
_CALIB_SCOPE = ""


def _calib_tap(name: str | None, x: jnp.ndarray) -> None:
    if _CALIB is None or name is None:
        return
    key = f"{_CALIB_SCOPE}.{name}"
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=tuple(range(x.ndim - 1)))
    _CALIB[key] = (
        jnp.maximum(_CALIB[key], amax) if key in _CALIB else amax
    )
    tkey = f"{key}#tapcorr"
    if tkey not in _CALIB:
        # Normalized tap autocorrelation c(δ) = E[x(p)·x(p+δ)] / E[x²] over
        # δ ∈ [-2,2]³ in (frame, h, w) — the statistics behind the GPTQ
        # error-feedback weight rounding (ops/quant.py: gptq_tap_rounding):
        # a 3x3x3 conv's 27-tap Hessian is H[t,t'] = c(δ_t - δ_t'), shared
        # across channels. First capture wins (windows are representative;
        # the amax above still folds across every call via max).
        _CALIB[tkey] = _tap_autocorr(xf)


def _tap_autocorr(xf: jnp.ndarray, reach: int = 2) -> jnp.ndarray:
    """[B, F, H, W, C] -> [2r+1, 2r+1, 2r+1] normalized autocorrelation
    over (frame, h, w) shifts; entries with no valid overlap (clip shorter
    than the shift) are 0 — which degrades the derived Hessian toward
    identity, i.e. plain rounding."""
    B, F, H, W, C = xf.shape
    denom = jnp.mean(jnp.square(xf)) + 1e-12
    n = 2 * reach + 1
    rows = []
    for dt in range(-reach, reach + 1):
        for dh in range(-reach, reach + 1):
            for dw in range(-reach, reach + 1):
                ft, fh, fw = abs(dt), abs(dh), abs(dw)
                if F <= ft or H <= fh or W <= fw:
                    rows.append(jnp.zeros((), jnp.float32))
                    continue
                a = xf[:, max(dt, 0):F + min(dt, 0),
                       max(dh, 0):H + min(dh, 0),
                       max(dw, 0):W + min(dw, 0)]
                b = xf[:, max(-dt, 0):F + min(-dt, 0),
                       max(-dh, 0):H + min(-dh, 0),
                       max(-dw, 0):W + min(-dw, 0)]
                rows.append(jnp.mean(a * b) / denom)
    return jnp.stack(rows).reshape(n, n, n)


def calibrate(fn, *args):
    """Run ``fn(*args)`` once with calibration taps active; returns
    (fn output, {name: per-channel amax}) with stats as device arrays.
    Scopes ("encoder."/"decoder." key prefixes) are set by the forwards."""
    global _CALIB

    def run(*a):
        global _CALIB
        _CALIB = {}
        try:
            out = fn(*a)
            return out, dict(_CALIB)
        finally:
            _CALIB = None

    return jax.jit(run)(*args)


# --- per-layer quantization-error attribution -------------------------------
# While _QERR is a dict, every quantizable conv ALSO runs its int8 version
# on the same bf16 input and records the local output error — one bf16
# forward (with ~2x conv FLOPs) ranks every layer's drift contribution,
# instead of N recompiled leave-one-out decodes (VERDICT r4 item 6). The
# bf16 activations keep flowing, so the recorded error is each layer's OWN
# rounding error, not upstream error propagated through it — the additive
# first-order attribution. _QERR_CALIB carries vae.calibrate stats so the
# attribution measures the EQUALIZED quantizer when serving would equalize.
_QERR: dict[str, tuple[jnp.ndarray, jnp.ndarray]] | None = None
_QERR_CALIB: dict[str, jnp.ndarray] | None = None


def _qerr_active(name: str | None, p: Params) -> bool:
    if _QERR is None or name is None:
        return False
    if "kernel" not in p or "kernel_q" in p:
        return False
    from dove_tpu.ops.quant import should_quantize_conv

    return should_quantize_conv(p["kernel"])


def _qerr_leaf(p: Params, name: str) -> Params:
    from dove_tpu.ops.quant import _quantize_leaf_dict

    amax = (_QERR_CALIB or {}).get(f"{_CALIB_SCOPE}.{name}")
    return _quantize_leaf_dict(p, donate=False, with_ksum=True,
                               calib_amax=amax)


def _qerr_record(name: str, y: jnp.ndarray, y_q: jnp.ndarray) -> None:
    key = f"{_CALIB_SCOPE}.{name}"
    d = y_q.astype(jnp.float32) - y.astype(jnp.float32)
    e2 = jnp.sum(jnp.square(d))
    n2 = jnp.sum(jnp.square(y.astype(jnp.float32)))
    if key in _QERR:
        pe, pn = _QERR[key]
        _QERR[key] = (pe + e2, pn + n2)
    else:
        _QERR[key] = (e2, n2)


def attribute_quant_error(fn, *args, calib: dict | None = None):
    """Run ``fn(*args)`` once with quantization-error taps active.

    Returns (fn output, {name: (sum_sq_err, sum_sq_norm)}) as device
    arrays; per-layer relative error = sqrt(err/norm). ``calib`` applies
    SmoothQuant equalization inside the measured quantizer (the serving
    configuration under attribution). fn must run on BF16 params — leaves
    already carrying "kernel_q" are skipped (they have no bf16 reference).
    """
    global _QERR, _QERR_CALIB

    def run(*a):
        global _QERR, _QERR_CALIB
        _QERR = {}
        _QERR_CALIB = calib
        try:
            out = fn(*a)
            return out, dict(_QERR)
        finally:
            _QERR = None
            _QERR_CALIB = None

    return jax.jit(run)(*args)


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------

def _conv2d(
    p: Params, x: jnp.ndarray, strides=(1, 1), padding="VALID",
    name: str | None = None,
) -> jnp.ndarray:
    """Per-frame 2D conv: x [B, F, H, W, C], kernel [kH, kW, Cin, Cout]."""
    B, F = x.shape[:2]
    _calib_tap(name, x)
    if _qerr_active(name, p):  # attribution: also run the int8 version
        y_q = _conv2d(_qerr_leaf(p, name), x, strides, padding)
        y = _conv2d(p, x, strides, padding)  # name omitted: no re-tap
        _qerr_record(name, y, y_q)
        return y
    if "kernel_q" in p:  # int8 serving mode (ops/quant.py)
        # run as a kt=1 3D conv: XLA's int8 MXU path engages for NDHWC 3D
        # convs but not the 2D lowering (measured; see causal_conv3d)
        from dove_tpu.ops.quant import qconv

        pad3 = padding if isinstance(padding, str) else (
            ((0, 0),) + tuple(padding)
        )
        p3 = {**p, "kernel_q": p["kernel_q"][None]}
        if "kernel_ksum" in p:
            p3["kernel_ksum"] = p["kernel_ksum"][None]
        y = qconv(
            p3, x, (1,) + tuple(strides), pad3,
            ("NDHWC", "DHWIO", "NDHWC"),
        )
        return y
    y = jax.lax.conv_general_dilated(
        x.reshape((B * F,) + x.shape[2:]),
        p["kernel"].astype(x.dtype),
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y.reshape((B, F) + y.shape[1:])


def causal_conv3d(
    p: Params, x: jnp.ndarray, cache: jnp.ndarray | None,
    name: str | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray | None]:
    """Causal 3D conv: temporal left-context from cache (or first-frame
    replicate at clip start), symmetric zero spatial padding.

    Lowered as k_t frame-shifted 2D convolutions batched over frames — XLA's
    TPU 2D conv path is substantially faster than the generic 3D lowering,
    and the temporal taps become a k_t-term accumulation of [B*F, H, W, C]
    convs. Numerically identical to the direct 3D convolution.

    Returns (output, new_cache) where new_cache holds the trailing k_t-1
    input frames for the next chunk.
    """
    _calib_tap(name, x)
    if _qerr_active(name, p):  # attribution: also run the int8 version
        y_q, _ = causal_conv3d(_qerr_leaf(p, name), x, cache)
        y, new_cache = causal_conv3d(p, x, cache)  # name omitted: no re-tap
        _qerr_record(name, y, y_q)
        return y, new_cache
    quantized = "kernel_q" in p
    kernel_leaf = p["kernel_q"] if quantized else p["kernel"]
    kt, kh, kw = kernel_leaf.shape[:3]
    if kt > 1:
        if cache is None:
            left = jnp.repeat(x[:, :1], kt - 1, axis=1)
        else:
            left = cache.astype(x.dtype)
        x = jnp.concatenate([left, x], axis=1)
        new_cache = x[:, -(kt - 1):]
    else:
        new_cache = None

    B, Ft, H, W, C = x.shape
    F = Ft - (kt - 1)
    pad_h, pad_w = (kh - 1) // 2, (kw - 1) // 2
    pad = ((pad_h, pad_h), (pad_w, pad_w))
    # The tap-stacked lowering materializes a k_t*C-channel activation copy
    # (3x the input). All windowed-tile bodies stay BELOW this threshold and
    # keep the stacked lowering (measured fastest); only full-frame 720p+
    # chunks (multi-GB copies) fall back to k_t separate 2D convs accumulated
    # — measured perf-neutral at tile sizes, 3x less live activation memory.
    stack_taps = kt == 1 or (B * F * H * W * C * kt) <= (1 << 30)

    def conv2d_raw(xs, kernel, pet=None):
        return jax.lax.conv_general_dilated(
            xs, kernel, (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet,
        )

    def run_conv(xs, kernel):
        if quantized:
            from dove_tpu.ops.quant import (
                dynamic_quant, dynamic_quant_asym, equalize_input,
                ksum_correction,
            )

            if "kernel_ksum" in p:  # asymmetric activations (quant.py)
                # equalization folds INTO the quantizer (no fp32 buffer)
                xs_q, s_x, m_x = dynamic_quant_asym(
                    xs, eq_inv=p.get("equalize_inv")
                )
            else:
                xs_q, s_x = dynamic_quant(equalize_input(p, xs))
                m_x = None
            acc = conv2d_raw(xs_q, kernel, jnp.int32)
            y = acc.astype(jnp.float32) * (s_x * p["kernel_scale"])
            if m_x is not None:
                ks = p["kernel_ksum"]
                corr = ksum_correction(
                    {"kernel_ksum": ks[0] if ks.ndim == 5 else ks},
                    xs.shape[:-1] + (1,), (1, 1), pad,
                    ("NHWC", "HWIO", "NHWC"), jnp.float32,
                )
                y = y + (m_x * p["kernel_scale"]) * corr
            return y
        return conv2d_raw(xs, kernel.astype(x.dtype))

    if quantized and kt > 1:
        # int8 path uses the DIRECT 3D lowering: measured on this chip, XLA's
        # int8 MXU mode engages for NDHWC 3D convs (74 -> 98 TOP/s) but NOT
        # for the tap-stacked 2D lowering (35 -> 34); bf16 keeps stacked-2D.
        from dove_tpu.ops.quant import (
            dynamic_quant, dynamic_quant_asym, equalize_input,
            ksum_correction,
        )

        pad3 = ((0, 0), (pad_h, pad_h), (pad_w, pad_w))
        if "kernel_ksum" in p:  # asymmetric activations (quant.py)
            # equalization folds INTO the quantizer (no fp32 buffer)
            x_q, s_x, m_x = dynamic_quant_asym(x, eq_inv=p.get("equalize_inv"))
        else:
            x_q, s_x = dynamic_quant(equalize_input(p, x))
            m_x = None
        acc = jax.lax.conv_general_dilated(
            x_q, kernel_leaf, (1, 1, 1), pad3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (s_x * p["kernel_scale"])
        if m_x is not None:
            corr = ksum_correction(
                p, x.shape[:-1] + (1,), (1, 1, 1), pad3,
                ("NDHWC", "DHWIO", "NDHWC"), jnp.float32,
            )
            y = y + (m_x * p["kernel_scale"]) * corr
        if "bias" in p:
            y = y + p["bias"].astype(jnp.float32)
        return y.astype(x.dtype), new_cache

    if (
        not quantized
        and kt == 3 and kh == 3 and kw == 3
        and C % 128 == 0 and kernel_leaf.shape[-1] % 128 == 0
        and _pallas_conv_enabled()
    ):
        # Hand-scheduled 27-tap-matmul Pallas kernel (serving only, see
        # set_pallas_conv). Spatial same-padding happens here (the kernel
        # computes VALID); temporal padding is the cache concat above.
        from dove_tpu.ops.pallas.conv3d_int8 import conv3d_bf16

        xp = jnp.pad(
            x, ((0, 0), (0, 0), (pad_h, pad_h), (pad_w, pad_w), (0, 0))
        )
        kb = kernel_leaf.astype(jnp.bfloat16)
        y = jnp.stack(
            [conv3d_bf16(xp[b], kb, out_dtype=x.dtype) for b in range(B)]
        )
        if "bias" in p:
            y = y + p["bias"].astype(y.dtype)
        return y.astype(x.dtype), new_cache

    if kt == 1:
        y = run_conv(x.reshape(B * F, H, W, C), kernel_leaf[0])
    elif stack_taps:
        # Stack the k_t temporal taps along input channels: one conv with a
        # k_t*C contraction instead of k_t separate convs — fewer kernel
        # launches and a wider MXU contraction. Exactly equivalent.
        xs = jnp.concatenate(
            [x[:, dt : dt + F] for dt in range(kt)], axis=-1
        ).reshape(B * F, H, W, kt * C)
        y = run_conv(
            xs, kernel_leaf.transpose(1, 2, 0, 3, 4).reshape(kh, kw, kt * C, -1)
        )
    else:
        # per-tap accumulation IN FP32 (bf16 partial sums would add two
        # extra roundings per element vs the stacked lowering's single
        # fp32-accumulated contraction, breaking bit-parity across paths)
        y = sum(
            conv2d_raw(
                jax.lax.slice_in_dim(x, dt, dt + F, axis=1).reshape(B * F, H, W, C),
                kernel_leaf[dt].astype(x.dtype),
                jnp.float32,
            )
            for dt in range(kt)
        ).astype(x.dtype)
    y = y.reshape(B, F, H, W, -1)
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y.astype(x.dtype), new_cache


def _group_norm(p: Params, x: jnp.ndarray, groups: int, eps: float) -> jnp.ndarray:
    """GroupNorm with fp32 statistics but NO materialized fp32 activation
    copy: reductions accumulate in fp32 (fused cast-into-reduce), the
    normalize/affine runs in the model dtype with per-group fp32 scalars.
    Keeps decoder peak HBM ~2x lower at 720p tiles."""
    B, F, H, W, C = x.shape
    xg = x.reshape(B, F, H, W, groups, C // groups)
    mean = jnp.mean(xg, axis=(1, 2, 3, 5), keepdims=True, dtype=jnp.float32)
    var = jnp.mean(
        jnp.square(xg.astype(jnp.float32)), axis=(1, 2, 3, 5), keepdims=True
    ) - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    y = (xg.astype(jnp.float32) - mean) * inv
    y = y.astype(x.dtype).reshape(B, F, H, W, C)
    return y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _nearest_resize(x: jnp.ndarray, f: int, h: int, w: int) -> jnp.ndarray:
    """Integer-factor nearest upsampling of [B, F, H, W, C] to (f, h, w)."""
    B, F, H, W, C = x.shape
    assert f % F == 0 and h % H == 0 and w % W == 0, (x.shape, (f, h, w))
    if f != F:
        x = jnp.repeat(x, f // F, axis=1)
    if h != H:
        x = jnp.repeat(x, h // H, axis=2)
    if w != W:
        x = jnp.repeat(x, w // W, axis=3)
    return x


def _nearest_resize_causal(
    z: jnp.ndarray, f: int, h: int, w: int, first: bool = True
) -> jnp.ndarray:
    """Nearest upsample with the causal first-frame convention: when the
    target length is odd (>1), the first frame upsamples alone and the rest
    share the remaining factor. ``first=False`` (a continuation segment in
    cache-threaded streaming decode — the clip's real first frame lives in
    an earlier segment) always uses the uniform path."""
    if first and f > 1 and f % 2 == 1:
        zf = _nearest_resize(z[:, :1], 1, h, w)
        zr = _nearest_resize(z[:, 1:], f - 1, h, w)
        return jnp.concatenate([zf, zr], axis=1)
    return _nearest_resize(z, f, h, w)


def _spatial_norm3d(
    p: Params, x: jnp.ndarray, zq: jnp.ndarray, groups: int, eps: float,
    first: bool = True,
) -> jnp.ndarray:
    """GroupNorm(x) modulated by conv_y/conv_b of the (nearest-upsampled)
    latent.

    The modulation convs are 1x1x1, so they COMMUTE with nearest upsampling:
    compute them at latent resolution and upsample the results — the
    upsample is a broadcast XLA fuses into the multiply/add, instead of two
    materialized full-resolution modulation maps (~0.8 GB each at 720p
    decode tiles). Numerically identical to upsample-then-conv.
    """
    B, F, H, W, C = x.shape
    conv_y, _ = causal_conv3d(p["conv_y"], zq, None)
    conv_b, _ = causal_conv3d(p["conv_b"], zq, None)
    conv_y = _nearest_resize_causal(conv_y, F, H, W, first)
    conv_b = _nearest_resize_causal(conv_b, F, H, W, first)
    normed = _group_norm(p["norm_layer"], x, groups, eps)
    return normed * conv_y + conv_b


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _resnet(
    cfg: VAEConfig,
    p: Params,
    x: jnp.ndarray,
    zq: jnp.ndarray | None,
    cache: Cache,
    new_cache: Cache,
    path: str,
    first: bool = True,
) -> jnp.ndarray:
    def norm(name: str, h: jnp.ndarray) -> jnp.ndarray:
        if zq is None:
            return _group_norm(p[name], h, cfg.norm_num_groups, cfg.norm_eps)
        return _spatial_norm3d(
            p[name], h, zq, cfg.norm_num_groups, cfg.norm_eps, first
        )

    h = jax.nn.silu(norm("norm1", x))
    h, new_cache[f"{path}.conv1"] = causal_conv3d(
        p["conv1"], h, cache.get(f"{path}.conv1"), name=f"{path}.conv1"
    )
    h = jax.nn.silu(norm("norm2", h))
    h, new_cache[f"{path}.conv2"] = causal_conv3d(
        p["conv2"], h, cache.get(f"{path}.conv2"), name=f"{path}.conv2"
    )
    if "conv_shortcut" in p:
        x, _ = causal_conv3d(
            p["conv_shortcut"], x, None, name=f"{path}.conv_shortcut"
        )
    return x + h


def _downsample(
    p: Params, x: jnp.ndarray, compress_time: bool,
    name: str | None = None,
) -> jnp.ndarray:
    """Spatial stride-2 conv with (0,1) asymmetric pad; optional 2x temporal
    mean-pool with causal first-frame passthrough on odd lengths."""
    if compress_time:
        B, F, H, W, C = x.shape
        if F % 2 == 1:
            first, rest = x[:, :1], x[:, 1:]
            if rest.shape[1] > 0:
                rest = rest.reshape(B, rest.shape[1] // 2, 2, H, W, C).mean(axis=2)
            x = jnp.concatenate([first, rest], axis=1)
        else:
            x = x.reshape(B, F // 2, 2, H, W, C).mean(axis=2)
    pad = ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0))
    x = jnp.pad(x, pad)
    return _conv2d(p["conv"], x, strides=(2, 2), name=name)


def _upsample(
    p: Params, x: jnp.ndarray, compress_time: bool, first: bool = True,
    name: str | None = None,
) -> jnp.ndarray:
    """2x nearest upsample (spatial, and temporal when compress_time) + conv.

    The causal convention replicates the clip's FIRST frame alone (an odd
    segment length means the leading frame is the clip start). For a
    continuation segment (``first=False``, streaming cache-threaded decode)
    every frame doubles — the clip's first frame lives in segment 0."""
    B, F, H, W, C = x.shape
    if compress_time:
        if first and F > 1 and F % 2 == 1:
            head = _nearest_resize(x[:, :1], 1, H * 2, W * 2)
            rest = _nearest_resize(x[:, 1:], (F - 1) * 2, H * 2, W * 2)
            x = jnp.concatenate([head, rest], axis=1)
        elif F > 1 or not first:
            x = _nearest_resize(x, F * 2, H * 2, W * 2)
        else:
            x = _nearest_resize(x, 1, H * 2, W * 2)
    else:
        x = _nearest_resize(x, F, H * 2, W * 2)
    return _conv2d(p["conv"], x, padding=((1, 1), (1, 1)), name=name)


# ---------------------------------------------------------------------------
# Encoder / Decoder (single chunk, cache-threaded)
# ---------------------------------------------------------------------------

def encoder_forward(
    cfg: VAEConfig, params: Params, x: jnp.ndarray, cache: Cache | None
) -> tuple[jnp.ndarray, Cache]:
    """Pixels [B, F, H, W, 3] -> moments [B, F', H/8, W/8, 2*latent]."""
    global _CALIB_SCOPE
    if _CALIB is not None or _QERR is not None:
        _CALIB_SCOPE = "encoder"
    cache = cache or {}
    nc: Cache = {}
    h, nc["conv_in"] = causal_conv3d(
        params["conv_in"], x, cache.get("conv_in"), name="conv_in"
    )

    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        bp = params["down_blocks"][i]
        for j in range(cfg.layers_per_block):
            h = _resnet(
                cfg, bp["resnets"][j], h, None, cache, nc, f"down.{i}.res.{j}"
            )
        if i < n_blocks - 1:
            h = _downsample(
                bp["downsampler"], h, i < cfg.temporal_compress_level,
                name=f"down.{i}.downsample",
            )

    for j in range(2):
        h = _resnet(cfg, params["mid_block"]["resnets"][j], h, None, cache, nc, f"mid.{j}")

    h = jax.nn.silu(_group_norm(params["norm_out"], h, cfg.norm_num_groups, cfg.norm_eps))
    h, nc["conv_out"] = causal_conv3d(
        params["conv_out"], h, cache.get("conv_out"), name="conv_out"
    )
    return h, nc


def decoder_forward(
    cfg: VAEConfig, params: Params, z: jnp.ndarray, cache: Cache | None,
    remat: bool = False,
) -> tuple[jnp.ndarray, Cache]:
    """Latent [B, F', H/8, W/8, latent] -> pixels [B, F, H, W, 3] in [-1, 1].

    ``cache is None`` marks the CLIP's first segment: the leading latent is
    the causally-special first frame (odd-length temporal upsampling, causal
    left padding). With a cache, this is a continuation segment — uniform
    temporal upsampling and conv left-context from the cache.

    ``remat`` checkpoints each decoder LEVEL (mid block; each up level
    incl. its upsampler) with jax.checkpoint: the stage-2 decode-WITH-GRAD
    backward then saves only the ~5 level-boundary tensors and recomputes
    one level at a time. Level granularity matters — per-RESNET
    checkpointing saves every block input, and at the full-res levels
    those are the same size as the activations it avoids (AOT-measured: no
    temp reduction), while level inputs are 4-16x coarser. This is the
    lever that shrinks the published S2 pixel loss's step footprint
    (docs/reports/TRAIN_AOT.json); inference never needs it."""
    global _CALIB_SCOPE
    if _CALIB is not None or _QERR is not None:
        _CALIB_SCOPE = "decoder"
    first = cache is None
    cache = cache or {}
    nc: Cache = {}

    def run_level(fn, p, h, zq):
        if not remat:
            nc2: Cache = {}
            out = fn(p, h, zq, nc2)
            nc.update(nc2)
            return out

        def pure(pp, hh, zz):
            nc2: Cache = {}
            return fn(pp, hh, zz, nc2), nc2

        out, nc2 = jax.checkpoint(pure)(p, h, zq)
        nc.update(nc2)
        return out

    h, nc["conv_in"] = causal_conv3d(
        params["conv_in"], z, cache.get("conv_in"), name="conv_in"
    )

    def mid_level(p, h, zq, nc2):
        for j in range(2):
            h = _resnet(cfg, p["resnets"][j], h, zq, cache, nc2,
                        f"mid.{j}", first)
        return h

    h = run_level(mid_level, params["mid_block"], h, z)

    n_blocks = len(cfg.block_out_channels)
    for i in range(n_blocks):
        def up_level(p, h, zq, nc2, i=i):
            for j in range(cfg.layers_per_block + 1):
                h = _resnet(cfg, p["resnets"][j], h, zq, cache, nc2,
                            f"up.{i}.res.{j}", first)
            if i < n_blocks - 1:
                h = _upsample(
                    p["upsampler"], h, i < cfg.temporal_compress_level,
                    first, name=f"up.{i}.upsample",
                )
            return h

        h = run_level(up_level, params["up_blocks"][i], h, z)

    h = jax.nn.silu(
        _spatial_norm3d(
            params["norm_out"], h, z, cfg.norm_num_groups, cfg.norm_eps, first
        )
    )
    h, nc["conv_out"] = causal_conv3d(
        params["conv_out"], h, cache.get("conv_out"), name="conv_out"
    )
    return h, nc


# ---------------------------------------------------------------------------
# Frame-chunked ("sliced") encode / decode
# ---------------------------------------------------------------------------

def _frame_chunks(num_frames: int, batch: int) -> list[tuple[int, int]]:
    """Chunk layout: the F % batch remainder rides with the FIRST chunk, so
    the first chunk carries the causal odd frame ((F-1) % 4 == 0 inputs)."""
    num_batches = max(num_frames // batch, 1)
    rem = num_frames % batch
    spans = []
    for i in range(num_batches):
        start = batch * i + (0 if i == 0 else rem)
        end = batch * (i + 1) + rem
        spans.append((start, min(end, num_frames)))
    return spans


def encode_moments_cached(
    cfg: VAEConfig,
    params: Params,
    video: jnp.ndarray,
    cache: Cache | None,
    chunk_frames: int | None = None,
) -> tuple[jnp.ndarray, Cache]:
    """Segment encode threading the causal conv cache ACROSS calls.

    The streaming pipeline (dove_tpu/pipeline.py) feeds a long clip through
    fixed-size segments: the first segment starts with ``cache=None`` (clip
    start: causal first-frame padding), every later call passes the previous
    call's returned cache. Continuation segments MUST have a frame count
    divisible by ``temporal_compression_ratio`` so the temporal mean-pool
    windows stay aligned with whole-clip processing (``_downsample`` treats
    an odd leading frame as the clip's causal first frame).

    Causal-conv continuity across segments is exact; GroupNorm statistics
    span each internal frame chunk (same character as diffusers'
    frame-batched processing — see tests/test_vae.py header note).
    """
    if cache is not None:
        assert video.shape[1] % cfg.temporal_compression_ratio == 0, (
            "continuation segments must be a multiple of the temporal ratio",
            video.shape,
        )
    chunk = chunk_frames or cfg.sample_frames_batch_size
    outs = []
    for s, e in _frame_chunks(video.shape[1], chunk):
        m, cache = encoder_forward(cfg, params["encoder"], video[:, s:e], cache)
        outs.append(m)
    moments = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return moments, cache


def encode_moments(
    cfg: VAEConfig, params: Params, video: jnp.ndarray, chunk_frames: int | None = None
) -> jnp.ndarray:
    """Full-clip encode with frame chunking. video: [B, F, H, W, 3] in [-1,1]."""
    moments, _ = encode_moments_cached(cfg, params, video, None, chunk_frames)
    return moments


def sample_latent(
    moments: jnp.ndarray, rng: jax.Array | None, scaling_factor: float
) -> jnp.ndarray:
    """Diagonal-Gaussian sample (or mean when rng is None), scaled."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if rng is not None:
        logvar = jnp.clip(logvar, -30.0, 20.0)
        std = jnp.exp(0.5 * logvar.astype(jnp.float32))
        mean = mean + (std * jax.random.normal(rng, std.shape, jnp.float32)).astype(
            mean.dtype
        )
    return mean * jnp.asarray(scaling_factor, mean.dtype)


def decode_cached(
    cfg: VAEConfig,
    params: Params,
    latent: jnp.ndarray,
    cache: Cache | None,
    chunk_frames: int | None = None,
    remat: bool = False,
) -> tuple[jnp.ndarray, Cache]:
    """Segment decode threading the causal conv cache ACROSS calls.

    Counterpart of :func:`encode_moments_cached` for the streaming pipeline:
    the first latent segment of a clip passes ``cache=None`` (its leading
    latent is the clip's causal first frame), later segments pass the
    previous call's cache and get exact causal-conv continuity. Continuation
    segments see only even temporal upsampling (the odd-first-frame rule
    applies to the clip's global first latent, which lives in segment 0)."""
    chunk = chunk_frames or cfg.latent_frames_batch_size
    outs = []
    for s, e in _frame_chunks(latent.shape[1], chunk):
        y, cache = decoder_forward(
            cfg, params["decoder"], latent[:, s:e], cache, remat=remat
        )
        outs.append(y)
    pixels = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return pixels, cache


def decode(
    cfg: VAEConfig, params: Params, latent: jnp.ndarray, chunk_frames: int | None = None,
    remat: bool = False,
) -> jnp.ndarray:
    """Full-clip decode with latent-frame chunking. latent: [B, F', h, w, C]
    already divided by scaling_factor."""
    pixels, _ = decode_cached(cfg, params, latent, None, chunk_frames, remat=remat)
    return pixels


# ---------------------------------------------------------------------------
# Spatially tiled ("tiled") encode / decode with feathered blending
#
# Capability parity with diffusers' AutoencoderKLCogVideoX.enable_tiling()
# used by the reference at /root/reference/inference_script.py:643-645. This
# is the VAE's *internal* memory-control tiler (linear feather blending in the
# overlap band) — distinct from the pipeline's outer exact-coverage tiler
# (dove_tpu/tiling.py). Host-side Python loops over jitted per-tile encodes.
# ---------------------------------------------------------------------------

def _blend_v(a: jnp.ndarray, b: jnp.ndarray, extent: int) -> jnp.ndarray:
    """Linear vertical feather: blend b's top `extent` rows with a's bottom."""
    extent = min(a.shape[2], b.shape[2], extent)
    if extent <= 0:
        return b
    w = (jnp.arange(extent, dtype=jnp.float32) / extent).reshape(1, 1, -1, 1, 1)
    top = a[:, :, -extent:].astype(jnp.float32) * (1 - w) + b[
        :, :, :extent
    ].astype(jnp.float32) * w
    return jnp.concatenate([top.astype(b.dtype), b[:, :, extent:]], axis=2)


def _blend_h(a: jnp.ndarray, b: jnp.ndarray, extent: int) -> jnp.ndarray:
    """Linear horizontal feather: blend b's left `extent` cols with a's right."""
    extent = min(a.shape[3], b.shape[3], extent)
    if extent <= 0:
        return b
    w = (jnp.arange(extent, dtype=jnp.float32) / extent).reshape(1, 1, 1, -1, 1)
    left = a[:, :, :, -extent:].astype(jnp.float32) * (1 - w) + b[
        :, :, :, :extent
    ].astype(jnp.float32) * w
    return jnp.concatenate([left.astype(b.dtype), b[:, :, :, extent:]], axis=3)


def tiled_encode_moments(
    cfg: VAEConfig, params: Params, video: jnp.ndarray,
    chunk_frames: int | None = None, encode_fn=None,
) -> jnp.ndarray:
    """Tiled full-clip encode. video: [B, F, H, W, 3] -> moments (feathered).

    encode_fn overrides the per-tile encoder (e.g. a jitted closure so the
    host-side tile loop reuses one compiled program per tile geometry)."""
    if encode_fn is None:
        encode_fn = lambda tile: encode_moments(cfg, params, tile, chunk_frames)
    H, W = video.shape[2], video.shape[3]
    s = cfg.spatial_scale
    tile_h, tile_w = cfg.tile_sample_min_height, cfg.tile_sample_min_width
    if H <= tile_h and W <= tile_w:
        return encode_fn(video)
    lat_h, lat_w = tile_h // s, tile_w // s
    # Sampling stride derived FROM the placement size (latent units * s) so
    # sampled and assembled tile positions align exactly (see
    # VAEConfig.tile_geometry).
    blend_h, stride_h = cfg.tile_geometry(lat_h, cfg.tile_overlap_factor_height)
    blend_w, stride_w = cfg.tile_geometry(lat_w, cfg.tile_overlap_factor_width)
    overlap_h, overlap_w = stride_h * s, stride_w * s
    row_limit_h = lat_h - blend_h
    row_limit_w = lat_w - blend_w

    rows = []
    for i in range(0, H, overlap_h):
        row = []
        for j in range(0, W, overlap_w):
            tile = video[:, :, i : i + tile_h, j : j + tile_w]
            row.append(encode_fn(tile))
        rows.append(row)

    result_rows = []
    for i, row in enumerate(rows):
        out_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = _blend_v(rows[i - 1][j], tile, blend_h)
            if j > 0:
                tile = _blend_h(row[j - 1], tile, blend_w)
            out_row.append(tile[:, :, :row_limit_h, :row_limit_w])
        result_rows.append(jnp.concatenate(out_row, axis=3))
    out = jnp.concatenate(result_rows, axis=2)
    # Exact output geometry regardless of tail-tile remainders.
    return out[:, :, : H // s, : W // s]


def tiled_decode(
    cfg: VAEConfig, params: Params, latent: jnp.ndarray,
    chunk_frames: int | None = None, decode_fn=None,
) -> jnp.ndarray:
    """Tiled full-clip decode. latent: [B, F', h, w, C] (unscaled) -> pixels."""
    if decode_fn is None:
        decode_fn = lambda tile: decode(cfg, params, tile, chunk_frames)
    h, w = latent.shape[2], latent.shape[3]
    s = cfg.spatial_scale
    lat_h = cfg.decode_tile_latent_height or cfg.tile_sample_min_height // s
    lat_w = cfg.decode_tile_latent_width or cfg.tile_sample_min_width // s
    tile_h, tile_w = lat_h * s, lat_w * s
    if h <= lat_h and w <= lat_w:
        return decode_fn(latent)
    # Aligned sampling/placement geometry (see VAEConfig.tile_geometry):
    # latent sampling stride = lat_tile - blend_lat, pixel blend = blend_lat*s.
    blend_lat_h, overlap_h = cfg.tile_geometry(lat_h, cfg.tile_overlap_factor_height)
    blend_lat_w, overlap_w = cfg.tile_geometry(lat_w, cfg.tile_overlap_factor_width)
    blend_h, blend_w = blend_lat_h * s, blend_lat_w * s
    row_limit_h = tile_h - blend_h
    row_limit_w = tile_w - blend_w

    rows = []
    for i in range(0, h, overlap_h):
        row = []
        for j in range(0, w, overlap_w):
            tile = latent[:, :, i : i + lat_h, j : j + lat_w]
            row.append(decode_fn(tile))
        rows.append(row)

    result_rows = []
    for i, row in enumerate(rows):
        out_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = _blend_v(rows[i - 1][j], tile, blend_h)
            if j > 0:
                tile = _blend_h(row[j - 1], tile, blend_w)
            out_row.append(tile[:, :, :row_limit_h, :row_limit_w])
        result_rows.append(jnp.concatenate(out_row, axis=3))
    out = jnp.concatenate(result_rows, axis=2)
    return out[:, :, : h * s, : w * s]


def _np_blend(a, b, extent: int, axis: int):
    """Feathered linear cross-fade of b's leading band with a's trailing
    band along ``axis`` (NumPy host-side counterpart of _blend_v/_blend_h)."""
    import numpy as np

    extent = min(a.shape[axis], b.shape[axis], extent)
    if extent <= 0:
        return b
    shape = [1] * b.ndim
    shape[axis] = extent
    wgt = (np.arange(extent, dtype=np.float32) / extent).reshape(shape)
    a_band = np.take(a, range(a.shape[axis] - extent, a.shape[axis]), axis)
    b_band = np.take(b, range(extent), axis)
    rest = np.take(b, range(extent, b.shape[axis]), axis)
    return np.concatenate([a_band * (1 - wgt) + b_band * wgt, rest], axis)


def _host_rows_assemble(
    dispatch_row, n_rows: int, blend_h: int, blend_w: int,
    row_limit_h: int, row_limit_w: int, out_h: int, out_w: int,
):
    """Row-ahead pipelined host assembly shared by the tiled encode/decode
    host paths: dispatch row ri+1's device work before pulling row ri, blend
    feathered bands in NumPy, crop to the stride grid, final-crop the output.

    dispatch_row(ri) -> list of in-flight device tiles for row ri (or
    anything np.asarray can pull); device HBM only ever holds one extra row.
    """
    import numpy as np

    prev_row: list = []
    result_rows = []
    pending = dispatch_row(0)
    for ri in range(n_rows):
        nxt = dispatch_row(ri + 1) if ri + 1 < n_rows else None
        row = [np.asarray(t, np.float32) for t in pending]
        pending = nxt
        out_row = []
        for j, tile in enumerate(row):
            if prev_row:
                tile = _np_blend(prev_row[j], tile, blend_h, 2)
            if j > 0:
                tile = _np_blend(row[j - 1], tile, blend_w, 3)
            out_row.append(tile[:, :, :row_limit_h, :row_limit_w])
        result_rows.append(np.concatenate(out_row, axis=3))
        prev_row = row
    out = np.concatenate(result_rows, axis=2)
    return out[:, :, :out_h, :out_w]


def tiled_encode_moments_host(
    cfg: VAEConfig, video_shape: tuple, encode_fn,
) -> "np.ndarray":
    """Host-assembled tiled encode (counterpart of tiled_decode_host): tile
    moments are tiny (~2 MB), so pulling them to host and blending in NumPy
    removes every eager device op from the staged path — each eager dispatch
    costs real latency through a remote TPU tunnel.

    encode_fn(i0, i1, j0, j1) -> np moments for that pixel window.
    video_shape: (B, F, H, W, 3).
    """
    import numpy as np

    H, W = video_shape[2], video_shape[3]
    s = cfg.spatial_scale
    tile_h, tile_w = cfg.tile_sample_min_height, cfg.tile_sample_min_width
    if H <= tile_h and W <= tile_w:
        return np.asarray(encode_fn(0, H, 0, W), np.float32)
    lat_h, lat_w = tile_h // s, tile_w // s
    # Aligned sampling/placement geometry (see VAEConfig.tile_geometry).
    blend_h, stride_h = cfg.tile_geometry(lat_h, cfg.tile_overlap_factor_height)
    blend_w, stride_w = cfg.tile_geometry(lat_w, cfg.tile_overlap_factor_width)
    overlap_h, overlap_w = stride_h * s, stride_w * s
    row_limit_h = lat_h - blend_h
    row_limit_w = lat_w - blend_w

    row_starts = list(range(0, H, overlap_h))

    def dispatch(ri):
        i = row_starts[ri]
        return [
            encode_fn(i, min(i + tile_h, H), j, min(j + tile_w, W))
            for j in range(0, W, overlap_w)
        ]

    return _host_rows_assemble(
        dispatch, len(row_starts), blend_h, blend_w,
        row_limit_h, row_limit_w, H // s, W // s,
    )


def tiled_decode_host(
    cfg: VAEConfig, latent_shape: tuple, decode_fn,
) -> "np.ndarray":
    """Host-assembled tiled decode: each decoded pixel tile is pulled to host
    immediately and the feathered blending runs in NumPy, so device HBM only
    ever holds ONE in-flight tile (the decoded rows of a 720p clip otherwise
    sum to multiple GB next to the resident DiT weights).

    decode_fn(i0, i1, j0, j1) -> np.ndarray pixel tile for that latent window.
    latent_shape: (B, F', h, w, C).
    """
    import numpy as np

    h, w = latent_shape[2], latent_shape[3]
    s = cfg.spatial_scale
    lat_h = cfg.decode_tile_latent_height or cfg.tile_sample_min_height // s
    lat_w = cfg.decode_tile_latent_width or cfg.tile_sample_min_width // s
    tile_h, tile_w = lat_h * s, lat_w * s
    if h <= lat_h and w <= lat_w:
        return np.asarray(decode_fn(0, h, 0, w), np.float32)
    # Aligned sampling/placement geometry (see VAEConfig.tile_geometry).
    blend_lat_h, overlap_h = cfg.tile_geometry(lat_h, cfg.tile_overlap_factor_height)
    blend_lat_w, overlap_w = cfg.tile_geometry(lat_w, cfg.tile_overlap_factor_width)
    blend_h, blend_w = blend_lat_h * s, blend_lat_w * s
    row_limit_h = tile_h - blend_h
    row_limit_w = tile_w - blend_w

    # Row-ahead pipelining (see _host_rows_assemble). One extra row of
    # decoded tiles lives on device at a time — bounded, unlike full-clip
    # accumulation.
    row_starts = list(range(0, h, overlap_h))

    def dispatch(ri):
        i = row_starts[ri]
        return [
            decode_fn(i, min(i + lat_h, h), j, min(j + lat_w, w))
            for j in range(0, w, overlap_w)
        ]

    return _host_rows_assemble(
        dispatch, len(row_starts), blend_h, blend_w,
        row_limit_h, row_limit_w, h * s, w * s,
    )


# ---------------------------------------------------------------------------
# Initialization (random weights; checkpoints load via weights.py)
# ---------------------------------------------------------------------------

def _init_conv(key, kt, kh, kw, cin, cout, dtype=jnp.float32) -> Params:
    fan_in = kt * kh * kw * cin
    k = 1.0 / math.sqrt(fan_in)
    return {
        "kernel": jax.random.uniform(key, (kt, kh, kw, cin, cout), dtype, -k, k),
        "bias": jnp.zeros((cout,), dtype),
    }


def _init_conv2d(key, kh, kw, cin, cout, dtype=jnp.float32) -> Params:
    k = 1.0 / math.sqrt(kh * kw * cin)
    return {
        "kernel": jax.random.uniform(key, (kh, kw, cin, cout), dtype, -k, k),
        "bias": jnp.zeros((cout,), dtype),
    }


def _init_gn(ch: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype)}


def _init_resnet(key, cin, cout, zq_ch: int | None, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 7)

    def norm(k, ch):
        if zq_ch is None:
            return _init_gn(ch, dtype)
        return {
            "norm_layer": _init_gn(ch, dtype),
            "conv_y": _init_conv(k, 1, 1, 1, zq_ch, ch, dtype),
            "conv_b": _init_conv(jax.random.fold_in(k, 1), 1, 1, 1, zq_ch, ch, dtype),
        }

    p = {
        "norm1": norm(ks[0], cin),
        "conv1": _init_conv(ks[1], 3, 3, 3, cin, cout, dtype),
        "norm2": norm(ks[2], cout),
        "conv2": _init_conv(ks[3], 3, 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = _init_conv(ks[4], 1, 1, 1, cin, cout, dtype)
    return p


def init_vae_params(key: jax.Array, cfg: VAEConfig, dtype=jnp.float32) -> Params:
    chans = cfg.block_out_channels
    n = len(chans)
    keys = iter(jax.random.split(key, 200))

    def nk():
        return next(keys)

    # Encoder
    down_blocks = []
    cin = chans[0]
    for i in range(n):
        cout = chans[i]
        resnets = []
        for j in range(cfg.layers_per_block):
            resnets.append(_init_resnet(nk(), cin if j == 0 else cout, cout, None, dtype))
        bp: Params = {"resnets": resnets}
        if i < n - 1:
            bp["downsampler"] = {"conv": _init_conv2d(nk(), 3, 3, cout, cout, dtype)}
        down_blocks.append(bp)
        cin = cout
    encoder = {
        "conv_in": _init_conv(nk(), 3, 3, 3, cfg.in_channels, chans[0], dtype),
        "down_blocks": down_blocks,
        "mid_block": {
            "resnets": [_init_resnet(nk(), chans[-1], chans[-1], None, dtype) for _ in range(2)]
        },
        "norm_out": _init_gn(chans[-1], dtype),
        "conv_out": _init_conv(nk(), 3, 3, 3, chans[-1], 2 * cfg.latent_channels, dtype),
    }

    # Decoder
    rev = list(reversed(chans))
    zq = cfg.latent_channels
    up_blocks = []
    cin = rev[0]
    for i in range(n):
        cout = rev[i]
        resnets = []
        for j in range(cfg.layers_per_block + 1):
            resnets.append(_init_resnet(nk(), cin if j == 0 else cout, cout, zq, dtype))
        bp = {"resnets": resnets}
        if i < n - 1:
            bp["upsampler"] = {"conv": _init_conv2d(nk(), 3, 3, cout, cout, dtype)}
        up_blocks.append(bp)
        cin = cout
    decoder = {
        "conv_in": _init_conv(nk(), 3, 3, 3, cfg.latent_channels, rev[0], dtype),
        "mid_block": {
            "resnets": [_init_resnet(nk(), rev[0], rev[0], zq, dtype) for _ in range(2)]
        },
        "up_blocks": up_blocks,
        "norm_out": {
            "norm_layer": _init_gn(rev[-1], dtype),
            "conv_y": _init_conv(nk(), 1, 1, 1, zq, rev[-1], dtype),
            "conv_b": _init_conv(nk(), 1, 1, 1, zq, rev[-1], dtype),
        },
        "conv_out": _init_conv(nk(), 3, 3, 3, rev[-1], cfg.out_channels, dtype),
    }

    return {"encoder": encoder, "decoder": decoder}
