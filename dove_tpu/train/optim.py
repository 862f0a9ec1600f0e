"""Optimizer + LR-schedule factory (optax).

Mirrors the reference's surface (finetune/utils/optimizer_utils.py: adam /
adamw / prodigy / came, `use_8bit`; WarmupLR / WarmupDecayLR schedules from
the DeepSpeed config rewrite at trainer.py:125-169) on optax. CAME is
implemented natively below (the reference imports came_pytorch), as is the
8-bit analog: ``adamw-8bit`` keeps int8 blockwise-quantized moments
(:func:`adamw_8bit`), and the torchao ``Adam4bit/AdamW4bit`` analog is
``adamw-4bit`` (:func:`adamw_4bit`: packed-nibble moments with non-linear
codebooks, ~0.55 B/param resident). Both compose with mesh sharding for the
full ZeRO+quantized-state memory stack. The CPU-offload variant remains a
GPU-ecosystem feature; its memory role is covered by the sharded low-bit
paths.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def make_lr_schedule(
    lr: float,
    warmup_steps: int = 0,
    total_steps: int | None = None,
    kind: str = "constant_with_warmup",
    num_cycles: int = 1,
    power: float = 1.0,
) -> optax.Schedule:
    if kind in ("constant", "constant_with_warmup"):
        if warmup_steps <= 0:
            return optax.constant_schedule(lr)
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, warmup_steps), optax.constant_schedule(lr)],
            [warmup_steps],
        )
    if kind in ("linear", "warmup_decay"):
        if total_steps is None:
            raise ValueError("warmup_decay schedule needs total_steps")
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, lr, max(warmup_steps, 1)),
                optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1)),
            ],
            [warmup_steps],
        )
    if kind == "cosine":
        if total_steps is None:
            raise ValueError("cosine schedule needs total_steps")
        return optax.warmup_cosine_decay_schedule(
            0.0, lr, max(warmup_steps, 1), total_steps
        )
    if kind == "cosine_with_restarts":
        # transformers get_scheduler semantics: num_cycles hard restarts
        # after warmup (reference trainer.py:413 passes lr_num_cycles).
        if total_steps is None:
            raise ValueError("cosine_with_restarts needs total_steps")
        decay = max(total_steps - warmup_steps, 1)
        per = max(decay // max(num_cycles, 1), 1)
        cosines = [
            optax.cosine_decay_schedule(lr, per) for _ in range(max(num_cycles, 1))
        ]
        bounds = [warmup_steps + per * (i + 1) for i in range(len(cosines) - 1)]
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, max(warmup_steps, 1))] + cosines,
            [warmup_steps] + bounds,
        )
    if kind == "polynomial":
        # transformers polynomial decay: lr * (1 - t/T)**power after warmup
        # (reference trainer.py:414 passes lr_power).
        if total_steps is None:
            raise ValueError("polynomial schedule needs total_steps")
        return optax.join_schedules(
            [
                optax.linear_schedule(0.0, lr, max(warmup_steps, 1)),
                optax.polynomial_schedule(
                    lr, 0.0, power, max(total_steps - warmup_steps, 1)
                ),
            ],
            [warmup_steps],
        )
    raise ValueError(f"unknown lr schedule: {kind}")


class CameState(NamedTuple):
    count: jnp.ndarray
    m: optax.Updates          # first moment (unfactored, like Adam)
    vr: optax.Updates         # factored second moment: row stats
    vc: optax.Updates         # factored second moment: col stats
    ur: optax.Updates         # factored instability (confidence): row stats
    uc: optax.Updates         # factored instability (confidence): col stats


def came(
    learning_rate: optax.ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.999,
    b3: float = 0.9999,
    eps1: float = 1e-30,
    eps2: float = 1e-16,
    clip_threshold: float = 1.0,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """CAME: Confidence-guided Adaptive Memory Efficient optimizer.

    Luo et al. 2023 (ACL), as exposed by the reference's optimizer factory
    (finetune/utils/optimizer_utils.py `get_optimizer(..., "came")`). Per
    matrix parameter: an Adafactor-style factored second moment normalizes
    the gradient, the normalized update is RMS-clipped, folded into an
    unfactored first moment m, and m is then rescaled by a factored
    *confidence* statistic of the instability (u - m)^2 — large disagreement
    between the instantaneous update and the momentum shrinks the step.

    Leaves with ndim >= 2 factor over their LAST TWO dims (leading dims are
    batch — covers this codebase's stacked per-layer [L, ...] leaves);
    vectors/scalars keep unfactored second moments and skip the confidence
    rescale (matching the reference implementation's matrix-only factoring).
    """

    def factored(p):
        return p.ndim >= 2

    def init(params):
        def zeros_like_row(p):  # stats over the last dim removed
            return jnp.zeros(p.shape[:-1], jnp.float32) if factored(p) else jnp.zeros(p.shape, jnp.float32)

        def zeros_like_col(p):  # stats over the second-to-last dim removed
            return (
                jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32)
                if factored(p)
                else jnp.zeros((), jnp.float32)
            )

        return CameState(
            count=jnp.zeros((), jnp.int32),
            m=jax.tree.map(lambda p: jnp.zeros(p.shape, jnp.float32), params),
            vr=jax.tree.map(zeros_like_row, params),
            vc=jax.tree.map(zeros_like_col, params),
            ur=jax.tree.map(zeros_like_row, params),
            uc=jax.tree.map(zeros_like_col, params),
        )

    def rsqrt_approx(r, c):
        """rsqrt of the Adafactor rank-1 reconstruction r c / mean_row(r),
        applied PER FACTOR: rsqrt(r/mean(r)) * rsqrt(c). Computing the
        product first underflows fp32 for zero-gradient leaves (r*c ~ eps^2
        ~ 1e-60 -> 0 -> rsqrt = inf -> 0*inf = NaN); the factored form stays
        finite (came_pytorch's _approx_sq_grad uses the same shape)."""
        denom = jnp.maximum(jnp.mean(r, axis=-1, keepdims=True), 1e-38)
        return jax.lax.rsqrt(r / denom)[..., None] * jax.lax.rsqrt(c)[..., None, :]

    def update(grads, state, params=None):
        if weight_decay and params is None:
            raise ValueError("came with weight_decay needs params")
        count = state.count + 1

        def one(g, m, vr, vc, ur, uc):
            g = g.astype(jnp.float32)
            g2 = g * g + eps1
            if factored(g):
                vr = b2 * vr + (1 - b2) * jnp.mean(g2, axis=-1)
                vc = b2 * vc + (1 - b2) * jnp.mean(g2, axis=-2)
                u = g * rsqrt_approx(vr, vc)
            else:
                vr = b2 * vr + (1 - b2) * g2
                u = g * jax.lax.rsqrt(vr)
            # RMS clip (Adafactor's d-threshold), then momentum
            rms = jnp.sqrt(jnp.mean(u * u) + 1e-38)
            u = u / jnp.maximum(1.0, rms / clip_threshold)
            m = b1 * m + (1 - b1) * u
            if factored(g):
                inst = (u - m) ** 2 + eps2
                ur = b3 * ur + (1 - b3) * jnp.mean(inst, axis=-1)
                uc = b3 * uc + (1 - b3) * jnp.mean(inst, axis=-2)
                step = m * rsqrt_approx(ur, uc)
            else:
                step = m
            return step, m, vr, vc, ur, uc

        flat_g, treedef = jax.tree.flatten(grads)
        flat = [
            one(g, m, vr, vc, ur, uc)
            for g, m, vr, vc, ur, uc in zip(
                flat_g,
                treedef.flatten_up_to(state.m),
                treedef.flatten_up_to(state.vr),
                treedef.flatten_up_to(state.vc),
                treedef.flatten_up_to(state.ur),
                treedef.flatten_up_to(state.uc),
            )
        ]
        unflat = lambda i: jax.tree.unflatten(treedef, [f[i] for f in flat])
        steps = unflat(0)
        # schedule evaluated at the COMPLETED step count (optax convention;
        # matches the reference's scheduler.step()-after-optimizer ordering)
        lr = (
            learning_rate(state.count)
            if callable(learning_rate) else learning_rate
        )
        if weight_decay:
            steps = jax.tree.map(
                lambda s, p: s + weight_decay * p.astype(jnp.float32), steps, params
            )
        updates = jax.tree.map(lambda s, g: (-lr * s).astype(g.dtype), steps, grads)
        new_state = CameState(count, unflat(1), unflat(2), unflat(3), unflat(4), unflat(5))
        return updates, new_state

    return optax.GradientTransformation(init, update)


class Adam8bitState(NamedTuple):
    count: jnp.ndarray
    m_q: optax.Updates       # int8 blockwise-quantized first moment
    m_scale: optax.Updates   # f32 per-block absmax scales
    v_q: optax.Updates       # uint8 blockwise-quantized sqrt(second moment)
    v_scale: optax.Updates


def adamw_8bit(
    learning_rate: optax.ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    block_size: int = 2048,
) -> optax.GradientTransformation:
    """AdamW with 8-bit blockwise-quantized moment states.

    The TPU-native analog of the reference's bitsandbytes 8-bit Adam
    (finetune/utils/optimizer_utils.py:24-58 `use_8bit`): optimizer memory
    drops from 8 to ~2 bytes/param (two int8 streams + one f32 scale per
    2048-element block). Deviations from bnb, documented: moments are
    LINEARLY quantized per block (bnb uses a dynamic-tree code); the second
    moment is stored as sqrt(v) so the linear code spends its precision
    where rsqrt is sensitive. De/requantization happens inside the jitted
    update — transient fp32 exists only per update step, so the RESIDENT
    state is what shards over the mesh ("model" axis, ZeRO analog).
    """

    def q_signed(x):
        flat = x.reshape(-1)
        pad = (-flat.shape[0]) % block_size
        blocks = jnp.pad(flat, (0, pad)).reshape(-1, block_size)
        scale = jnp.max(jnp.abs(blocks), axis=1, keepdims=True) / 127.0
        safe = jnp.maximum(scale, 1e-38)
        q = jnp.clip(jnp.round(blocks / safe), -127, 127).astype(jnp.int8)
        return q, scale[:, 0]

    def dq(q, scale, shape):
        # q.astype(f32) is value-preserving for BOTH int8 and uint8 streams
        flat = (q.astype(jnp.float32) * scale[:, None]).reshape(-1)
        return flat[: int(np.prod(shape))].reshape(shape)

    def q_unsigned(x):  # x >= 0
        flat = x.reshape(-1)
        pad = (-flat.shape[0]) % block_size
        blocks = jnp.pad(flat, (0, pad)).reshape(-1, block_size)
        scale = jnp.max(blocks, axis=1, keepdims=True) / 255.0
        safe = jnp.maximum(scale, 1e-38)
        q = jnp.clip(jnp.round(blocks / safe), 0, 255).astype(jnp.uint8)
        return q, scale[:, 0]

    def init(params):
        def zq(p, signed):
            n = int(np.prod(p.shape)) if p.shape else 1
            nb = -(-n // block_size)
            dt = jnp.int8 if signed else jnp.uint8
            return jnp.zeros((nb, block_size), dt), jnp.zeros((nb,), jnp.float32)

        mz = jax.tree.map(lambda p: zq(p, True), params)
        vz = jax.tree.map(lambda p: zq(p, False), params)
        pick = lambda t, i: jax.tree.map(
            lambda pair: pair[i], t, is_leaf=lambda x: isinstance(x, tuple)
        )
        return Adam8bitState(
            count=jnp.zeros((), jnp.int32),
            m_q=pick(mz, 0), m_scale=pick(mz, 1),
            v_q=pick(vz, 0), v_scale=pick(vz, 1),
        )

    def update(grads, state, params=None):
        if weight_decay and params is None:
            raise ValueError("adamw_8bit with weight_decay needs params")
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)
        lr = (
            learning_rate(state.count)
            if callable(learning_rate) else learning_rate
        )

        flat_g, treedef = jax.tree.flatten(grads)
        out = []
        for g, mq, ms, vq, vs in zip(
            flat_g,
            treedef.flatten_up_to(state.m_q),
            treedef.flatten_up_to(state.m_scale),
            treedef.flatten_up_to(state.v_q),
            treedef.flatten_up_to(state.v_scale),
        ):
            gf = g.astype(jnp.float32)
            m = dq(mq, ms, g.shape)
            v_sqrt = dq(vq, vs, g.shape)
            v = v_sqrt * v_sqrt
            m = b1 * m + (1 - b1) * gf
            v = b2 * v + (1 - b2) * gf * gf
            step = (m / c1) / (jnp.sqrt(v / c2) + eps)
            out.append((step, q_signed(m), q_unsigned(jnp.sqrt(v))))

        steps = jax.tree.unflatten(treedef, [o[0] for o in out])
        if weight_decay:
            steps = jax.tree.map(
                lambda s, p: s + weight_decay * p.astype(jnp.float32),
                steps, params,
            )
        updates = jax.tree.map(
            lambda s, g: (-lr * s).astype(g.dtype), steps, grads
        )
        new_state = Adam8bitState(
            count=count,
            m_q=jax.tree.unflatten(treedef, [o[1][0] for o in out]),
            m_scale=jax.tree.unflatten(treedef, [o[1][1] for o in out]),
            v_q=jax.tree.unflatten(treedef, [o[2][0] for o in out]),
            v_scale=jax.tree.unflatten(treedef, [o[2][1] for o in out]),
        )
        return updates, new_state

    return optax.GradientTransformation(init, update)


class Adam4bitState(NamedTuple):
    count: jnp.ndarray
    m_q: optax.Updates       # uint8 PACKED nibbles: signed-code first moment
    m_scale: optax.Updates   # f32 per-block absmax scales
    v_q: optax.Updates       # uint8 PACKED nibbles: unsigned-code sqrt(v)
    v_scale: optax.Updates


# 4-bit codebooks (Li et al. 2023, "Memory Efficient Optimizers with 4-bit
# States", the paper behind torchao's Adam4bit): linear 4-bit codes are too
# coarse for moment EMAs, so both streams use NON-LINEAR maps over the
# block-normalized value in [-1, 1] / [0, 1].
#   signed (first moment): dynamic-exponent map — 0 and +-2^-k octaves
#     (7 negative, zero, 8 positive levels); momentum spans magnitudes, so
#     log spacing bounds the RELATIVE error per level.
#   unsigned (sqrt of second moment): sqrt(2)-spaced geometric levels —
#     the step size is m * rsqrt(v), so bounding sqrt(v)'s relative error
#     (~+-17% per level) bounds the step's. Storing sqrt(v) (like the 8-bit
#     variant) spends the code's range where rsqrt is sensitive.
_CB4_SIGNED = np.array(
    [-(2.0 ** -k) for k in range(7)]            # -1 .. -1/64
    + [0.0]
    + [2.0 ** -(7 - k) for k in range(8)],      # 1/128 .. 1
    np.float32,
)
_CB4_UNSIGNED = np.array(
    [0.0] + [2.0 ** (-(14 - k) / 2.0) for k in range(15)],  # 2^-7 .. 1
    np.float32,
)


def adamw_4bit(
    learning_rate: optax.ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    block_size: int = 128,
) -> optax.GradientTransformation:
    """AdamW with 4-bit quantized moment states (torchao Adam4bit analog).

    The TPU-native analog of the reference factory's torchao 4-bit branch
    (finetune/utils/optimizer_utils.py:84-105 `use_4bit`): optimizer memory
    drops to ~0.55 bytes/param — two packed-nibble streams (two codes per
    uint8) plus one f32 scale per 128-element block per stream. The small
    block size follows the 4-bit-optimizer paper: with only 15-16 levels,
    per-block absmax normalization must be tight or large outliers crush
    the rest of the block to zero codes.

    De/requantization happens inside the jitted update (codebook gather +
    nearest-code argmin); transient fp32 exists only per step, so the
    RESIDENT state is what shards over the mesh (ZeRO analog), exactly
    like :func:`adamw_8bit`. The argmin's [*, 16] broadcast fuses into its
    reduction (AOT-measured on the v5e: ~10 B/param update temps — a few
    fp32 working buffers, not 64 B/param of materialized distances).
    """
    if block_size % 2:
        raise ValueError("block_size must be even (two codes pack per byte)")
    cb_s = jnp.asarray(_CB4_SIGNED)
    cb_u = jnp.asarray(_CB4_UNSIGNED)

    def _blocks(x):
        flat = x.reshape(-1)
        pad = (-flat.shape[0]) % block_size
        return jnp.pad(flat, (0, pad)).reshape(-1, block_size)

    def _pack(codes):  # [nb, block] uint8 in 0..15 -> [nb, block//2]
        lo, hi = codes[:, 0::2], codes[:, 1::2]
        return (lo | (hi << 4)).astype(jnp.uint8)

    def _unpack(packed):  # [nb, block//2] -> [nb, block] codes
        lo = packed & 0xF
        hi = packed >> 4
        return jnp.stack([lo, hi], axis=-1).reshape(packed.shape[0], -1)

    def q_signed(x):
        blocks = _blocks(x)
        scale = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
        safe = jnp.maximum(scale, 1e-38)
        norm = blocks / safe
        codes = jnp.argmin(
            jnp.abs(norm[..., None] - cb_s), axis=-1
        ).astype(jnp.uint8)
        return _pack(codes), scale[:, 0]

    def q_unsigned(x):  # x >= 0
        blocks = _blocks(x)
        scale = jnp.max(blocks, axis=1, keepdims=True)
        safe = jnp.maximum(scale, 1e-38)
        norm = blocks / safe
        codes = jnp.argmin(
            jnp.abs(norm[..., None] - cb_u), axis=-1
        ).astype(jnp.uint8)
        return _pack(codes), scale[:, 0]

    def dq(packed, scale, shape, cb):
        vals = jnp.take(cb, _unpack(packed).astype(jnp.int32))
        flat = (vals * scale[:, None]).reshape(-1)
        return flat[: int(np.prod(shape))].reshape(shape)

    def init(params):
        def zq(p):
            n = int(np.prod(p.shape)) if p.shape else 1
            nb = -(-n // block_size)
            return (
                jnp.zeros((nb, block_size // 2), jnp.uint8),
                jnp.zeros((nb,), jnp.float32),
            )

        pick = lambda t, i: jax.tree.map(
            lambda pair: pair[i], t, is_leaf=lambda x: isinstance(x, tuple)
        )
        mz = jax.tree.map(zq, params)
        vz = jax.tree.map(zq, params)
        return Adam4bitState(
            count=jnp.zeros((), jnp.int32),
            m_q=pick(mz, 0), m_scale=pick(mz, 1),
            v_q=pick(vz, 0), v_scale=pick(vz, 1),
        )

    def update(grads, state, params=None):
        if weight_decay and params is None:
            raise ValueError("adamw_4bit with weight_decay needs params")
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)
        lr = (
            learning_rate(state.count)
            if callable(learning_rate) else learning_rate
        )

        flat_g, treedef = jax.tree.flatten(grads)
        out = []
        for g, mq, ms, vq, vs in zip(
            flat_g,
            treedef.flatten_up_to(state.m_q),
            treedef.flatten_up_to(state.m_scale),
            treedef.flatten_up_to(state.v_q),
            treedef.flatten_up_to(state.v_scale),
        ):
            gf = g.astype(jnp.float32)
            m = dq(mq, ms, g.shape, cb_s)
            v_sqrt = dq(vq, vs, g.shape, cb_u)
            v = v_sqrt * v_sqrt
            m = b1 * m + (1 - b1) * gf
            v = b2 * v + (1 - b2) * gf * gf
            step = (m / c1) / (jnp.sqrt(v / c2) + eps)
            out.append((step, q_signed(m), q_unsigned(jnp.sqrt(v))))

        steps = jax.tree.unflatten(treedef, [o[0] for o in out])
        if weight_decay:
            steps = jax.tree.map(
                lambda s, p: s + weight_decay * p.astype(jnp.float32),
                steps, params,
            )
        updates = jax.tree.map(
            lambda s, g: (-lr * s).astype(g.dtype), steps, grads
        )
        new_state = Adam4bitState(
            count=count,
            m_q=jax.tree.unflatten(treedef, [o[1][0] for o in out]),
            m_scale=jax.tree.unflatten(treedef, [o[1][1] for o in out]),
            v_q=jax.tree.unflatten(treedef, [o[2][0] for o in out]),
            v_scale=jax.tree.unflatten(treedef, [o[2][1] for o in out]),
        )
        return updates, new_state

    return optax.GradientTransformation(init, update)


def make_optimizer(
    name: str,
    lr_schedule: optax.Schedule,
    *,
    betas: tuple[float, float] = (0.9, 0.95),
    beta3: float = 0.9999,
    eps: float = 1e-8,
    weight_decay: float = 1e-4,
    max_grad_norm: float | None = 1.0,
) -> optax.GradientTransformation:
    name = name.lower().replace("_", "-")
    if name == "adamw":
        opt = optax.adamw(lr_schedule, b1=betas[0], b2=betas[1], eps=eps,
                          weight_decay=weight_decay)
    elif name in ("adamw-8bit", "adam-8bit"):
        # the reference's bnb `use_8bit` analog: int8 blockwise moments
        opt = adamw_8bit(
            lr_schedule, b1=betas[0], b2=betas[1], eps=eps,
            weight_decay=weight_decay if name == "adamw-8bit" else 0.0,
        )
    elif name in ("adamw-4bit", "adam-4bit"):
        # the reference's torchao `use_4bit` analog: packed-nibble moments
        opt = adamw_4bit(
            lr_schedule, b1=betas[0], b2=betas[1], eps=eps,
            weight_decay=weight_decay if name == "adamw-4bit" else 0.0,
        )
    elif name == "adam":
        opt = optax.adam(lr_schedule, b1=betas[0], b2=betas[1], eps=eps)
    elif name == "prodigy":
        from optax.contrib import prodigy

        opt = prodigy(learning_rate=lr_schedule, betas=betas, eps=eps,
                      weight_decay=weight_decay)
    elif name == "came":
        # reference pins eps=(1e-30, 1e-16) (optimizer_utils.py:150)
        opt = came(lr_schedule, b1=betas[0], b2=betas[1], b3=beta3,
                   weight_decay=weight_decay)
    else:
        raise ValueError(f"unsupported optimizer: {name}")

    chain = []
    if max_grad_norm is not None and max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(opt)
    return optax.chain(*chain)
