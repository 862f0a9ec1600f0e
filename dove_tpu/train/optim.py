"""Optimizer + LR-schedule factory (optax).

Mirrors the reference's surface (finetune/utils/optimizer_utils.py: adam /
adamw / prodigy / came; WarmupLR / WarmupDecayLR schedules from the DeepSpeed
config rewrite at trainer.py:125-169) on optax. Quantized (8-bit/4-bit) and
CPU-offload optimizer variants are GPU-ecosystem features; on TPU the
equivalent memory lever is parameter/optimizer sharding over the mesh
(dove_tpu/parallel), so those flags map to the sharded path.
"""

from __future__ import annotations

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


def make_optimizer(
    name: str,
    lr_schedule: optax.Schedule,
    *,
    betas: tuple[float, float] = (0.9, 0.95),
    eps: float = 1e-8,
    weight_decay: float = 1e-4,
    max_grad_norm: float | None = 1.0,
) -> optax.GradientTransformation:
    name = name.lower()
    if name == "adamw":
        opt = optax.adamw(lr_schedule, b1=betas[0], b2=betas[1], eps=eps,
                          weight_decay=weight_decay)
    elif name == "adam":
        opt = optax.adam(lr_schedule, b1=betas[0], b2=betas[1], eps=eps)
    elif name == "prodigy":
        from optax.contrib import prodigy

        opt = prodigy(learning_rate=lr_schedule, betas=betas, eps=eps,
                      weight_decay=weight_decay)
    elif name == "came":
        # CAME's confidence-guided second moment ~ factored adafactor family.
        opt = optax.adafactor(lr_schedule, min_dim_size_to_factor=128,
                              decay_rate=betas[1], weight_decay_rate=weight_decay)
    else:
        raise ValueError(f"unsupported optimizer: {name}")

    chain = []
    if max_grad_norm is not None and max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(opt)
    return optax.chain(*chain)
