"""LR schedules matching the reference's poly decay rules.

reference: util/utils.py:25-48 — poly (power 0.9) and warmup-then-poly
(warmup 1000, DG tree uses 1500).  The head param group runs at 10x the
base LR (adjust_learning_rate, :36-48); that multiplier lives in the
optimizer (train/optim.py), not the schedule.
"""

from __future__ import annotations

import jax.numpy as jnp


def poly_schedule(base_lr: float, max_iter: int, power: float = 0.9):
    def fn(step):
        frac = 1.0 - jnp.asarray(step, jnp.float32) / max_iter
        return base_lr * jnp.power(jnp.maximum(frac, 0.0), power)

    return fn


def poly_warmup_schedule(base_lr: float, max_iter: int, warmup: int = 1000, power: float = 1.0):
    def fn(step):
        s = jnp.asarray(step, jnp.float32)
        warm = base_lr * (s / warmup)
        frac = jnp.maximum(1.0 - (s - warmup) / max_iter, 0.0)
        decay = base_lr * jnp.power(frac, power)
        return jnp.where(s <= warmup, warm, decay)

    return fn
