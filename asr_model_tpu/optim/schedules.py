"""LR schedules.

Parity targets: FAMScheduler2 optimizerc.py:770-795 (the live schedule,
model.py:790 — step-based linear warmup from ``warmup_start`` -> hold at
base lr -> cosine to ``eta_min`` with a +1e-8 offset) and FAMScheduler
optimizerc.py:706-723 (epoch-based warmup+cosine).

Both are pure functions of the step counter (the reference's
``last_epoch``), usable as optax schedules and directly jittable.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp


def fam_scheduler2(base_lr: float, warmup_steps: int = 1000,
                   total_steps: int = 100000,
                   decay_start: Optional[int] = None,
                   warmup_start: float = 1e-6,
                   eta_min: float = 1e-6) -> Callable:
    """lr(step) with step == the reference's ``last_epoch`` (0-based:
    the lr used by train step g is lr(g))."""
    decay_start_step = decay_start if decay_start is not None else warmup_steps

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_start + (base_lr - warmup_start) * (step / warmup_steps)
        span = max(total_steps - decay_start_step, 1)
        cos = (eta_min + (base_lr - eta_min)
               * (1 + jnp.cos(jnp.pi * (step - decay_start_step) / span)) / 2
               + 1e-8)
        hold = jnp.asarray(base_lr, jnp.float32)
        return jnp.where(step < warmup_steps, warm,
                         jnp.where(step < decay_start_step, hold, cos))

    return schedule


def fam_scheduler(base_lr: float, warmup_epochs: int, max_epochs: int,
                  warmup_start_lr: float = 1e-8,
                  eta_min: float = 1e-8) -> Callable:
    """Epoch-based warmup + cosine (optimizerc.py:706-723)."""

    def schedule(epoch):
        epoch = jnp.asarray(epoch, jnp.float32)
        warm = (warmup_start_lr
                + (base_lr - warmup_start_lr) * (epoch / warmup_epochs))
        span = max(max_epochs - warmup_epochs, 1)
        cos = (eta_min + (base_lr - eta_min)
               * (1 + jnp.cos(jnp.pi * (epoch - warmup_epochs) / span)) / 2)
        return jnp.where(epoch < warmup_epochs, warm, cos)

    return schedule
