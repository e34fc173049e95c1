"""Learning-rate schedules.

The reference's staircase (identical in every model file,
/root/reference/models/model01.py:143-149): when the global step hits
``2^i * 7000`` (i < 8), set

    lr = base * 10^(-step / (2^7 * 7000))

i.e. piecewise-constant with exponentially-spaced drops, ending one decade
below base. Reproduced here as a pure function of the step — jit-safe, no
callbacks, no GlobalStep observer (utils/utils.py:20-45 made structural).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def staircase_schedule(base_lr: float = 1e-3, base: int = 7000, levels: int = 8):
    """Returns ``lr(step)`` matching the reference staircase exactly."""
    milestones = np.array([2 ** i * base for i in range(levels)], dtype=np.float32)
    denom = float(2 ** (levels - 1) * base)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        # largest milestone <= step (0 before the first drop)
        passed = jnp.where(milestones <= step, milestones, 0.0)
        m = jnp.max(passed)
        return base_lr * jnp.power(10.0, -m / denom)

    return schedule


def constant_schedule(base_lr: float = 1e-3):
    def schedule(step):
        return jnp.asarray(base_lr, jnp.float32)

    return schedule


def with_warmup(schedule, warmup_steps: int):
    """Linear warmup 0 -> schedule(step) over the first ``warmup_steps``
    steps, composing with any base schedule (standard large-batch /
    hierarchical-VAE practice; not in the reference — production
    extension). At step >= warmup_steps the base schedule applies
    unchanged, so the staircase's milestones are unaffected."""
    if warmup_steps <= 0:
        return schedule

    def warmed(step):
        step = jnp.asarray(step, jnp.float32)
        scale = jnp.minimum(1.0, (step + 1.0) / float(warmup_steps))
        return scale * schedule(step)

    return warmed
