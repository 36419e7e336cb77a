"""Scalar schedules: the reference's `C()` 4-tuple convention and LR decay.

C(value, step): value is a float (constant) or [start_step, v0, v1,
end_step] (linear ramp clamped outside the window) — utils/misc.py:73-94.
Here `step` may be a traced jnp scalar so loss lambdas work inside jit.
"""

from __future__ import annotations

from typing import Any, Sequence, Union

import jax.numpy as jnp


def C(value: Union[float, int, Sequence[float]], step) -> jnp.ndarray:
    if isinstance(value, (int, float)):
        return jnp.asarray(float(value), jnp.float32)
    value = list(value)
    if len(value) == 3:
        value = [0] + value
    assert len(value) == 4, f"C() spec must have 3 or 4 entries, got {value}"
    start_step, v0, v1, end_step = [float(x) for x in value]
    frac = jnp.clip((jnp.asarray(step, jnp.float32) - start_step)
                    / max(end_step - start_step, 1e-8), 0.0, 1.0)
    return v0 + (v1 - v0) * frac


def cosine_annealing_lr(base_lr: float, t_max: int, eta_min: float = 0.0):
    """torch CosineAnnealingLR equivalent as an optax schedule fn."""
    def schedule(step):
        frac = jnp.clip(jnp.asarray(step, jnp.float32) / float(t_max), 0.0, 1.0)
        return eta_min + (base_lr - eta_min) * 0.5 * (1.0 + jnp.cos(
            jnp.pi * frac))
    return schedule
