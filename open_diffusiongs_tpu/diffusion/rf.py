"""Rectified-flow / flow-matching scheduler (auxiliary parity).

Equivalent of the reference's FlowMatchEulerDiscreteScheduler
(models/scheduler/rf_scheduler.py:42-310) and the logit-normal timestep
density helpers (systems/rf_utils.py:19-56) — present in the reference
package, unused by shipped configs (SURVEY.md §2 #18).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class FlowMatchEulerDiscreteScheduler:
    """sigma(t) = t / T with optional shift; x_t = (1-sigma) x0 + sigma eps;
    Euler step follows the velocity prediction v = eps - x0."""

    def __init__(self, num_train_timesteps: int = 1000, shift: float = 1.0,
                 **_unused):
        self.num_train_timesteps = num_train_timesteps
        self.shift = shift
        sigmas = np.linspace(1, num_train_timesteps, num_train_timesteps
                             )[::-1] / num_train_timesteps
        sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
        # host-side tables (see ddim.py note on trace-time constants)
        self.sigmas = np.asarray(sigmas, np.float32)
        self.timesteps = np.asarray(sigmas * num_train_timesteps, np.float32)
        self.num_inference_steps = None

    def set_timesteps(self, num_inference_steps: int):
        self.num_inference_steps = num_inference_steps
        sigmas = np.linspace(1.0, 1.0 / self.num_train_timesteps,
                             num_inference_steps)
        sigmas = self.shift * sigmas / (1 + (self.shift - 1) * sigmas)
        self.sigmas = np.asarray(np.append(sigmas, 0.0), np.float32)
        self.timesteps = np.asarray(sigmas * self.num_train_timesteps,
                                    np.float32)

    def scale_noise(self, sample: jnp.ndarray, t_index: jnp.ndarray,
                    noise: jnp.ndarray) -> jnp.ndarray:
        s = jnp.asarray(self.sigmas)[t_index].reshape(
            t_index.shape + (1,) * (sample.ndim - t_index.ndim))
        return (1.0 - s) * sample + s * noise

    def step(self, model_output: jnp.ndarray, step_index: int,
             sample: jnp.ndarray) -> jnp.ndarray:
        """Euler step with velocity prediction (model predicts eps - x0)."""
        sig = jnp.asarray(self.sigmas)
        dt = sig[step_index + 1] - sig[step_index]
        return sample + dt * model_output


def logit_normal_timestep_density(t: jnp.ndarray, m: float = 0.0,
                                  s: float = 1.0) -> jnp.ndarray:
    """pi(t) for logit-normal timestep sampling (rf_utils.py:19-38).
    t in (0, 1)."""
    logit = jnp.log(t / (1.0 - t))
    return (1.0 / (s * jnp.sqrt(2.0 * jnp.pi))) \
        * jnp.exp(-((logit - m) ** 2) / (2 * s * s)) / (t * (1.0 - t))


def sample_logit_normal(rng: jax.Array, shape, m: float = 0.0,
                        s: float = 1.0) -> jnp.ndarray:
    """Draw t ~ logit-normal(m, s) in (0, 1) (rf_utils.py:41-56)."""
    z = m + s * jax.random.normal(rng, shape)
    return jax.nn.sigmoid(z)
