"""DDIM scheduler (auxiliary parity).

The reference registers a diffusers-derived DDIMScheduler as
`noise_scheduler_type` (models/scheduler/ddim_scheduler.py:131-520) but the
shipped sampling path only consumes `num_train_timesteps` — the actual
sampler lives in gaussian_diffusion.py (SURVEY.md §2 #17).  This compact
functional implementation keeps the same API surface (set_timesteps /
add_noise / step with eta, prediction_type "sample"|"epsilon"|"v_prediction")
so configs referencing a DDIM scheduler keep working and the sampler is
available as an alternative.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .gaussian_diffusion import get_named_beta_schedule


class DDIMState(NamedTuple):
    alphas_cumprod: jnp.ndarray     # [T_train]
    timesteps: jnp.ndarray          # [num_inference] descending
    num_train_timesteps: int
    prediction_type: str
    clip_sample: bool
    final_alpha_cumprod: jnp.ndarray


class DDIMScheduler:
    """Minimal diffusers-compatible DDIM."""

    def __init__(self, num_train_timesteps: int = 1000,
                 beta_schedule: str = "squaredcos_cap_v2",
                 prediction_type: str = "sample",
                 clip_sample: bool = True,
                 set_alpha_to_one: bool = True, **_unused):
        betas = get_named_beta_schedule(beta_schedule, num_train_timesteps)
        acp = np.cumprod(1.0 - betas)
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type
        self.clip_sample = clip_sample
        # host-side tables: embedding a DEVICE array as an XLA constant at
        # trace time costs a device->host fetch (docs/PERF_NOTES.md r3)
        self.alphas_cumprod = np.asarray(acp, np.float32)
        self.final_alpha_cumprod = np.float32(
            1.0 if set_alpha_to_one else acp[0])
        self.timesteps = np.arange(num_train_timesteps - 1, -1, -1)
        self.num_inference_steps = num_train_timesteps

    def set_timesteps(self, num_inference_steps: int):
        step = self.num_train_timesteps // num_inference_steps
        self.num_inference_steps = num_inference_steps
        self.timesteps = (np.arange(0, num_inference_steps) * step
                          ).round()[::-1].copy().astype(np.int64)

    def add_noise(self, original: jnp.ndarray, noise: jnp.ndarray,
                  t: jnp.ndarray) -> jnp.ndarray:
        a = jnp.asarray(self.alphas_cumprod)[t].reshape(
            t.shape + (1,) * (original.ndim - t.ndim))
        return jnp.sqrt(a) * original + jnp.sqrt(1.0 - a) * noise

    def step(self, model_output: jnp.ndarray, t, sample: jnp.ndarray,
             eta: float = 0.0, rng: Optional[jax.Array] = None):
        """One DDIM update x_t -> x_{t-step}."""
        prev_t = t - self.num_train_timesteps // self.num_inference_steps
        acp = jnp.asarray(self.alphas_cumprod)
        a_t = acp[t]
        a_prev = jnp.where(prev_t >= 0, acp[jnp.maximum(prev_t, 0)],
                           self.final_alpha_cumprod)
        beta_t = 1.0 - a_t

        if self.prediction_type == "epsilon":
            x0 = (sample - jnp.sqrt(beta_t) * model_output) / jnp.sqrt(a_t)
            eps = model_output
        elif self.prediction_type == "sample":
            x0 = model_output
            eps = (sample - jnp.sqrt(a_t) * x0) / jnp.sqrt(beta_t)
        elif self.prediction_type == "v_prediction":
            x0 = jnp.sqrt(a_t) * sample - jnp.sqrt(beta_t) * model_output
            eps = jnp.sqrt(a_t) * model_output + jnp.sqrt(beta_t) * sample
        else:
            raise ValueError(self.prediction_type)
        if self.clip_sample:
            x0 = jnp.clip(x0, -1.0, 1.0)

        var = (1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev)
        sigma = eta * jnp.sqrt(var)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma ** 2, 0.0)) * eps
        prev = jnp.sqrt(a_prev) * x0 + dir_xt
        if eta > 0:
            assert rng is not None
            prev = prev + sigma * jax.random.normal(rng, sample.shape,
                                                    sample.dtype)
        return prev, x0
