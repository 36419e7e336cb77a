"""DDPM diffusion math + spaced sampling, functional JAX.

Replicates the reference OpenAI-lineage implementation
(`models/diffusion/gaussian_diffusion.py`, `respace.py`) with the shipped
configuration baked in: squaredcos_cap_v2 betas, model predicts x0
(START_X), FIXED_LARGE variance, clip_denoised (create_diffusion defaults,
models/diffusion/__init__.py:15-51).

TPU-first differences from the reference:
  * the schedule is a NamedTuple of f32 arrays (computed in f64 NumPy like
    the reference, gaussian_diffusion.py:189-243) — a pytree that rides
    through jit;
  * the 30-step p_sample loop is ONE jitted lax.scan over descending
    timesteps with the final (t=0) step peeled so the Gaussians of the last
    denoiser call are returned without carrying them through the scan;
  * the SpacedDiffusion timestep remapping (_WrappedModel, respace.py:121-137)
    is a `timestep_map` gather inside the step function.

Model contract (matches p_mean_variance, gaussian_diffusion.py:316-364):
  model_fn(images [b, v, 3, h, w], t_model [b]) -> (renders [b, v, 3, h, w],
  aux) where images = [cond views ‖ noisy views] and renders cover all
  views; the prediction for x0 is renders[:, n_cond:].
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def get_named_beta_schedule(schedule_name: str, num_steps: int) -> np.ndarray:
    """Named beta schedules (gaussian_diffusion.py:122-146)."""
    if schedule_name == "linear":
        scale = 1000.0 / num_steps
        return np.linspace(scale * 1e-4, scale * 2e-2, num_steps,
                           dtype=np.float64)
    if schedule_name == "squaredcos_cap_v2":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        betas = []
        for i in range(num_steps):
            t1, t2 = i / num_steps, (i + 1) / num_steps
            betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), 0.999))
        return np.array(betas, dtype=np.float64)
    raise NotImplementedError(f"unknown beta schedule: {schedule_name}")


def space_timesteps(num_timesteps: int, section_counts) -> set:
    """Subset of original timesteps to retain (respace.py:16-66)."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return set(range(0, num_timesteps, i))
            raise ValueError(
                f"cannot create exactly {desired} steps with an integer stride")
        section_counts = [int(x) for x in section_counts.split(",")]
    elif isinstance(section_counts, int):
        section_counts = [section_counts]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx, all_steps = 0, []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(
                f"cannot divide section of {size} steps into {section_count}")
        frac_stride = 1 if section_count <= 1 else (size - 1) / (section_count - 1)
        cur = 0.0
        for _ in range(section_count):
            all_steps.append(start_idx + round(cur))
            cur += frac_stride
        start_idx += size
    return set(all_steps)


class DiffusionSchedule(NamedTuple):
    """All per-timestep constants, length = number of (possibly respaced)
    steps.  `timestep_map[i]` is the original-process timestep fed to the
    model (identity when not respaced)."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    fixed_large_variance: jnp.ndarray
    fixed_large_log_variance: jnp.ndarray
    timestep_map: jnp.ndarray

    @property
    def num_steps(self) -> int:
        return self.betas.shape[0]


def _schedule_from_betas(betas: np.ndarray, timestep_map: np.ndarray
                         ) -> DiffusionSchedule:
    betas = np.asarray(betas, np.float64)
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1.0, acp[:-1])
    post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
    post_logvar = (np.log(np.append(post_var[1], post_var[1:]))
                   if len(post_var) > 1 else np.array([]))
    fl_var = np.append(post_var[1], betas[1:])
    # Schedule tables are stored as HOST (numpy) arrays on purpose: a
    # jnp.asarray here would round-trip through the device, and embedding
    # a device array as an XLA constant at trace time costs a
    # device->host fetch (measured 37 s/array through the axon relay —
    # the whole "142 s compile at 256^2" mystery, docs/PERF_NOTES.md r3).
    # numpy constants embed from host memory for free; tracer-indexed
    # sites wrap with jnp.asarray (see _extract).
    j = lambda a, d: np.asarray(a, d)  # noqa: E731
    f = np.float32
    return DiffusionSchedule(
        betas=j(betas, f),
        alphas_cumprod=j(acp, f),
        alphas_cumprod_prev=j(acp_prev, f),
        sqrt_alphas_cumprod=j(np.sqrt(acp), f),
        sqrt_one_minus_alphas_cumprod=j(np.sqrt(1.0 - acp), f),
        sqrt_recip_alphas_cumprod=j(np.sqrt(1.0 / acp), f),
        sqrt_recipm1_alphas_cumprod=j(np.sqrt(1.0 / acp - 1.0), f),
        posterior_variance=j(post_var, f),
        posterior_log_variance_clipped=j(post_logvar, f),
        posterior_mean_coef1=j(
            betas * np.sqrt(acp_prev) / (1.0 - acp), f),
        posterior_mean_coef2=j(
            (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp), f),
        fixed_large_variance=j(fl_var, f),
        fixed_large_log_variance=j(np.log(fl_var), f),
        timestep_map=j(timestep_map, np.int32),
    )


def create_schedule(timestep_respacing=None,
                    noise_schedule: str = "squaredcos_cap_v2",
                    diffusion_steps: int = 1000) -> DiffusionSchedule:
    """`create_diffusion` equivalent (models/diffusion/__init__.py:15-51).

    timestep_respacing: None/"" for the full process; an int or "30"-style
    string for spaced inference; respaced betas follow respace.py:86-95.
    """
    base_betas = get_named_beta_schedule(noise_schedule, diffusion_steps)
    if timestep_respacing is None or timestep_respacing == "":
        return _schedule_from_betas(
            base_betas, np.arange(diffusion_steps, dtype=np.int64))
    use = space_timesteps(diffusion_steps, timestep_respacing)
    acp = np.cumprod(1.0 - base_betas)
    last, new_betas, tmap = 1.0, [], []
    for i, a in enumerate(acp):
        if i in use:
            new_betas.append(1 - a / last)
            last = a
            tmap.append(i)
    return _schedule_from_betas(np.array(new_betas), np.array(tmap))


def _extract(arr, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """arr[t] broadcast to an ndim-tensor shape ([b, 1, 1, ...]).
    `arr` is a host (numpy) table — jnp.asarray makes tracer indexing
    legal; under jit it embeds as a free host-side constant."""
    return jnp.asarray(arr)[t].reshape(t.shape + (1,) * (ndim - 1))


def q_sample(sched: DiffusionSchedule, x_start: jnp.ndarray, t: jnp.ndarray,
             noise: jnp.ndarray) -> jnp.ndarray:
    """Forward diffusion q(x_t | x_0) (gaussian_diffusion.py:268-284)."""
    return (_extract(sched.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + _extract(sched.sqrt_one_minus_alphas_cumprod, t, x_start.ndim)
            * noise)


def q_posterior(sched: DiffusionSchedule, x_start: jnp.ndarray,
                x_t: jnp.ndarray, t: jnp.ndarray):
    """q(x_{t-1} | x_t, x_0) mean/log-variance (gaussian_diffusion.py:291-312)."""
    mean = (_extract(sched.posterior_mean_coef1, t, x_t.ndim) * x_start
            + _extract(sched.posterior_mean_coef2, t, x_t.ndim) * x_t)
    logvar = _extract(sched.posterior_log_variance_clipped, t, x_t.ndim)
    return mean, logvar


def predict_xstart_from_eps(sched: DiffusionSchedule, x_t: jnp.ndarray,
                            t: jnp.ndarray, eps: jnp.ndarray) -> jnp.ndarray:
    return (_extract(sched.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - _extract(sched.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps)


def p_sample_step(sched: DiffusionSchedule,
                  model_fn: Callable,
                  cond: jnp.ndarray,
                  x_t: jnp.ndarray,
                  t_idx: jnp.ndarray,
                  rng: jax.Array,
                  clip_denoised: bool = True,
                  add_noise: bool = True,
                  noise_fn: Optional[Callable] = None):
    """One reverse step x_t -> x_{t-1} (p_sample, gaussian_diffusion.py:479-518).

    cond: [b, n_cond, 3, h, w] clean views; x_t: [b, v_noisy, 3, h, w].
    t_idx: scalar spaced-timestep index (same across the batch, as in the
    sampling loop).  Returns (x_prev, pred_xstart, aux) where aux is the
    model's auxiliary output (renders + Gaussians).

    noise_fn(t_idx) -> noise [same shape as x_t] overrides the PRNG draw —
    used by the reference-execution golden test to replay recorded noise.
    """
    b = x_t.shape[0]
    t_idx = jnp.asarray(t_idx, jnp.int32)
    t_b = jnp.full((b,), t_idx, jnp.int32)
    t_model = jnp.asarray(sched.timestep_map)[t_b]          # respace remap
    images = jnp.concatenate([cond, x_t], axis=1)
    renders, aux = model_fn(images, t_model)
    # model_fn may render only the noisy views (an optimization the loop
    # uses — the clean cond view's render is never consumed mid-loop)
    if renders.shape[1] == x_t.shape[1]:
        model_output = renders
    else:
        model_output = renders[:, cond.shape[1]:]
    pred_xstart = jnp.clip(model_output, -1.0, 1.0) if clip_denoised \
        else model_output
    mean, _ = q_posterior(sched, pred_xstart, x_t, t_b)
    # FIXED_LARGE log-variance (gaussian_diffusion.py:379-392)
    logvar = _extract(sched.fixed_large_log_variance, t_b, x_t.ndim)
    noise = (noise_fn(t_idx) if noise_fn is not None
             else jax.random.normal(rng, x_t.shape, x_t.dtype))
    nonzero = (t_idx != 0).astype(x_t.dtype) if add_noise else 0.0
    x_prev = mean + nonzero * jnp.exp(0.5 * logvar) * noise
    return x_prev, pred_xstart, (renders, aux)


def p_sample_loop(sched: DiffusionSchedule,
                  model_fn: Callable,
                  cond: jnp.ndarray,
                  noise: jnp.ndarray,
                  rng: jax.Array,
                  clip_denoised: bool = True,
                  return_trajectory: bool = False,
                  final_model_fn: Optional[Callable] = None,
                  noise_fn: Optional[Callable] = None):
    """Full reverse process (p_sample_loop_progressive,
    gaussian_diffusion.py:560-603) as one lax.scan; the t=0 step is peeled
    so the last denoiser call's Gaussians/renders are returned directly.

    Returns dict with `sample` ([b, v_noisy, 3, h, w] = final pred_xstart),
    `renders` (all views incl. cond at t=0), `aux` (model aux at t=0, i.e.
    the final Gaussians), and optionally `trajectory` ([T-1, b, ...] x_t
    sequence) for the eval videos.
    """
    T = sched.num_steps

    def step(carry, t_idx):
        x, = carry
        step_rng = jax.random.fold_in(rng, t_idx)
        x_prev, pred_x0, _ = p_sample_step(
            sched, model_fn, cond, x, t_idx, step_rng, clip_denoised,
            noise_fn=noise_fn)
        out = (x_prev, pred_x0) if return_trajectory else None
        return (x_prev,), out

    ts = jnp.arange(T - 1, 0, -1, dtype=jnp.int32)          # T-1 .. 1
    (x_last,), traj = jax.lax.scan(step, (noise,), ts)

    x_final, pred_x0, (renders, aux) = p_sample_step(
        sched, final_model_fn or model_fn, cond, x_last,
        jnp.asarray(0, jnp.int32), jax.random.fold_in(rng, 0), clip_denoised,
        noise_fn=noise_fn)
    out = {"sample": pred_x0, "renders": renders, "aux": aux}
    if return_trajectory:
        out["trajectory"] = traj
    return out
