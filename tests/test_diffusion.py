"""Diffusion schedule + sampler tests vs independent NumPy math."""

import math

import jax
import jax.numpy as jnp
import numpy as np

import pytest

from open_diffusiongs_tpu.diffusion import (create_schedule, p_sample_loop,
                                            q_posterior, q_sample,
                                            space_timesteps)


def _cosine_betas_np(n):
    def ab(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    return np.array([min(1 - ab((i + 1) / n) / ab(i / n), 0.999)
                     for i in range(n)])


def test_full_schedule_matches_numpy():
    sched = create_schedule(None, diffusion_steps=100)
    betas = _cosine_betas_np(100)
    acp = np.cumprod(1 - betas)
    np.testing.assert_allclose(np.asarray(sched.betas), betas, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), acp, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sched.sqrt_alphas_cumprod),
                               np.sqrt(acp), rtol=1e-5)
    acp_prev = np.append(1.0, acp[:-1])
    pv = betas * (1 - acp_prev) / (1 - acp)
    np.testing.assert_allclose(np.asarray(sched.posterior_variance), pv,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(sched.timestep_map), np.arange(100))


def test_spaced_schedule():
    # 30 steps from 1000: respaced betas satisfy prod(1-b) telescoping.
    sched = create_schedule("30", diffusion_steps=1000)
    assert sched.num_steps == 30
    tmap = np.asarray(sched.timestep_map)
    use = sorted(space_timesteps(1000, "30"))
    np.testing.assert_array_equal(tmap, use)
    base = _cosine_betas_np(1000)
    acp = np.cumprod(1 - base)
    last = 1.0
    for i, ti in enumerate(use):
        expect_beta = 1 - acp[ti] / last
        last = acp[ti]
        np.testing.assert_allclose(float(sched.betas[i]), expect_beta,
                                   rtol=1e-5, atol=1e-7)


def test_ddim_string():
    steps = space_timesteps(1000, "ddim50")
    assert len(steps) == 50 and 0 in steps


def test_q_sample_interpolates():
    sched = create_schedule(None, diffusion_steps=10)
    x0 = jnp.ones((2, 3))
    noise = jnp.full((2, 3), 2.0)
    t = jnp.asarray([0, 9])
    out = np.asarray(q_sample(sched, x0, t, noise))
    sa = np.asarray(sched.sqrt_alphas_cumprod)
    so = np.asarray(sched.sqrt_one_minus_alphas_cumprod)
    np.testing.assert_allclose(out[0], sa[0] * 1 + so[0] * 2, rtol=1e-6)
    np.testing.assert_allclose(out[1], sa[9] * 1 + so[9] * 2, rtol=1e-6)


def test_posterior_t0_returns_xstart():
    sched = create_schedule(None, diffusion_steps=50)
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4)),
                     dtype=jnp.float32)
    xt = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4)),
                     dtype=jnp.float32)
    mean, _ = q_posterior(sched, x0, xt, jnp.zeros((2,), jnp.int32))
    np.testing.assert_allclose(np.asarray(mean), np.asarray(x0), atol=1e-5)


@pytest.mark.slow
def test_p_sample_loop_runs_and_converges():
    # Dummy model: always "renders" a constant image c for every view.
    sched = create_schedule("10", diffusion_steps=100)
    b, v, h = 2, 2, 8
    target = 0.3

    def model_fn(images, t):
        renders = jnp.full_like(images, target)
        return renders, {"dummy": jnp.zeros(())}

    cond = jnp.zeros((b, 1, 3, h, h))
    noise = jax.random.normal(jax.random.PRNGKey(0), (b, v, 3, h, h))
    out = p_sample_loop(sched, model_fn, cond, noise, jax.random.PRNGKey(1))
    assert out["sample"].shape == (b, v, 3, h, h)
    assert out["renders"].shape == (b, v + 1, 3, h, h)
    # START_X prediction: final sample equals the model's (clipped) x0.
    np.testing.assert_allclose(np.asarray(out["sample"]), target, atol=1e-6)


def test_p_sample_loop_trajectory():
    sched = create_schedule("5", diffusion_steps=50)

    def model_fn(images, t):
        return images * 0.5, None

    cond = jnp.zeros((1, 1, 3, 4, 4))
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 3, 4, 4))
    out = p_sample_loop(sched, model_fn, cond, noise, jax.random.PRNGKey(1),
                        return_trajectory=True)
    xs, x0s = out["trajectory"]
    assert xs.shape == (4, 1, 1, 3, 4, 4)
    assert x0s.shape == (4, 1, 1, 3, 4, 4)


def test_schedule_tables_are_host_arrays():
    """Regression guard for the trace-time constant hang (PERF_NOTES r3):
    schedule tables embedded as jit constants must be HOST (numpy) arrays.
    A device-resident table costs a device->host fetch per array at MLIR
    constant-embed time — up to 37 s each through the axon relay."""
    import jax

    from open_diffusiongs_tpu.diffusion.ddim import DDIMScheduler
    from open_diffusiongs_tpu.diffusion.rf import FlowMatchEulerDiscreteScheduler

    sched = create_schedule("30", diffusion_steps=1000)
    for name, v in sched._asdict().items():
        assert not isinstance(v, jax.Array), \
            f"DiffusionSchedule.{name} lives on device"

    dd = DDIMScheduler()
    dd.set_timesteps(10)
    for name in ("alphas_cumprod", "final_alpha_cumprod", "timesteps"):
        assert not isinstance(getattr(dd, name), jax.Array), name

    rf = FlowMatchEulerDiscreteScheduler()
    rf.set_timesteps(10)
    for name in ("sigmas", "timesteps"):
        assert not isinstance(getattr(rf, name), jax.Array), name
