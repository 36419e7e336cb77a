"""End-to-end sampling-chain parity against reference execution.

tests/golden/reference_sampling.npz was produced by
tools/make_sampling_golden.py, which imports the reference diffusion
package UNMODIFIED (models/diffusion/{gaussian_diffusion,respace,
__init__}.py) and drives p_sample_loop_progressive with a deterministic
stub model and recorded noise draws — then runs the reference
GaussianModel filter chain (gs_core.py:463-475).

These tests assert the composed chain — spaced-beta construction,
timestep_map remap, posterior mean, FIXED_LARGE variance, the
nonzero-mask reparameterized step, clip_denoised semantics, and
apply_all_filters — matches jointly, not just per module.  The per-module
denoiser goldens (test_golden_reference.py) cover the model itself; here
the model is the same fixed-mixing stub on both sides.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_diffusiongs_tpu.diffusion.gaussian_diffusion import (
    create_schedule, p_sample_loop)
from open_diffusiongs_tpu.ops.gaussians import NumpyGaussians

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden", "reference_sampling.npz")


@pytest.fixture(scope="module")
def fx():
    assert os.path.exists(GOLDEN), (
        "missing golden fixture — regenerate with "
        "python tools/make_sampling_golden.py (needs torch)")
    return dict(np.load(GOLDEN))


def test_spaced_schedule_matches_reference(fx):
    sched = create_schedule(timestep_respacing=str(int(fx["num_steps"])))
    np.testing.assert_array_equal(np.asarray(sched.timestep_map),
                                  fx["timestep_map"])
    np.testing.assert_allclose(np.asarray(sched.betas, np.float64),
                               fx["betas"], rtol=1e-6)


@pytest.mark.parametrize("clip", [False, True])
def test_p_sample_loop_reproduces_reference_trajectory(fx, clip):
    T = int(fx["num_steps"])
    sched = create_schedule(timestep_respacing=str(T))
    mix = jnp.asarray(fx["mix"])
    cond = jnp.asarray(fx["cond"])
    x_T = jnp.asarray(fx["x_T"])
    step_noise = jnp.asarray(fx["step_noise"])     # [T, b, v, 3, h, w]

    def model_fn(images, t_model):
        # the reference-side stub: fixed mixing over ALL views + 0.001*t
        # bias through 1.5*tanh.  t_model is the REMAPPED timestep, so a
        # timestep_map slip shifts the bias and fails the comparison.
        tt = t_model.astype(jnp.float32).reshape(-1, 1, 1, 1, 1)
        out = 1.5 * jnp.tanh(
            jnp.einsum("uv,bvchw->buchw", mix, images,
                       precision=jax.lax.Precision.HIGHEST) + 0.001 * tt)
        return out, None

    def noise_fn(t_idx):
        # reference consumes the queue front-to-back over t = T-1 .. 0
        return step_noise[T - 1 - t_idx]

    out = jax.jit(
        lambda c, n: p_sample_loop(
            sched, model_fn, c, n, jax.random.PRNGKey(0),
            clip_denoised=clip, return_trajectory=True, noise_fn=noise_fn)
    )(cond, x_T)

    key = "clip" if clip else "noclip"
    ref_samples = fx[f"{key}/samples"]             # [T, b, v, 3, h, w]
    ref_pred_x0 = fx[f"{key}/pred_x0"]

    ours_samples = np.concatenate(
        [np.asarray(out["trajectory"][0]),
         np.asarray(out["sample"])[None]], axis=0)
    ours_pred_x0 = np.concatenate(
        [np.asarray(out["trajectory"][1]),
         np.asarray(out["sample"])[None]], axis=0)

    np.testing.assert_allclose(ours_samples, ref_samples,
                               rtol=2e-4, atol=2e-5, err_msg="x_t trajectory")
    np.testing.assert_allclose(ours_pred_x0[:-1], ref_pred_x0[:-1],
                               rtol=2e-4, atol=2e-5, err_msg="pred_xstart")
    # final step: reference sample == pred_xstart (posterior coef1[0] == 1)
    np.testing.assert_allclose(ref_samples[-1], ref_pred_x0[-1], rtol=1e-6)


def test_apply_all_filters_matches_reference(fx):
    g = NumpyGaussians(
        xyz=fx["filt/xyz_in"], features=fx["filt/features_in"],
        scaling=fx["filt/scaling_in"], rotation=fx["filt/rotation_in"],
        opacity=fx["filt/opacity_in"])
    out = g.apply_all_filters(
        opacity_thres=0.02,
        crop_bbx=(-0.91, 0.91, -0.91, 0.91, -0.91, 0.91),
        cam_origins=fx["filt/cam_origins"],
        nearfar_percent=(0.05, 0.95))
    np.testing.assert_allclose(out.xyz, fx["filt/xyz_out"], rtol=1e-6)
    np.testing.assert_allclose(out.features, fx["filt/features_out"],
                               rtol=1e-6)
    np.testing.assert_allclose(out.scaling, fx["filt/scaling_out"],
                               rtol=1e-6)
    np.testing.assert_allclose(out.rotation, fx["filt/rotation_out"],
                               rtol=1e-6)
    np.testing.assert_allclose(out.opacity, fx["filt/opacity_out"],
                               rtol=1e-6)
