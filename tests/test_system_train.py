"""Object system: train loss, jitted train step, 8-device data-parallel
mesh, EMA, overfit sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_diffusiongs_tpu.ops.rasterize import RasterizeConfig
from open_diffusiongs_tpu.parallel.mesh import make_mesh, shard_batch
from open_diffusiongs_tpu.parallel.train_step import (OptimizerConfig,
                                                      init_train_state,
                                                      make_optimizer,
                                                      make_train_step)
from open_diffusiongs_tpu.systems.object_system import (ObjectSystem,
                                                        ObjectSystemConfig)
from utils3d import orbit_cameras

# interpret-mode Pallas kernels / subprocess / multi-second jits:
# fast sweep is `pytest -m "not slow"` (pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.slow

H = W = 16
V_IN, V_SUP = 2, 3

TINY = dict(width=64, patch_size=8, n_gaussians=2, dim_heads=32,
            num_layers=2, remat=False)
# 16x16 images are a single tile, so every Gaussian (2 + v*h*w = 514) can
# land in one tile: capacity must cover them all.
RCFG = RasterizeConfig(max_tiles_per_gaussian=16, max_per_tile=576,
                       blend_chunk=32)


def _system():
    return ObjectSystem(ObjectSystemConfig(
        num_inference_steps=3, shape_model=TINY, raster=RCFG,
        use_lpips=False))


def _batch(rng, b=2):
    c2ws, fxy = orbit_cameras(V_SUP, h=H, w=W)
    c2w = np.broadcast_to(c2ws, (b,) + c2ws.shape).astype(np.float32)
    fxy = np.broadcast_to(fxy, (b,) + fxy.shape).astype(np.float32)
    return {
        "rgbs_input": jnp.asarray(
            rng.uniform(size=(b, V_IN, 3, H, W)).astype(np.float32)),
        "c2ws_input": jnp.asarray(c2w[:, :V_IN]),
        "fxfycxcys_input": jnp.asarray(fxy[:, :V_IN]),
        "depths_input": jnp.asarray(
            rng.uniform(2.0, 4.0, (b, V_IN, 1, H, W)).astype(np.float32)),
        "masks_input": jnp.ones((b, V_IN, 1, H, W), jnp.float32),
        "rgbs": jnp.asarray(
            rng.uniform(size=(b, V_SUP, 3, H, W)).astype(np.float32)),
        "c2ws": jnp.asarray(c2w),
        "fxfycxcys": jnp.asarray(fxy),
        "masks": jnp.ones((b, V_SUP, 1, H, W), jnp.float32),
    }


def test_train_loss_finite(rng):
    sys_ = _system()
    params = sys_.init_params(jax.random.PRNGKey(0), H, W, v=V_IN)
    batch = _batch(rng)
    loss, metrics = sys_.train_loss(params, batch, jax.random.PRNGKey(1),
                                    jnp.asarray(200))
    assert np.isfinite(float(loss))
    assert set(metrics) >= {"loss_diffusion", "loss_ssim", "loss_pointsdist",
                            "loss_xyz", "psnr", "loss"}
    assert int(metrics["overflow_gaussians"]) == 0


def test_lambda_schedule_gates_losses(rng):
    # before step 150 only pointsdist contributes (lambda ramps)
    sys_ = _system()
    params = sys_.init_params(jax.random.PRNGKey(0), H, W, v=V_IN)
    batch = _batch(rng)
    loss0, m0 = sys_.train_loss(params, batch, jax.random.PRNGKey(1),
                                jnp.asarray(0))
    np.testing.assert_allclose(float(loss0), float(m0["loss_pointsdist"]),
                               rtol=1e-5)


def test_train_step_updates_and_ema(rng):
    sys_ = _system()
    params = sys_.init_params(jax.random.PRNGKey(0), H, W, v=V_IN)
    tx = make_optimizer(OptimizerConfig(lr=1e-3, t_max=1000))
    state = init_train_state(params, tx, ema_decay=0.9)
    step = make_train_step(sys_.train_loss, tx, mesh=None, ema_decay=0.9,
                           donate=False)
    batch = _batch(rng)
    state2, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert int(state2.step) == 1
    # params changed
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     state.params, state2.params)
    assert max(jax.tree.leaves(d)) > 0
    # EMA between old and new params
    leaf_old = jax.tree.leaves(state.params)[0]
    leaf_new = jax.tree.leaves(state2.params)[0]
    leaf_ema = jax.tree.leaves(state2.ema_params)[0]
    np.testing.assert_allclose(np.asarray(leaf_ema),
                               np.asarray(leaf_old * 0.9 + leaf_new * 0.1),
                               atol=1e-6)
    assert np.isfinite(float(metrics["grad_norm"]))


def test_mesh_train_step_matches_single(rng):
    sys_ = _system()
    params = sys_.init_params(jax.random.PRNGKey(0), H, W, v=V_IN)
    tx = make_optimizer(OptimizerConfig(lr=1e-3, t_max=1000))
    batch = _batch(rng, b=8)

    state1 = init_train_state(params, tx, ema_decay=None)
    step1 = make_train_step(sys_.train_loss, tx, mesh=None, ema_decay=None,
                            donate=False)
    s1, m1 = step1(state1, batch, jax.random.PRNGKey(2))

    mesh = make_mesh()
    assert mesh.devices.size == 8
    state2 = init_train_state(params, tx, ema_decay=None)
    step2 = make_train_step(sys_.train_loss, tx, mesh=mesh, ema_decay=None,
                            donate=False)
    s2, m2 = step2(state2, shard_batch(mesh, batch), jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    l1 = jax.tree.leaves(s1.params)[0]
    l2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-4)


def test_sample_runs(rng):
    sys_ = _system()
    params = sys_.init_params(jax.random.PRNGKey(0), H, W, v=V_IN)
    c2ws, fxy = orbit_cameras(V_IN, h=H, w=W)
    cond = jnp.asarray(rng.uniform(size=(1, 1, 3, H, W)).astype(np.float32))
    out = sys_.sample(params, cond, jnp.asarray(c2ws)[None],
                      jnp.asarray(fxy)[None], jax.random.PRNGKey(3))
    assert out["sample"].shape == (1, V_IN - 1, 3, H, W)
    assert out["renders"].shape == (1, V_IN, 3, H, W)
    g = out["gaussians"]
    assert g.xyz.shape[1] == 2 + V_IN * H * W
    assert np.isfinite(np.asarray(out["sample"])).all()


def test_tensor_parallel_train_step_matches(rng):
    """dp x tp mesh (4 x 2): megatron-sharded DiT params; one step must
    match the unsharded result (XLA inserts the TP collectives)."""
    from open_diffusiongs_tpu.parallel.mesh import (
        make_mesh, tensor_parallel_state_sharding)
    sys_ = _system()
    params = sys_.init_params(jax.random.PRNGKey(0), H, W, v=V_IN)
    tx = make_optimizer(OptimizerConfig(lr=1e-3, t_max=1000))
    batch = _batch(rng, b=8)

    state1 = init_train_state(params, tx, ema_decay=None)
    step1 = make_train_step(sys_.train_loss, tx, mesh=None, ema_decay=None,
                            donate=False)
    s1, m1 = step1(state1, batch, jax.random.PRNGKey(2))

    mesh = make_mesh(model_parallel=2)
    assert mesh.devices.shape == (4, 1, 1, 2)   # (data, pipe, seq, model)
    state2 = init_train_state(params, tx, ema_decay=None)
    state_sh = tensor_parallel_state_sharding(mesh, state2)
    state2 = jax.device_put(state2, state_sh)
    # verify something actually got sharded on the model axis
    qk = state2.params["params"]["transformer"]["layers"]["block"]["attn"][
        "q"]["kernel"]
    assert "model" in str(qk.sharding.spec)
    step2 = make_train_step(sys_.train_loss, tx, mesh=mesh, ema_decay=None,
                            donate=False, state_shardings=state_sh)
    s2, m2 = step2(state2, shard_batch(mesh, batch), jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    l1 = jax.tree.leaves(s1.params)[0]
    l2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-4)


def test_zero1_train_step_matches(rng):
    """ZeRO-1 optimizer-state sharding (mu/nu/EMA over the 8-way data
    axis): one step must match the replicated-state result bit-for-bit
    semantics-wise, with the moment leaves actually sharded."""
    from open_diffusiongs_tpu.parallel.mesh import (make_mesh,
                                                    train_state_sharding)
    sys_ = _system()
    params = sys_.init_params(jax.random.PRNGKey(0), H, W, v=V_IN)
    tx = make_optimizer(OptimizerConfig(lr=1e-3, t_max=1000))
    batch = _batch(rng, b=8)

    state1 = init_train_state(params, tx, ema_decay=0.9)
    step1 = make_train_step(sys_.train_loss, tx, mesh=None, ema_decay=0.9,
                            donate=False)
    s1, m1 = step1(state1, batch, jax.random.PRNGKey(2))

    mesh = make_mesh()
    state2 = init_train_state(params, tx, ema_decay=0.9)
    state_sh = train_state_sharding(mesh, state2, zero1=True)
    state2 = jax.device_put(state2, state_sh)
    # moments and EMA sharded over data; params replicated
    mu = state2.opt_state[1][0].mu["params"]["transformer"]["layers"][
        "block"]["attn"]["q"]["kernel"]
    assert "data" in str(mu.sharding.spec), mu.sharding
    ema = jax.tree.leaves(state2.ema_params)
    assert any("data" in str(e.sharding.spec) for e in ema)
    assert all("data" not in str(p.sharding.spec)
               for p in jax.tree.leaves(state2.params))
    step2 = make_train_step(sys_.train_loss, tx, mesh=mesh, ema_decay=0.9,
                            donate=False, state_shardings=state_sh)
    s2, m2 = step2(state2, shard_batch(mesh, batch), jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    for a, b in zip(jax.tree.leaves(s1.ema_params),
                    jax.tree.leaves(s2.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_sample_batch_elements_independent(rng):
    """Batched sampling (pipeline.batch serving mode) must reproduce each
    element's single-sample result exactly: the whole chain (denoiser
    attention, rasterizer, diffusion update) is per-batch-element.  Noise
    is replayed through noise_fn so the b=2 and b=1 runs see identical
    per-element draws (the PRNG path draws shape-[b,...] tensors, which
    would legitimately differ)."""
    from open_diffusiongs_tpu.diffusion.gaussian_diffusion import (
        p_sample_loop)

    sys_ = _system()
    params = sys_.init_params(jax.random.PRNGKey(0), H, W, v=V_IN)
    c2ws, fxy = orbit_cameras(V_IN, h=H, w=W)
    conds = rng.uniform(size=(2, 1, 3, H, W)).astype(np.float32)
    init = rng.normal(size=(2, V_IN - 1, 3, H, W)).astype(np.float32)
    T = sys_.sched_infer.num_steps
    tbl = rng.normal(size=(T, V_IN - 1, 3, H, W)).astype(np.float32)

    def run(cond, noise):
        b = cond.shape[0]
        c2w_b = jnp.asarray(np.broadcast_to(c2ws, (b,) + c2ws.shape))
        fxy_b = jnp.asarray(np.broadcast_to(fxy, (b,) + fxy.shape))
        loop_fn = sys_.make_model_fn(params, c2w_b, fxy_b, H, W,
                                     skip_cond_render=1)
        final_fn = sys_.make_model_fn(params, c2w_b, fxy_b, H, W)
        noise_fn = lambda t: jnp.broadcast_to(  # noqa: E731
            jnp.asarray(tbl)[t][None], (b, V_IN - 1, 3, H, W))
        return p_sample_loop(sys_.sched_infer, loop_fn, jnp.asarray(cond),
                             jnp.asarray(noise), jax.random.PRNGKey(5),
                             clip_denoised=False, final_model_fn=final_fn,
                             noise_fn=noise_fn)

    out_b = run(conds, init)
    for i in range(2):
        out_1 = run(conds[i:i + 1], init[i:i + 1])
        np.testing.assert_allclose(
            np.asarray(out_b["sample"][i]), np.asarray(out_1["sample"][0]),
            rtol=0, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(out_b["renders"][i]), np.asarray(out_1["renders"][0]),
            rtol=0, atol=2e-5)


def test_pipeline_batch_api(rng):
    """pipeline.batch returns one independently-filtered output per input
    and matches __call__ (which routes through it)."""
    from open_diffusiongs_tpu.pipeline import DiffusionGSPipeline

    sys_ = _system()
    params = sys_.init_params(jax.random.PRNGKey(0), H, W, v=V_IN)
    pipe = DiffusionGSPipeline(sys_, params)
    imgs = [rng.uniform(size=(3, H, W)).astype(np.float32) for _ in range(2)]
    outs = pipe.batch(imgs, resolution=H, n_views=V_IN, seed=3)
    assert len(outs) == 2
    for o in outs:
        assert o.renders.shape == (V_IN, 3, H, W)
        assert np.isfinite(o.renders).all()
        assert o.gaussians.xyz.ndim == 2
    single = pipe(imgs[0], resolution=H, n_views=V_IN, seed=3)
    assert single.renders.shape == (V_IN, 3, H, W)


def test_pipeline_batch_sharded_matches_unsharded(rng):
    """Serving scale-out: pipeline.batch(device_mesh=...) shards the
    request bundle over the mesh's `data` axis; per-element results must
    match the unsharded run (partitionable threefry + per-element compute
    chain)."""
    from open_diffusiongs_tpu.parallel.mesh import make_mesh
    from open_diffusiongs_tpu.pipeline import DiffusionGSPipeline

    sys_ = _system()
    params = sys_.init_params(jax.random.PRNGKey(0), H, W, v=V_IN)
    pipe = DiffusionGSPipeline(sys_, params)
    imgs = [rng.uniform(size=(3, H, W)).astype(np.float32) for _ in range(2)]

    plain = pipe.batch(imgs, resolution=H, n_views=V_IN, seed=3)
    mesh = make_mesh(jax.devices()[:2])                 # dp=2 x tp=1
    sharded = pipe.batch(imgs, resolution=H, n_views=V_IN, seed=3,
                         device_mesh=mesh)
    for a, b in zip(plain, sharded):
        np.testing.assert_allclose(b.renders, a.renders, atol=2e-5, rtol=0)
        np.testing.assert_allclose(b.gaussians.xyz, a.gaussians.xyz,
                                   atol=2e-5, rtol=0)
