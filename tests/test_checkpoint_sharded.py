"""Checkpoint restore into SHARDED TrainStates (tp / pp training resume).

A production cluster saves from one sharding and resumes into another
(e.g. a replicated single-host checkpoint into a tp=2 or pp=2 mesh, or
after changing the mesh shape).  Orbax StandardRestore re-shards to the
template's NamedShardings; these tests pin that the round-trip preserves
values, lands on the requested shardings, and that training continues.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from open_diffusiongs_tpu.ops.rasterize import RasterizeConfig
from open_diffusiongs_tpu.parallel.mesh import (make_mesh, shard_batch,
                                                train_state_sharding)
from open_diffusiongs_tpu.parallel.train_step import (OptimizerConfig,
                                                      init_train_state,
                                                      make_optimizer,
                                                      make_train_step)
from open_diffusiongs_tpu.systems.object_system import (ObjectSystem,
                                                        ObjectSystemConfig)
from open_diffusiongs_tpu.utils.checkpoint import CheckpointManager
from utils3d import orbit_cameras
import pytest


# interpret-mode Pallas kernels / subprocess / multi-second jits:
# fast sweep is `pytest -m "not slow"` (pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.slow

H = W = 16
V_IN, V_SUP = 2, 3
TINY = dict(width=64, patch_size=8, n_gaussians=2, dim_heads=32,
            num_layers=2, remat=False)
RASTER = RasterizeConfig(max_tiles_per_gaussian=16, max_per_tile=576,
                         blend_chunk=32)


def _system():
    return ObjectSystem(ObjectSystemConfig(
        shape_model=TINY, raster=RASTER, use_lpips=False))


def _batch(rng, b):
    c2ws, fxy = orbit_cameras(V_SUP, h=H, w=W)
    return {
        "rgbs_input": jnp.asarray(
            rng.uniform(size=(b, V_IN, 3, H, W)), jnp.float32),
        "c2ws_input": jnp.asarray(
            np.broadcast_to(c2ws[:V_IN], (b, V_IN, 4, 4))),
        "fxfycxcys_input": jnp.asarray(
            np.broadcast_to(fxy[:V_IN], (b, V_IN, 4))),
        "depths_input": jnp.asarray(
            rng.uniform(2.0, 4.0, (b, V_IN, 1, H, W)), jnp.float32),
        "masks_input": jnp.ones((b, V_IN, 1, H, W), jnp.float32),
        "rgbs": jnp.asarray(rng.uniform(size=(b, V_SUP, 3, H, W)),
                            jnp.float32),
        "c2ws": jnp.asarray(np.broadcast_to(c2ws, (b, V_SUP, 4, 4))),
        "fxfycxcys": jnp.asarray(np.broadcast_to(fxy, (b, V_SUP, 4))),
        "masks": jnp.ones((b, V_SUP, 1, H, W), jnp.float32),
    }


def _save_replicated(tmp_path, seed=3):
    sys_ = _system()
    params = sys_.init_params(jax.random.PRNGKey(seed), H, W, v=V_IN)
    tx = make_optimizer(OptimizerConfig(lr=1e-3, t_max=100))
    state = init_train_state(params, tx, ema_decay=0.9999)
    mngr = CheckpointManager(str(tmp_path / "ckpts"))
    mngr.maybe_save(state, force=True)
    mngr.close()
    return sys_, tx, state


def test_restore_into_tp_sharded_state(tmp_path, rng):
    """Replicated save -> restore into a tp=2-sharded template: values
    equal, shardings as requested, and a train step runs on the mesh."""
    sys_, tx, state0 = _save_replicated(tmp_path)
    mesh = make_mesh(jax.devices()[:4], model_parallel=2)
    sh = train_state_sharding(mesh, state0, tp=True)
    template = jax.device_put(state0, sh)

    mngr = CheckpointManager(str(tmp_path / "ckpts"))
    restored = mngr.restore(template)
    mngr.close()

    # a column-parallel qkv kernel leaf must be model-sharded
    q_kernel = restored.params["params"]["transformer"]["layers"]["block"][
        "attn"]["q"]["kernel"]
    assert q_kernel.sharding.spec == P(None, None, "model"), \
        q_kernel.sharding.spec
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state0.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(restored.ema_params),
                    jax.tree.leaves(state0.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    step_fn = make_train_step(sys_.train_loss, tx, mesh=mesh,
                              ema_decay=0.9999, donate=False,
                              state_shardings=sh)
    with mesh:
        state1, metrics = step_fn(restored, shard_batch(mesh, _batch(rng, 2)),
                                  jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state1.step) == int(state0.step) + 1


def test_restore_into_pp_sharded_state(tmp_path, rng):
    """Replicated save -> restore into a pipe=2-sharded template: the
    scanned layer axis lands on `pipe` with values intact."""
    sys_, tx, state0 = _save_replicated(tmp_path, seed=4)
    mesh = make_mesh(jax.devices()[:4], pipe_parallel=2)
    sh = train_state_sharding(mesh, state0, pp=True)
    template = jax.device_put(state0, sh)

    mngr = CheckpointManager(str(tmp_path / "ckpts"))
    restored = mngr.restore(template)
    mngr.close()

    stack_leaf = restored.params["params"]["transformer"]["layers"]["block"][
        "attn"]["q"]["kernel"]
    assert stack_leaf.sharding.spec == P("pipe"), stack_leaf.sharding.spec
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state0.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_save_then_replicated_restore(tmp_path, rng):
    """The reverse direction: save FROM a tp-sharded state, restore into a
    replicated template (e.g. eval on one chip)."""
    sys_, tx, state0 = _save_replicated(tmp_path, seed=5)
    mesh = make_mesh(jax.devices()[:4], model_parallel=2)
    sh = train_state_sharding(mesh, state0, tp=True)
    sharded = jax.device_put(state0, sh)

    mngr = CheckpointManager(str(tmp_path / "ckpts2"))
    mngr.maybe_save(sharded, force=True)
    mngr.close()

    mngr = CheckpointManager(str(tmp_path / "ckpts2"))
    restored = mngr.restore(state0)
    mngr.close()
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state0.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
