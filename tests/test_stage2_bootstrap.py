"""Stage-2-from-stage-1 pretrained bootstrap (the two-stage training recipe).

The reference scene model loads stage-1 object weights at construction via
`system.shape_model.pretrained_model_name_or_path` with key remapping
(denoiser_scene.py:264-290), and BaseSystem supports a generic non-strict
partial load via `system.weights` (+ ignore list) (systems/base.py:47-57,
utils/misc.py:40-70).  These tests prove both paths work from YAML-shaped
config dicts through builder -> system.load_pretrained, from both an orbax
stage-1 checkpoint and a converted flat NPZ.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_diffusiongs_tpu.ops.rasterize import RasterizeConfig
from open_diffusiongs_tpu.parallel.train_step import (OptimizerConfig,
                                                      init_train_state,
                                                      make_optimizer,
                                                      make_train_step)
from open_diffusiongs_tpu.systems.builder import build_system
from open_diffusiongs_tpu.systems.object_system import (ObjectSystem,
                                                        ObjectSystemConfig)
from open_diffusiongs_tpu.systems.scene_system import (SceneSystem,
                                                       SceneSystemConfig)
from open_diffusiongs_tpu.utils.checkpoint import (CheckpointManager,
                                                   load_module_weights,
                                                   load_weights_file)
from utils3d import orbit_cameras

# interpret-mode Pallas kernels / subprocess / multi-second jits:
# fast sweep is `pytest -m "not slow"` (pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.slow

H = W = 16
V = 2
TINY = dict(width=64, patch_size=8, n_gaussians=2, dim_heads=32,
            num_layers=2, remat=False)
RASTER = RasterizeConfig(max_tiles_per_gaussian=16, max_per_tile=576,
                         blend_chunk=32)


def _leaves_equal(a, b):
    return all(bool(jnp.allclose(x, y.astype(x.dtype)))
               for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def _make_stage1(tmp_path, ema: bool):
    sys1 = ObjectSystem(ObjectSystemConfig(
        shape_model=TINY, raster=RASTER, use_lpips=False))
    params1 = sys1.init_params(jax.random.PRNGKey(7), H, W, v=V)
    tx = make_optimizer(OptimizerConfig())
    state = init_train_state(params1, tx, ema_decay=0.9999 if ema else None)
    mngr = CheckpointManager(str(tmp_path / "stage1" / "ckpts"))
    mngr.maybe_save(state, force=True)
    mngr.close()
    return params1


def test_scene_bootstraps_from_object_ckpt(tmp_path):
    params1 = _make_stage1(tmp_path, ema=False)

    sys2 = SceneSystem(SceneSystemConfig(
        shape_model=TINY, raster=RASTER, use_lpips=False,
        pretrained_model_name_or_path=str(tmp_path / "stage1")))
    params2 = sys2.init_params(jax.random.PRNGKey(8), H, W, v=V)
    assert not _leaves_equal(params1, params2)  # different init seeds
    params2 = sys2.load_pretrained(params2)
    assert _leaves_equal(params1, params2)


def test_bootstrap_then_train_step(tmp_path):
    """The published two-stage recipe: a scene system trains FROM the
    loaded object weights (one step, loss finite, params move)."""
    _make_stage1(tmp_path, ema=True)
    sys2 = SceneSystem(SceneSystemConfig(
        shape_model=TINY, raster=RASTER, use_lpips=False,
        lambda_diffusion=1.0, lambda_lpips=0.0, lambda_ssim=0.0,
        lambda_pointsdist=0.0, lambda_xyz=0.0,
        pretrained_model_name_or_path=str(tmp_path / "stage1")))
    params = sys2.load_pretrained(
        sys2.init_params(jax.random.PRNGKey(8), H, W, v=V))

    c2ws, fxy = orbit_cameras(V, h=H, w=W)
    batch = {
        "rgbs_input": jnp.ones((1, V, 3, H, W)) * 0.5,
        "c2ws_input": jnp.asarray(c2ws)[None],
        "fxfycxcys_input": jnp.asarray(fxy)[None],
        "rgbs": jnp.ones((1, V, 3, H, W)) * 0.5,
        "c2ws": jnp.asarray(c2ws)[None],
        "fxfycxcys": jnp.asarray(fxy)[None],
    }
    tx = make_optimizer(OptimizerConfig(lr=1e-3, scheduler="constant"))
    state = init_train_state(params, tx, ema_decay=None)
    step = make_train_step(sys2.train_loss, tx, mesh=None, ema_decay=None,
                           donate=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert not _leaves_equal(state.params, new_state.params)


def test_strict_load_rejects_arch_mismatch(tmp_path):
    _make_stage1(tmp_path, ema=False)
    wrong = dict(TINY, width=96)
    sys2 = SceneSystem(SceneSystemConfig(
        shape_model=wrong, raster=RASTER, use_lpips=False,
        pretrained_model_name_or_path=str(tmp_path / "stage1")))
    params2 = sys2.init_params(jax.random.PRNGKey(8), H, W, v=V)
    with pytest.raises((ValueError, KeyError)):
        sys2.load_pretrained(params2)


def test_weights_partial_load_with_ignore(tmp_path):
    """system.weights non-strict load skips ignored modules
    (systems/base.py:27-28, utils/misc.py:52-60 semantics)."""
    params1 = _make_stage1(tmp_path, ema=False)

    sys2 = ObjectSystem(ObjectSystemConfig(
        shape_model=TINY, raster=RASTER, use_lpips=False,
        weights=str(tmp_path / "stage1"),
        weights_ignore_modules=("image_tokenizer",)))
    params2 = sys2.init_params(jax.random.PRNGKey(8), H, W, v=V)
    orig_tok = jax.tree.map(lambda x: x,
                            params2["params"]["image_tokenizer"])
    merged = sys2.load_pretrained(params2)
    # ignored module keeps its fresh init
    assert _leaves_equal(orig_tok, merged["params"]["image_tokenizer"])
    # a non-ignored module took the stage-1 values
    assert _leaves_equal(params1["params"]["t_embedder"],
                         merged["params"]["t_embedder"])


def test_npz_source_roundtrip(tmp_path):
    """load_weights_file also accepts the converted-NPZ layout
    (tools/convert_reference_ckpt.py '/'-joined keys)."""
    sys1 = ObjectSystem(ObjectSystemConfig(
        shape_model=TINY, raster=RASTER, use_lpips=False))
    params1 = sys1.init_params(jax.random.PRNGKey(7), H, W, v=V)
    flat = {"/".join(str(k.key) for k in path): np.asarray(v)
            for path, v in jax.tree_util.tree_flatten_with_path(
                params1["params"])[0]}
    np.savez(tmp_path / "w.npz", **flat)

    src = load_weights_file(str(tmp_path / "w.npz"))
    params2 = sys1.init_params(jax.random.PRNGKey(9), H, W, v=V)
    merged = load_module_weights(params2, src, strict=True)
    assert _leaves_equal(params1, merged)


def test_builder_lifts_pretrained_key(tmp_path):
    """The scene YAML surface (shape_model.pretrained_model_name_or_path +
    system.weights) flows through build_system."""
    system_cfg = {
        "shape_model": dict(TINY, use_checkpoint=False,
                            pretrained_model_name_or_path="/some/path"),
        "weights": "/other/path",
        "weights_ignore_modules": ["image_tokenizer"],
    }
    # builder maps use_checkpoint->remat; drop our direct remat key
    system_cfg["shape_model"].pop("remat")
    sys_ = build_system("diffusion-gs-scene-system", system_cfg, bf16=False)
    assert sys_.cfg.pretrained_model_name_or_path == "/some/path"
    assert sys_.cfg.weights == "/other/path"
    assert sys_.cfg.weights_ignore_modules == ("image_tokenizer",)
