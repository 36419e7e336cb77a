"""End-to-end training correctness: overfit one batch.

SURVEY.md §4: "an end-to-end overfit-one-batch test replaces the
reference's watch-the-loss workflow".  A tiny denoiser + rasterizer must
fit a single synthetic batch: the rendering loss (and PSNR) must improve
substantially, proving gradients flow correctly through DiT -> Gaussians ->
tile rasterizer.
"""

import jax
import jax.numpy as jnp
import numpy as np

from open_diffusiongs_tpu.ops.rasterize import RasterizeConfig
from open_diffusiongs_tpu.parallel.train_step import (OptimizerConfig,
                                                      init_train_state,
                                                      make_optimizer,
                                                      make_train_step)
from open_diffusiongs_tpu.systems.object_system import (ObjectSystem,
                                                        ObjectSystemConfig)
from utils3d import orbit_cameras, random_gaussians
import pytest


# interpret-mode Pallas kernels / subprocess / multi-second jits:
# fast sweep is `pytest -m "not slow"` (pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.slow

H = W = 16
V = 2


def test_overfit_one_batch(rng):
    # target images: render a fixed random Gaussian scene from 2 views so
    # the target is actually achievable by the model's output space
    from open_diffusiongs_tpu.ops import rasterize as rz
    from open_diffusiongs_tpu.ops.gaussians import Gaussians
    g_target = random_gaussians(rng, 1, 200, scale_mean=-2.5)
    c2ws, fxy = orbit_cameras(V, h=H, w=W)
    c2w = jnp.asarray(c2ws)[None]
    fxy_j = jnp.asarray(fxy)[None]
    cfg_r = RasterizeConfig(max_tiles_per_gaussian=16, max_per_tile=576,
                            blend_chunk=32)
    target = rz.render(Gaussians(*(jnp.asarray(x) for x in g_target)),
                       c2w, fxy_j, H, W, cfg=cfg_r)["render"]

    sys_ = ObjectSystem(ObjectSystemConfig(
        num_inference_steps=2,
        # constant lambdas so the loss is active from step 0
        lambda_diffusion=1.0, lambda_lpips=0.0, lambda_ssim=0.0,
        lambda_pointsdist=0.0, lambda_xyz=0.0,
        shape_model=dict(width=64, patch_size=8, n_gaussians=2,
                         dim_heads=32, num_layers=2, remat=False),
        raster=cfg_r, use_lpips=False))
    params = sys_.init_params(jax.random.PRNGKey(0), H, W, v=V)
    tx = make_optimizer(OptimizerConfig(lr=3e-3, grad_clip=1.0,
                                        scheduler="constant"))
    state = init_train_state(params, tx, ema_decay=None)
    step = make_train_step(sys_.train_loss, tx, mesh=None, ema_decay=None,
                           donate=False)

    batch = {
        "rgbs_input": target[:, :V],
        "c2ws_input": c2w, "fxfycxcys_input": fxy_j,
        "depths_input": jnp.full((1, V, 1, H, W), 3.0),
        "masks_input": jnp.ones((1, V, 1, H, W)),
        "rgbs": target, "c2ws": c2w, "fxfycxcys": fxy_j,
        "masks": jnp.ones((1, V, 1, H, W)),
    }
    # fixed rng => fixed timestep/noise: a true overfit setting
    key = jax.random.PRNGKey(7)

    losses = []
    for i in range(60):
        state, metrics = step(state, batch, key)
        losses.append(float(metrics["loss_diffusion"]))
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert last < first * 0.5, (first, last)
    # PSNR improved by > 3 dB
    psnr_first = -10 * np.log10(first)
    psnr_last = -10 * np.log10(last)
    assert psnr_last - psnr_first > 3.0, (psnr_first, psnr_last)
