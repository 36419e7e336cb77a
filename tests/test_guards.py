"""Missing-pretrained-weights guards (VERDICT r3 #6).

The reference recipe weights LPIPS from step 150
(configs/diffusionGS_rel.yaml:52) and runs rembg's learned U²-Net for
background removal (pipline_obj.py:256-261).  Without the pretrained
weights in-image, silently dropping either term would train/serve a
DIFFERENT model than the reference — these tests pin that the framework
refuses instead, unless the user explicitly waives the term.
"""

import numpy as np
import pytest

from open_diffusiongs_tpu.ops.rasterize import RasterizeConfig
from open_diffusiongs_tpu.systems.object_system import (ObjectSystem,
                                                        ObjectSystemConfig)

TINY = dict(width=32, num_layers=1, dim_heads=16, patch_size=8,
            remat=False)
RASTER = RasterizeConfig(16, 64, 16)


def _batch(h=16, w=16, v=2):
    import jax.numpy as jnp
    z = jnp.zeros
    return {
        "rgbs_input": z((1, v, 3, h, w)), "c2ws_input": jnp.tile(
            jnp.eye(4)[None, None], (1, v, 1, 1)),
        "fxfycxcys_input": jnp.tile(
            jnp.asarray([[16.0, 16.0, 8.0, 8.0]])[None], (1, v, 1)),
        "depths_input": z((1, v, 1, h, w)),
        "masks_input": z((1, v, 1, h, w)),
        "rgbs": z((1, v, 3, h, w)),
        "c2ws": jnp.tile(jnp.eye(4)[None, None], (1, v, 1, 1)),
        "fxfycxcys": jnp.tile(
            jnp.asarray([[16.0, 16.0, 8.0, 8.0]])[None], (1, v, 1)),
        "masks": z((1, v, 1, h, w)),
    }


@pytest.mark.slow
def test_lpips_weighted_without_weights_refuses_to_train():
    """Flagship-config shape: lambda_lpips ramps on at step 150 and no
    pretrained VGG exists -> train_loss must raise, not warn."""
    import jax
    sys_ = ObjectSystem(ObjectSystemConfig(
        shape_model=TINY, raster=RASTER,
        lambda_lpips=(150, 0.0, 0.5, 151), use_lpips=True))
    assert sys_._lpips_missing
    params = sys_.init_params(jax.random.PRNGKey(0), 16, 16, v=2)
    with pytest.raises(RuntimeError, match="lpips"):
        sys_.train_loss(params, _batch(), jax.random.PRNGKey(1), 0)


@pytest.mark.slow
def test_lpips_explicit_waivers_allow_training():
    import jax
    for kw in (dict(use_lpips=False), dict(lambda_lpips=0.0),
               dict(allow_random_lpips=True)):
        sys_ = ObjectSystem(ObjectSystemConfig(
            shape_model=TINY, raster=RASTER, **kw))
        params = sys_.init_params(jax.random.PRNGKey(0), 16, 16, v=2)
        loss, metrics = sys_.train_loss(params, _batch(),
                                        jax.random.PRNGKey(1), 0)
        assert np.isfinite(float(loss))


def test_lpips_missing_does_not_block_sampling():
    """Sampling never touches LPIPS: the guard must not fire at init."""
    sys_ = ObjectSystem(ObjectSystemConfig(
        shape_model=TINY, raster=RASTER, use_lpips=True))
    assert sys_.lpips_params is None  # disabled, but constructable


def test_matting_default_requires_u2net_weights(monkeypatch, tmp_path):
    from open_diffusiongs_tpu import pipeline
    monkeypatch.setenv("U2NET_NPZ", str(tmp_path / "absent.npz"))
    pipeline._U2NET_CACHE.clear()
    img = np.zeros((8, 8, 3), np.uint8)
    try:
        with pytest.raises(RuntimeError, match="grabcut"):
            pipeline.remove_background(img)
        # explicit acknowledgment of the last-resort heuristic works
        alpha = pipeline.remove_background(img, matting="border")
        assert alpha.shape == (8, 8)
        with pytest.raises(ValueError):
            pipeline.remove_background(img, matting="rembg")
    finally:
        pipeline._U2NET_CACHE.clear()
