"""Golden-image regression: the tiled renderer's output on a fixed scene is
pinned to stored pixels (catches silent semantic drift in preprocess /
binning / blending — the role of the reference's manual PLY-render smoke
test, gs_core.py:1319-1382, made automatic)."""

import os

import jax.numpy as jnp
import numpy as np

from open_diffusiongs_tpu.ops import rasterize as rz
from open_diffusiongs_tpu.ops.gaussians import Gaussians
from utils3d import orbit_cameras, random_gaussians
import pytest


# interpret-mode Pallas kernels / subprocess / multi-second jits:
# fast sweep is `pytest -m "not slow"` (pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.slow

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "render_300g_64px.npz")


def test_golden_render():
    rng = np.random.default_rng(42)
    g = random_gaussians(rng, 1, 300, scale_mean=-3.0)
    c2ws, fxy = orbit_cameras(2, h=64, w=64)
    out = rz.render(Gaussians(*(jnp.asarray(x) for x in g)),
                    jnp.asarray(c2ws)[None], jnp.asarray(fxy)[None], 64, 64,
                    cfg=rz.RasterizeConfig(32, 256, 32))
    expect = np.load(GOLDEN)
    np.testing.assert_allclose(np.asarray(out["render"]), expect["render"],
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["alpha"]), expect["alpha"],
                               atol=2e-5)
