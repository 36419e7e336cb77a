"""Rasterizer capacity-overflow accuracy (policy: docs/CAPACITY.md).

The CUDA rasterizer never drops work (rasterizer_impl.cu:277-308 sizes
buffers dynamically); the static-shape TPU design caps each tile at K
candidates, dropping the FARTHEST Gaussians (ops/rasterize.py bin_tiles).
These tests pin the measured accuracy behavior against the exact naive
oracle on a *concentrated* (worst-case) population:

  * error decreases monotonically as K grows;
  * renders are bit-exact once nothing overflows;
  * moderate overflow can already be lossless when per-pixel transmittance
    saturates within the nearest-K prefix (the trained-statistics regime,
    see docs/CAPACITY.md measurements);
  * the overflow_frac diagnostic render() reports is what launch.py's
    capacity warning gates on.
"""

import jax.numpy as jnp
import numpy as np

from open_diffusiongs_tpu.ops import rasterize as rz
from open_diffusiongs_tpu.ops import rasterize_ref
from open_diffusiongs_tpu.ops.gaussians import Gaussians
from utils3d import orbit_cameras
import pytest


# interpret-mode Pallas kernels / subprocess / multi-second jits:
# fast sweep is `pytest -m "not slow"` (pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.slow

H = W = 32  # 2x2 tiles


def _concentrated(rng, n, opacity_raw=-2.0):
    """Gaussians clustered in a small ball -> all land on the same tiles."""
    return Gaussians(
        xyz=rng.normal(0, 0.12, (1, n, 3)).astype(np.float32),
        features=rng.normal(0, 0.6, (1, n, 1, 3)).astype(np.float32),
        scaling=(-3.2 + 0.2 * rng.normal(0, 1, (1, n, 3))).astype(np.float32),
        rotation=rng.normal(0, 1, (1, n, 4)).astype(np.float32),
        opacity=np.full((1, n, 1), opacity_raw, np.float32))


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


def _render(g, k):
    c2ws, fxy = orbit_cameras(1, h=H, w=W)
    c2w = jnp.asarray(c2ws)[None]
    fxy_j = jnp.asarray(fxy)[None]
    gj = Gaussians(*(jnp.asarray(x) for x in g))
    cfg = rz.RasterizeConfig(max_tiles_per_gaussian=16, max_per_tile=k,
                             blend_chunk=32)
    return rz.render(gj, c2w, fxy_j, H, W, cfg=cfg)


def _oracle(g):
    c2ws, fxy = orbit_cameras(1, h=H, w=W)
    gj = Gaussians(*(jnp.asarray(x) for x in g))
    return rasterize_ref.render_naive(gj, jnp.asarray(c2ws)[None],
                                      jnp.asarray(fxy)[None], H, W)


def test_overflow_error_monotone_in_k(rng):
    """PSNR vs the no-drop oracle improves monotonically with K, reaching
    exactness when overflow hits zero (the measured curve behind
    docs/CAPACITY.md)."""
    g = _concentrated(rng, 4096)
    oracle = _oracle(g)
    last_psnr, last_frac = -1.0, 2.0
    for k in (256, 1024, 4096):
        out = _render(g, k)
        frac = (float(out["overflow_gaussians"])
                / max(float(out["binned_entries"]), 1.0))
        psnr = _psnr(out["render"][0, 0], oracle["render"][0, 0])
        assert psnr > last_psnr - 0.5, (k, psnr, last_psnr)
        assert frac < last_frac, (k, frac, last_frac)
        last_psnr, last_frac = psnr, frac
    assert last_frac == 0.0
    assert last_psnr > 60.0, last_psnr  # exact (fp noise only)


def test_overflow_exactness_with_enough_capacity(rng):
    g = _concentrated(rng, 4096)
    out = _render(g, 8192)
    oracle = _oracle(g)
    assert int(out["overflow_gaussians"]) == 0
    np.testing.assert_allclose(
        np.asarray(out["render"][0, 0]),
        np.asarray(oracle["render"][0, 0]), rtol=1e-4, atol=1e-4)


def test_saturation_makes_moderate_overflow_lossless(rng):
    """Opaque front layers saturate transmittance within the nearest-K
    prefix, so entries dropped BEHIND them cost nothing — the trained-
    statistics regime that makes the capacity policy workable at all.
    Here: an opaque near shell fully occludes a far cluster; dropping the
    far cluster's entries (overflow > 0) leaves the render exact."""
    n_near, n_far = 2048, 2048
    near = _concentrated(rng, n_near, opacity_raw=6.0)   # sigmoid ~ 0.998
    near = near._replace(scaling=(-2.6 + 0.1 * rng.normal(
        0, 1, (1, n_near, 3))).astype(np.float32))       # solid blob
    far = _concentrated(rng, n_far, opacity_raw=-1.0)
    far = far._replace(xyz=(far.xyz * 0.25).astype(np.float32))  # tight
    g = Gaussians(*(np.concatenate([a, b], axis=1)
                    for a, b in zip(near, far)))
    # push the far cluster 2 units straight behind the near one ALONG THE
    # VIEW AXIS (camera eye from orbit_cameras at azimuth 0.3)
    eye = np.array([3 * np.cos(0.3), 3 * 0.3, 3 * np.sin(0.3)], np.float32)
    g.xyz[:, n_near:] -= 2.0 * eye / np.linalg.norm(eye)
    out = _render(g, 2048)
    oracle = _oracle(g)
    assert int(out["overflow_gaussians"]) > 0
    psnr = _psnr(out["render"][0, 0], oracle["render"][0, 0])
    assert psnr > 45.0, psnr


def test_overflow_frac_metric(rng):
    """render() reports binned_entries so callers can normalize the
    overflow counter into the fraction the launch.py warning gates on."""
    g = _concentrated(rng, 2048)
    out = _render(g, 128)
    frac = (float(out["overflow_gaussians"])
            / max(float(out["binned_entries"]), 1.0))
    assert 0.0 < frac < 1.0
