"""Unit tests for Gaussian-splatting math vs independent NumPy/SciPy."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from open_diffusiongs_tpu.ops import gs_math
from open_diffusiongs_tpu.ops import camera as cam_lib
from utils3d import look_at
import pytest


def test_quat_to_rotmat_vs_scipy(rng):
    q = rng.normal(size=(32, 4)).astype(np.float32)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    R = np.asarray(gs_math.quat_to_rotmat(jnp.asarray(q)))
    # scipy uses (x, y, z, w); ours is (w, x, y, z)
    R_sp = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(R, R_sp, atol=1e-5)


def test_build_cov3d(rng):
    q = rng.normal(size=(8, 4)).astype(np.float32)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    s = np.exp(rng.normal(size=(8, 3))).astype(np.float32)
    cov6 = np.asarray(gs_math.build_cov3d(jnp.asarray(s), jnp.asarray(q)))
    R = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    for i in range(8):
        sigma = R[i] @ np.diag(s[i] ** 2) @ R[i].T
        expect = [sigma[0, 0], sigma[0, 1], sigma[0, 2],
                  sigma[1, 1], sigma[1, 2], sigma[2, 2]]
        np.testing.assert_allclose(cov6[i], expect, rtol=1e-4, atol=1e-5)


def _ewa_numpy(mean, cov3d6, w2c, fx, fy, tanx, tany):
    """Literal NumPy translation of forward.cu computeCov2D:74-113."""
    t = w2c[:3, :3] @ mean + w2c[:3, 3]
    limx, limy = 1.3 * tanx, 1.3 * tany
    txtz = np.clip(t[0] / t[2], -limx, limx)
    tytz = np.clip(t[1] / t[2], -limy, limy)
    tx, ty, tz = txtz * t[2], tytz * t[2], t[2]
    J = np.array([[fx / tz, 0, -fx * tx / tz ** 2],
                  [0, fy / tz, -fy * ty / tz ** 2],
                  [0, 0, 0]])
    W = w2c[:3, :3]
    c = cov3d6
    V = np.array([[c[0], c[1], c[2]], [c[1], c[3], c[4]], [c[2], c[4], c[5]]])
    cov = J @ W @ V @ W.T @ J.T
    return np.array([cov[0, 0] + 0.3, cov[0, 1], cov[1, 1] + 0.3])


@pytest.mark.slow
def test_ewa_cov2d_vs_numpy(rng):
    c2w = look_at((1.0, 0.8, -2.5))
    fxy = np.asarray([120.0, 110.0, 32.0, 30.0], np.float32)
    cam = cam_lib.make_camera(jnp.asarray(c2w), jnp.asarray(fxy), 64, 64)
    means = rng.normal(0, 0.5, size=(16, 3)).astype(np.float32)
    q = rng.normal(size=(16, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    s = np.exp(rng.normal(-2, 0.5, size=(16, 3))).astype(np.float32)
    cov6 = gs_math.build_cov3d(jnp.asarray(s), jnp.asarray(q))
    got = np.asarray(gs_math.ewa_cov2d(jnp.asarray(means), cov6, cam.w2c,
                                       cam.fxfycxcy, cam.tanfov))
    w2c = np.asarray(cam.w2c)
    tanx, tany = np.asarray(cam.tanfov)
    for i in range(16):
        expect = _ewa_numpy(means[i], np.asarray(cov6)[i], w2c,
                            fxy[0], fxy[1], tanx, tany)
        np.testing.assert_allclose(got[i], expect, rtol=2e-3, atol=1e-4)


def test_conic_and_radius():
    cov = jnp.asarray([[2.0, 0.3, 1.5], [1.0, 0.0, 1.0]])
    conic, radius, valid = gs_math.conic_and_radius(cov)
    conic, radius = np.asarray(conic), np.asarray(radius)
    assert bool(np.all(np.asarray(valid)))
    for i, (a, b, c) in enumerate([(2.0, 0.3, 1.5), (1.0, 0.0, 1.0)]):
        det = a * c - b * b
        np.testing.assert_allclose(conic[i], [c / det, -b / det, a / det],
                                   rtol=1e-5)
        mid = 0.5 * (a + c)
        l1 = mid + np.sqrt(max(0.1, mid * mid - det))
        l2 = mid - np.sqrt(max(0.1, mid * mid - det))
        assert radius[i] == np.ceil(3 * np.sqrt(max(l1, l2)))


def test_conic_degenerate_flagged():
    cov = jnp.asarray([[1.0, 1.0, 1.0]])  # det == 0
    _, _, valid = gs_math.conic_and_radius(cov)
    assert not bool(valid[0])


def test_eval_sh_degree0(rng):
    sh = rng.normal(size=(10, 1, 3)).astype(np.float32)
    dirs = rng.normal(size=(10, 3)).astype(np.float32)
    got = np.asarray(gs_math.eval_sh(jnp.asarray(sh), 0, jnp.asarray(dirs)))
    expect = np.maximum(gs_math.SH_C0 * sh[:, 0] + 0.5, 0.0)
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_eval_sh_degree1_direction_dependence(rng):
    sh = rng.normal(size=(1, 4, 3)).astype(np.float32)
    d1 = np.asarray([[0.0, 0.0, 1.0]], np.float32)
    d2 = np.asarray([[0.0, 0.0, -1.0]], np.float32)
    c1 = np.asarray(gs_math.eval_sh(jnp.asarray(sh), 1, jnp.asarray(d1)))
    c2 = np.asarray(gs_math.eval_sh(jnp.asarray(sh), 1, jnp.asarray(d2)))
    base = gs_math.SH_C0 * sh[0, 0]
    np.testing.assert_allclose(
        c1[0], np.maximum(base + gs_math.SH_C1 * sh[0, 2] + 0.5, 0), atol=1e-5)
    np.testing.assert_allclose(
        c2[0], np.maximum(base - gs_math.SH_C1 * sh[0, 2] + 0.5, 0), atol=1e-5)


def test_rgb_sh_roundtrip(rng):
    rgb = rng.uniform(0.1, 0.9, size=(5, 3)).astype(np.float32)
    sh0 = gs_math.rgb_to_sh0(jnp.asarray(rgb))
    back = np.asarray(gs_math.sh0_to_rgb(sh0))
    np.testing.assert_allclose(back, rgb, rtol=1e-5)
