"""Unit tests for ops.camera and ops.rays against independent NumPy math."""

import numpy as np
import jax.numpy as jnp

from open_diffusiongs_tpu.ops import camera as cam_lib
from open_diffusiongs_tpu.ops import rays as rays_lib
from utils3d import look_at, orbit_cameras


def test_projection_matrix_entries():
    fx, fy, cx, cy = 300.0, 310.0, 128.0, 120.0
    h, w = 240, 256
    P = np.asarray(cam_lib.projection_matrix(jnp.asarray([fx, fy, cx, cy]), h, w))
    zn, zf = cam_lib.ZNEAR, cam_lib.ZFAR
    expected = np.zeros((4, 4), np.float32)
    expected[0, 0] = 2 * fx / w
    expected[1, 1] = 2 * fy / h
    expected[0, 2] = 2 * (cx / w) - 1
    expected[1, 2] = 2 * (cy / h) - 1
    expected[2, 2] = -(zf + zn) / (zf - zn)
    expected[3, 2] = 1.0
    expected[2, 3] = -(2 * zf * zn) / (zf - zn)
    np.testing.assert_allclose(P, expected, rtol=1e-6)


def test_make_camera_consistency():
    c2ws, fxy = orbit_cameras(3, h=64, w=64)
    cams = cam_lib.make_camera(jnp.asarray(c2ws), jnp.asarray(fxy), 64, 64)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(cams.w2c[i]) @ c2ws[i],
                                   np.eye(4), atol=1e-5)
        np.testing.assert_allclose(np.asarray(cams.cam_pos[i]), c2ws[i][:3, 3],
                                   atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(cams.full_proj[i]),
            np.asarray(cams.proj[i]) @ np.asarray(cams.w2c[i]), atol=1e-5)


def test_center_projection():
    # A point straight ahead of the camera must project to (cx, cy) pixel space.
    c2w = look_at((0.0, 0.0, -3.0))
    fxy = np.asarray([100.0, 100.0, 32.0, 32.0], np.float32)
    cam = cam_lib.make_camera(jnp.asarray(c2w), jnp.asarray(fxy), 64, 64)
    p = jnp.asarray([[0.0, 0.0, 0.0, 1.0]]).T
    hom = np.asarray(cam.full_proj) @ np.asarray(p)
    ndc = hom[:2, 0] / hom[3, 0]
    pix = np.asarray(cam_lib.ndc2pix(jnp.asarray(ndc), 64))
    # ndc (0,0) -> pixel 31.5; cx=32 means ndc 0 maps exactly to (2cx/w-1)=0
    np.testing.assert_allclose(pix, [31.5, 31.5], atol=1e-4)


def test_ndc2pix_endpoints():
    assert float(cam_lib.ndc2pix(jnp.asarray(-1.0), 64)) == -0.5
    assert float(cam_lib.ndc2pix(jnp.asarray(1.0), 64)) == 63.5


def test_pixel_rays_match_manual():
    c2ws, fxy = orbit_cameras(2, h=16, w=24)
    ray_o, ray_d = rays_lib.pixel_rays(jnp.asarray(c2ws), jnp.asarray(fxy), 16, 24)
    ray_o, ray_d = np.asarray(ray_o), np.asarray(ray_d)
    assert ray_o.shape == (2, 16, 24, 3) and ray_d.shape == (2, 16, 24, 3)
    np.testing.assert_allclose(np.linalg.norm(ray_d, axis=-1), 1.0, atol=1e-5)
    for v in range(2):
        fx, fy, cx, cy = fxy[v]
        for (i, j) in [(0, 0), (7, 13), (15, 23)]:
            d_cam = np.asarray([(j + 0.5 - cx) / fx, (i + 0.5 - cy) / fy, 1.0])
            d_w = c2ws[v][:3, :3] @ d_cam
            d_w = d_w / np.linalg.norm(d_w)
            np.testing.assert_allclose(ray_d[v, i, j], d_w, atol=1e-5)
            np.testing.assert_allclose(ray_o[v, i, j], c2ws[v][:3, 3], atol=1e-6)


def test_rays_chw_layout():
    c2ws, fxy = orbit_cameras(2, h=8, w=8)
    o1, d1 = rays_lib.pixel_rays(jnp.asarray(c2ws), jnp.asarray(fxy), 8, 8)
    o2, d2 = rays_lib.rays_chw(jnp.asarray(c2ws), jnp.asarray(fxy), 8, 8)
    np.testing.assert_allclose(np.moveaxis(np.asarray(d2), 1, -1), d1, atol=1e-6)
    np.testing.assert_allclose(np.moveaxis(np.asarray(o2), 1, -1), o1, atol=1e-6)


def test_fisheye624_roundtrip():
    """X = unproject(project(X)) for z>0 (cam_utils.py:733-737 contract)."""
    import jax.numpy as jnp

    from open_diffusiongs_tpu.utils.fisheye import (fisheye624_project,
                                                    fisheye624_unproject)
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(2, 64, 3))
    xyz[..., 2] = np.abs(xyz[..., 2]) + 0.5          # z > 0
    # mild distortion (k/p/s small, realistic fisheye coefficients)
    params = np.zeros((2, 16))
    params[:, 0:2] = [350.0, 352.0]                  # fu, fv
    params[:, 2:4] = [320.0, 240.0]                  # cu, cv
    params[:, 4:10] = [[0.05, -0.01, 0.002, 0.0, 0.0, 0.0]] * 2
    params[:, 10:12] = [[1e-3, -5e-4]] * 2           # p0 p1
    params[:, 12:16] = [[2e-4, -1e-4, 5e-5, 1e-4]] * 2
    uv = fisheye624_project(jnp.asarray(xyz), jnp.asarray(params))
    rays = fisheye624_unproject(uv, jnp.asarray(params))
    dirs = np.asarray(rays)
    expect = xyz / xyz[..., 2:3]
    np.testing.assert_allclose(dirs, expect, atol=1e-5)

    # fu == fv 15-parameter variant
    p15 = np.concatenate([params[:, :1], params[:, 2:]], axis=1)
    uv15 = fisheye624_project(jnp.asarray(xyz), jnp.asarray(p15))
    rays15 = fisheye624_unproject(uv15, jnp.asarray(p15))
    np.testing.assert_allclose(np.asarray(rays15), expect, atol=1e-5)
