"""Tests for diffusion utils, visualizers, pose interpolation, video writer,
saving helpers."""

import os

import jax.numpy as jnp
import numpy as np
from scipy.stats import norm as scipy_norm

from open_diffusiongs_tpu.diffusion.diffusion_utils import (
    approx_standard_normal_cdf, discretized_gaussian_log_likelihood,
    normal_kl)
from open_diffusiongs_tpu.utils.pose_interp import (
    get_interpolated_poses_many, quat_to_rotmat, quaternion_slerp,
    rotmat_to_quat)
from open_diffusiongs_tpu.utils.video import write_mjpeg_avi
from open_diffusiongs_tpu.utils.visualizers import colormap, depth_to_rgb


def test_normal_kl_zero_for_same():
    m = jnp.asarray([0.3, -1.0])
    lv = jnp.asarray([0.1, -0.5])
    np.testing.assert_allclose(np.asarray(normal_kl(m, lv, m, lv)), 0.0,
                               atol=1e-7)


def test_normal_kl_standard_formula(rng):
    m1, lv1 = 0.5, 0.2
    got = float(normal_kl(jnp.asarray(m1), jnp.asarray(lv1),
                          jnp.asarray(0.0), jnp.asarray(0.0)))
    expect = 0.5 * (-1 - lv1 + np.exp(lv1) + m1 ** 2)
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_approx_cdf():
    x = jnp.linspace(-3, 3, 13)
    got = np.asarray(approx_standard_normal_cdf(x))
    expect = scipy_norm.cdf(np.asarray(x))
    np.testing.assert_allclose(got, expect, atol=5e-3)


def test_discretized_ll_peaks_at_mean():
    x = jnp.asarray([0.0])
    hi = discretized_gaussian_log_likelihood(
        x, means=jnp.asarray([0.0]), log_scales=jnp.asarray([-3.0]))
    lo = discretized_gaussian_log_likelihood(
        x, means=jnp.asarray([0.5]), log_scales=jnp.asarray([-3.0]))
    assert float(hi[0]) > float(lo[0])


def test_quat_roundtrip(rng):
    for _ in range(10):
        q = rng.normal(size=4)
        q = q / np.linalg.norm(q)
        R = quat_to_rotmat(q)
        q2 = rotmat_to_quat(R)
        # q and -q are the same rotation
        assert min(np.abs(q - q2).max(), np.abs(q + q2).max()) < 1e-6


def test_slerp_endpoints(rng):
    q0 = rng.normal(size=4); q0 /= np.linalg.norm(q0)
    q1 = rng.normal(size=4); q1 /= np.linalg.norm(q1)
    np.testing.assert_allclose(quaternion_slerp(q0, q1, 0.0), q0, atol=1e-6)
    e = quaternion_slerp(q0, q1, 1.0)
    assert min(np.abs(e - q1).max(), np.abs(e + q1).max()) < 1e-6


def test_interpolated_path_valid(rng):
    poses = []
    for ang in (0.0, 0.5, 1.0):
        c2w = np.eye(4)
        c2w[:3, 3] = [np.cos(ang), np.sin(ang), 0.0]
        poses.append(c2w)
    path = get_interpolated_poses_many(np.stack(poses), 5)
    assert path.shape == (11, 4, 4)
    R = path[:, :3, :3]
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1),
                               np.broadcast_to(np.eye(3), R.shape), atol=1e-5)


def test_mjpeg_avi(tmp_path, rng):
    frames = [(rng.uniform(0, 255, (32, 48, 3))).astype(np.uint8)
              for _ in range(5)]
    path = str(tmp_path / "v.avi")
    write_mjpeg_avi(path, frames, fps=10)
    data = open(path, "rb").read()
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    assert b"movi" in data and b"MJPG" in data
    assert len(data) > 2000


def test_colormap(rng):
    v = rng.uniform(size=(8, 8))
    c = colormap(v)
    assert c.shape == (8, 8, 3)
    assert c.min() >= 0 and c.max() <= 1
    d = depth_to_rgb(v)
    assert d.dtype == np.uint8


def test_save_obj_with_material(tmp_path):
    """Textured OBJ/MTL export (SaverMixin.save_obj, saving.py:533-713)."""
    import numpy as np
    from open_diffusiongs_tpu.utils.saving import save_obj
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    uv = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    nrm = np.array([[0, 0, 1]] * 3, np.float32)
    rgb = np.array([[1, 0, 0]] * 3, np.float32)
    tex = np.full((8, 8, 3), 0.5, np.float32)
    paths = save_obj(str(tmp_path / "mesh"), v, f, v_nrm=nrm, v_tex=uv,
                     v_rgb=rgb, save_mat=True, map_Kd=tex)
    names = {os.path.basename(p) for p in paths}
    assert names == {"mesh.obj", "mesh.mtl", "texture_kd.png"}
    obj = open(tmp_path / "mesh.obj").read()
    assert "mtllib mesh.mtl" in obj and "usemtl default" in obj
    assert obj.count("vt ") == 3 and obj.count("vn ") == 3
    assert "v 0.0 0.0 0.0 1.0 0.0 0.0" in obj      # vertex color appended
    assert "f 1/1/1 2/2/2 3/3/3" in obj
    mtl = open(tmp_path / "mesh.mtl").read()
    assert "map_Kd texture_kd.png" in mtl and "newmtl default" in mtl


def test_save_obj_plain(tmp_path):
    import numpy as np
    from open_diffusiongs_tpu.utils.saving import save_obj
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    (paths,) = (save_obj(str(tmp_path / "m.obj"), v, f),)
    obj = open(paths[-1]).read()
    assert "f 1// 2// 3//" in obj and "mtllib" not in obj


def test_breadth_savers(tmp_path):
    """Grayscale-colormap, npz, image-sequence video, xyz-points PLY
    (SaverMixin breadth, reference saving.py:244-531)."""
    import numpy as np
    from open_diffusiongs_tpu.utils import saving as S
    depth = np.linspace(0, 1, 64).reshape(8, 8)
    p1 = S.save_grayscale_image(str(tmp_path / "d.png"), depth,
                                data_range=(0, 1), cmap="turbo")
    p2 = S.save_grayscale_image(str(tmp_path / "g.png"), depth, cmap=None)
    assert os.path.exists(p1) and os.path.exists(p2)

    p3 = S.save_data(str(tmp_path / "pkg"), {"a": np.ones(3)})
    assert np.load(p3)["a"].sum() == 3

    seq = tmp_path / "frames"
    seq.mkdir()
    for i in range(3):
        S.save_image(str(seq / f"{i:03d}.png"),
                     np.full((16, 16, 3), i / 3.0, np.float32))
    p4 = S.save_img_sequence(str(tmp_path / "seq.avi"), str(seq))
    assert os.path.getsize(p4) > 100

    pts = np.random.default_rng(0).normal(size=(10, 3)).astype(np.float32)
    p5 = S.save_xyz_points(str(tmp_path / "pts.ply"), pts, normals=pts)
    head = open(p5).read()
    assert "element vertex 10" in head and "property float nz" in head


def test_auto_orient_and_center_poses():
    """After 'up' orientation the mean camera up-axis must be +z and the
    mean origin must be at the world origin (cam_utils.py:515-624)."""
    from open_diffusiongs_tpu.utils.pose_interp import (
        auto_orient_and_center_poses, rotation_matrix_between)
    rng = np.random.default_rng(0)
    # cameras on a tilted ring looking inward with a consistent tilted up
    tilt = rotation_matrix_between(np.array([0.0, 0.0, 1.0]),
                                   np.array([0.3, 0.2, 0.93]))
    poses = []
    for a in np.linspace(0, 2 * np.pi, 8, endpoint=False):
        eye = tilt @ (2.0 * np.array([np.cos(a), np.sin(a), 0.4]))
        fwd = -eye / np.linalg.norm(eye)
        up0 = tilt @ np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up0); right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2] = right, up, -fwd
        c2w[:3, 3] = eye + rng.normal(0, 0.01, 3)
        poses.append(c2w)
    poses = np.stack(poses)
    for method in ("up", "vertical", "pca"):
        oriented, transform = auto_orient_and_center_poses(poses, method)
        assert oriented.shape == (8, 3, 4) and transform.shape == (3, 4)
        np.testing.assert_allclose(oriented[:, :3, 3].mean(0), 0.0,
                                   atol=0.05)
        if method in ("up", "vertical"):
            mean_up = oriented[:, :3, 1].mean(0)
            mean_up /= np.linalg.norm(mean_up)
            assert mean_up[2] > 0.99
    # focus centering puts the look-at target at the origin
    oriented, _ = auto_orient_and_center_poses(poses, "up", "focus")
    origins = oriented[:, :3, 3]
    look = -oriented[:, :3, 2]
    # rays from each camera should pass near the origin
    t = -np.sum(origins * look, -1) / np.sum(look * look, -1)
    closest = origins + t[:, None] * look
    assert np.linalg.norm(closest, axis=-1).max() < 0.1


def test_html_and_viewer_outputs(tmp_path):
    from open_diffusiongs_tpu.utils.visualizers import (
        save_html, save_viewer_html, to_image_embed_tag, to_single_row_table)
    img = np.zeros((8, 8, 3), np.uint8)
    tag = to_image_embed_tag(img)
    assert tag.startswith('<img src="data:image/png;base64,')
    page = save_html(str(tmp_path / "t.html"),
                     to_single_row_table("cap", tag))
    html = open(page).read()
    assert "cap" in html and "base64" in html

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], float)
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    p = save_viewer_html(str(tmp_path / "mesh.html"), verts, faces)
    html = open(p).read()
    assert "webgl" in html and "TRIANGLES" in html and "<canvas" in html
    p2 = save_viewer_html(str(tmp_path / "pts.html"), verts)
    assert "points" in open(p2).read()
