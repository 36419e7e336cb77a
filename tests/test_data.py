"""Data layer tests: EXR I/O, orbit cameras, Objaverse pipeline on a
synthetic GObjaverse fixture, prefetch loader."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from open_diffusiongs_tpu.data.cameras import (look_at, orbit_camera,
                                               undo_orbit_camera)
from open_diffusiongs_tpu.data.loader import PrefetchLoader, collate
from open_diffusiongs_tpu.data.objaverse import (ObjaverseConfig,
                                                 ObjaverseDataset,
                                                 pick_even_view_indices)
from open_diffusiongs_tpu.utils.exr import (read_depth_from_nd_exr, read_exr,
                                            write_exr)


def test_exr_roundtrip_half(tmp_path, rng):
    img = rng.uniform(0, 10, (8, 12, 4)).astype(np.float32)
    path = str(tmp_path / "t.exr")
    write_exr(path, img, ["R", "G", "B", "A"], half=True)
    out, names = read_exr(path)
    assert names == ["A", "B", "G", "R"]
    np.testing.assert_allclose(out[..., names.index("R")], img[..., 0],
                               rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(out[..., names.index("A")], img[..., 3],
                               rtol=1e-2, atol=1e-2)


def test_exr_roundtrip_float32(tmp_path, rng):
    img = rng.normal(size=(5, 7, 1)).astype(np.float32)
    path = str(tmp_path / "t32.exr")
    write_exr(path, img, ["A"], half=False)
    out, names = read_exr(path)
    np.testing.assert_allclose(out[..., 0], img[..., 0], rtol=1e-6)


def test_exr_depth_channel(tmp_path, rng):
    img = rng.uniform(0, 5, (6, 6, 4)).astype(np.float32)
    path = str(tmp_path / "nd.exr")
    write_exr(path, img, ["R", "G", "B", "A"], half=False)
    depth = read_depth_from_nd_exr(path)
    np.testing.assert_allclose(depth[..., 0], img[..., 3], rtol=1e-6)


@pytest.mark.parametrize("comp,half", [("zip", True), ("zip", False),
                                       ("zips", True)])
def test_exr_roundtrip_zip(tmp_path, rng, comp, half):
    """ZIP/ZIPS compression — the real GObjaverse encoding: deinterleave +
    delta-predictor decode, odd height (last 16-line block short)."""
    img = rng.uniform(0, 10, (37, 12, 4)).astype(np.float32)
    path = str(tmp_path / "z.exr")
    write_exr(path, img, ["R", "G", "B", "A"], half=half,
              compression=comp)
    out, names = read_exr(path)
    assert names == ["A", "B", "G", "R"]
    tol = dict(rtol=1e-2, atol=1e-2) if half else dict(rtol=1e-6)
    np.testing.assert_allclose(out[..., names.index("R")], img[..., 0], **tol)
    np.testing.assert_allclose(out[..., names.index("A")], img[..., 3], **tol)


def test_exr_zip_incompressible_block(tmp_path, rng):
    """A block whose zlib encoding is not smaller is stored raw (EXR spec);
    the reader must take the dsize == raw_size branch."""
    img = np.frombuffer(rng.bytes(16 * 8 * 1 * 4), np.uint32).astype(
        np.float32).reshape(16, 8, 1)   # white-noise mantissas
    path = str(tmp_path / "inc.exr")
    write_exr(path, img, ["A"], half=False, compression="zip")
    out, _ = read_exr(path)
    np.testing.assert_allclose(out[..., 0], img[..., 0], rtol=1e-6)


def test_exr_predictor_vectorized_semantics(rng):
    """The cumsum delta decode must equal the per-byte reference loop."""
    from open_diffusiongs_tpu.utils.exr import (_predictor_apply,
                                               _predictor_undo)
    data = bytes(rng.integers(0, 256, 4097, dtype=np.uint8))
    ref = bytearray(data)
    for i in range(1, len(ref)):
        ref[i] = (ref[i] + ref[i - 1] - 128) & 0xFF
    assert _predictor_undo(data) == bytes(ref)
    assert _predictor_undo(_predictor_apply(data)) == data


def test_orbit_roundtrip():
    for ele, azi, r in [(10.0, 30.0, 2.0), (-45.0, 200.0, 3.5), (0.0, 0.0, 1.0)]:
        T = orbit_camera(ele, azi, r)
        e2, a2, r2 = undo_orbit_camera(T)
        np.testing.assert_allclose([e2, a2 % 360, r2], [ele, azi, r],
                                   atol=1e-6)
        # rotation is orthonormal, camera looks at origin (OpenGL: -z forward)
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        fwd = -R[:, 2]
        np.testing.assert_allclose(fwd, -T[:3, 3] / r, atol=1e-12)


def test_pick_even_views():
    import random
    rng = random.Random(0)
    for _ in range(50):
        idxs = pick_even_view_indices(4, rng)
        assert len(idxs) == 4
        if max(idxs) < 24:
            diffs = {(idxs[(i + 1) % 4] - idxs[i]) % 24 for i in range(3)}
            assert diffs == {6}
        else:
            assert all(27 <= i <= 38 for i in idxs)


@pytest.fixture
def gobjaverse_fixture(tmp_path, rng):
    """Synthetic 40-view GObjaverse tree with 2 uids."""
    from open_diffusiongs_tpu.utils.exr import write_exr
    root = tmp_path / "data"
    img_dir = tmp_path / "images"
    root.mkdir()
    uids = ["000/obj1", "000/obj2"]
    (root / "train.json").write_text(json.dumps(uids))
    h = w = 32
    for uid in uids:
        for idx in range(40):
            d = img_dir / uid / "campos_512_v4" / f"{idx:05d}"
            d.mkdir(parents=True)
            prefix = d / f"{idx:05d}"
            rgba = (rng.uniform(0, 255, (h, w, 4))).astype(np.uint8)
            rgba[..., 3] = 255 * (rng.uniform(size=(h, w)) > 0.3)
            Image.fromarray(rgba, "RGBA").save(str(prefix) + ".png")
            # camera on an orbit (Blender-world/OpenCV-cam convention is
            # what the json holds; build something consistent: a camera at
            # radius 2.2 looking at origin)
            ang = 2 * np.pi * idx / 40
            origin = np.asarray([2.2 * np.cos(ang), 2.2 * np.sin(ang), 0.9])
            z = -origin / np.linalg.norm(origin)
            up = np.asarray([0.0, 0.0, 1.0])
            x = np.cross(z, up)
            x = x / np.linalg.norm(x)
            y = np.cross(z, x)
            (prefix.parent / f"{idx:05d}.json").write_text(json.dumps(
                {"x": x.tolist(), "y": y.tolist(), "z": z.tolist(),
                 "origin": origin.tolist()}))
            nd = np.zeros((h, w, 4), np.float32)
            nd[..., 3] = rng.uniform(1.5, 3.0, (h, w))
            write_exr(str(prefix) + "_nd.exr", nd, ["R", "G", "B", "A"])
    return root, img_dir


def test_objaverse_dataset(gobjaverse_fixture):
    root, img_dir = gobjaverse_fixture
    cfg = ObjaverseConfig(local_dir=str(root), image_dir=str(img_dir) + os.sep,
                          gen_idxs=[30, 33, 36, 39], sel_views=6, gen_views=4,
                          training_res=[16, 16], norm_camera=True,
                          norm_radius=3.0, gen_rel_idxs=True)
    ds = ObjaverseDataset(cfg, "train")
    assert len(ds) == 2
    s = ds[0]
    assert s["rgbs"].shape == (10, 3, 16, 16)
    assert s["rgbs_input"].shape == (4, 3, 16, 16)
    assert s["depths_input"].shape == (4, 1, 16, 16)
    assert s["c2ws"].shape == (10, 4, 4)
    assert s["fxfycxcys"].shape == (10, 4)
    # camera norm: last view at radius 3.0
    np.testing.assert_allclose(np.linalg.norm(s["c2ws"][-1, :3, 3]), 3.0,
                               rtol=1e-5)
    # intrinsics in pixel units
    np.testing.assert_allclose(s["fxfycxcys"][0, 2:], [8.0, 8.0])
    # rgb in [0, 1]
    assert 0.0 <= s["rgbs"].min() and s["rgbs"].max() <= 1.0
    # c2w valid rigid transforms
    R = s["c2ws"][:, :3, :3]
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1),
                               np.broadcast_to(np.eye(3), R.shape), atol=1e-4)


def test_objaverse_relative_pose_anchoring(gobjaverse_fixture):
    # with gen_rel_idxs, the first view's azimuth is re-anchored to 0:
    # its camera sits in the y=0 plane of the z-up frame... verify the
    # first input camera's position is deterministic under the convention
    # chain: azimuth 0 => OpenGL campos [0, -r sin(e), r cos(e)] -> z-up.
    root, img_dir = gobjaverse_fixture
    cfg = ObjaverseConfig(local_dir=str(root), image_dir=str(img_dir) + os.sep,
                          gen_idxs=None, sel_views=6, gen_views=4,
                          training_res=[16, 16], gen_rel_idxs=True,
                          norm_camera=False)
    ds = ObjaverseDataset(cfg, "train")
    s = ds[0]
    pos = s["c2ws_input"][0, :3, 3]
    # azimuth 0 -> x == 0 in OpenGL frame; rt_matrix swaps y/z, so x still 0
    np.testing.assert_allclose(pos[0], 0.0, atol=1e-5)


def test_error_retry(gobjaverse_fixture):
    root, img_dir = gobjaverse_fixture
    cfg = ObjaverseConfig(local_dir=str(root), image_dir=str(img_dir) + os.sep,
                          gen_idxs=[30, 33, 36, 39], sel_views=6, gen_views=4,
                          training_res=[16, 16])
    ds = ObjaverseDataset(cfg, "train")
    # corrupt uid 1's entries by pointing at a missing dir
    ds.uids[1] = "missing/uid"
    s = ds[1]  # retries onto a valid sample
    assert s["rgbs"].shape[0] == 10


def test_prefetch_loader(gobjaverse_fixture):
    root, img_dir = gobjaverse_fixture
    cfg = ObjaverseConfig(local_dir=str(root), image_dir=str(img_dir) + os.sep,
                          gen_idxs=[30, 33, 36, 39], sel_views=6, gen_views=4,
                          training_res=[16, 16])
    ds = ObjaverseDataset(cfg, "train")
    loader = PrefetchLoader(ds, batch_size=2, shuffle=True, num_threads=2)
    it = iter(loader)
    for _ in range(3):
        batch = next(it)
        assert batch["rgbs"].shape == (2, 10, 3, 16, 16)
        assert isinstance(batch["uid"], list) and len(batch["uid"]) == 2


def test_prefetch_loader_epoch(gobjaverse_fixture):
    root, img_dir = gobjaverse_fixture
    cfg = ObjaverseConfig(local_dir=str(root), image_dir=str(img_dir) + os.sep,
                          gen_idxs=[30, 33, 36, 39], training_res=[16, 16],
                          sel_views=6, gen_views=4)
    ds = ObjaverseDataset(cfg, "train")
    batches = list(PrefetchLoader(ds, batch_size=1, shuffle=False,
                                  num_threads=1))
    assert len(batches) == 2
