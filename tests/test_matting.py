"""GrabCut matting (utils/matting.py + native/matting.cpp).

The rembg replacement (pipline_obj.py:256-261): a native grid min-cut
driven by GMM color models.  Tests pin (1) the max-flow solver against a
brute-force min-cut enumeration, (2) submodular energy minimization on a
known configuration, and (3) end-to-end segmentation of a synthetic
object on a TEXTURED background — the case the old border-color heuristic
cannot handle.
"""

import itertools

import numpy as np
import pytest

from open_diffusiongs_tpu.utils import matting

pytestmark = pytest.mark.skipif(
    not matting.available(), reason="native/libmatting.so not built")


def _energy(labels, cap_src, cap_snk, cap_right, cap_down):
    """Cut cost of a labeling (1 = source/fg side)."""
    e = np.where(labels, cap_snk, cap_src).sum()          # cut t-links
    lr = labels[:, :-1] != labels[:, 1:]
    ld = labels[:-1] != labels[1:]
    return e + (cap_right * lr).sum() + (cap_down * ld).sum()


def test_mincut_matches_bruteforce(rng):
    h, w = 3, 4
    for trial in range(8):
        cs = rng.uniform(0, 3, (h, w)).astype(np.float32)
        ct = rng.uniform(0, 3, (h, w)).astype(np.float32)
        cr = rng.uniform(0, 1.5, (h, w - 1)).astype(np.float32)
        cd = rng.uniform(0, 1.5, (h - 1, w)).astype(np.float32)
        got = matting.grid_mincut(cs, ct, cr, cd)
        e_got = _energy(got, cs, ct, cr, cd)
        best = np.inf
        for bits in itertools.product([0, 1], repeat=h * w):
            lab = np.asarray(bits, bool).reshape(h, w)
            best = min(best, _energy(lab, cs, ct, cr, cd))
        np.testing.assert_allclose(e_got, best, rtol=1e-5,
                                   err_msg=f"trial {trial}")


def test_mincut_terminal_dominance():
    """Huge terminal capacities pin labels regardless of smoothness."""
    h = w = 8
    cs = np.zeros((h, w), np.float32)
    ct = np.zeros((h, w), np.float32)
    cs[2:6, 2:6] = 1e6          # strongly foreground center
    ct[0, :] = ct[-1, :] = ct[:, 0] = ct[:, -1] = 1e6   # bg border
    cr = np.full((h, w - 1), 0.1, np.float32)
    cd = np.full((h - 1, w), 0.1, np.float32)
    fg = matting.grid_mincut(cs, ct, cr, cd)
    assert fg[2:6, 2:6].all()
    assert not fg[0].any() and not fg[-1].any()
    assert not fg[:, 0].any() and not fg[:, -1].any()


def _synthetic_scene(rng, size=96):
    """Colored object on a textured (non-uniform) background + noise."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    # background: diagonal blue-green gradient + texture noise
    bg = np.stack([40 + 30 * xx, 90 + 60 * yy, 150 + 40 * xx], axis=-1)
    bg += rng.normal(0, 12, bg.shape)
    # object: red-orange ellipse off center
    cy, cx, ry, rx = 0.52, 0.47, 0.27, 0.2
    mask = (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2) < 1.0
    obj = np.stack([210 + 25 * yy, 90 + 40 * xx, 40 + 10 * yy], axis=-1)
    obj += rng.normal(0, 10, obj.shape)
    img = np.where(mask[..., None], obj, bg)
    return np.clip(img, 0, 255).astype(np.uint8), mask


def test_grabcut_textured_background(rng):
    img, gt = _synthetic_scene(rng)
    alpha = matting.grabcut_alpha(img, max_side=96)
    pred = alpha > 0.5
    inter = (pred & gt).sum()
    union = (pred | gt).sum()
    iou = inter / union
    assert iou > 0.9, iou

    # the old border-color heuristic fails here (textured background):
    from open_diffusiongs_tpu.pipeline import remove_background  # noqa: F401
    border = np.concatenate([img[0], img[-1], img[:, 0], img[:, -1]], axis=0)
    bgc = np.median(border.reshape(-1, 3), axis=0)
    dist = np.linalg.norm(img.astype(np.float32) - bgc[None, None], axis=-1)
    naive = np.clip((dist - 20.0) / 40.0, 0.0, 1.0) > 0.5
    naive_iou = (naive & gt).sum() / (naive | gt).sum()
    assert iou > naive_iou + 0.05


def test_grabcut_via_pipeline_preprocess(rng):
    """preprocess_image picks the GrabCut path for RGB inputs and returns a
    recentred white-padded square with the object present."""
    from PIL import Image

    from open_diffusiongs_tpu.pipeline import preprocess_image
    img, _ = _synthetic_scene(rng)
    out = preprocess_image(Image.fromarray(img), size=64, matting="grabcut")
    assert out.shape == (3, 64, 64)
    # corners are white padding; the center row contains the object
    assert out[:, 0, 0].min() > 0.95
    assert out[:, 32, 32].std() >= 0.0  # present, finite
    assert np.isfinite(out).all()


def test_u2net_path_preferred_when_npz_present(rng, tmp_path, monkeypatch):
    """remove_background picks the learned U²-Net when a converted NPZ
    exists ($U2NET_NPZ), matching the reference's rembg-first behavior."""
    from open_diffusiongs_tpu import pipeline
    from open_diffusiongs_tpu.utils import u2net

    params = u2net.synth_params(u2net.U2NETP, seed=11)
    path = str(tmp_path / "u2netp.npz")
    np.savez(path, **params)
    monkeypatch.setenv("U2NET_NPZ", path)
    monkeypatch.setenv("U2NET_SPEC", "u2netp")
    pipeline._U2NET_CACHE.clear()
    try:
        img, _ = _synthetic_scene(rng)
        alpha = pipeline.remove_background(img)
        assert alpha.shape == img.shape[:2]
        # the learned path min-max rescales: full [0, 1] range is hit
        assert float(alpha.min()) == 0.0 and float(alpha.max()) == 1.0
    finally:
        pipeline._U2NET_CACHE.clear()
