"""Shared synthetic dataset trees for CLI-integration tests.

Builds a miniature GObjaverse-convention directory (the layout
data/objaverse.py consumes: campos_512_v4 folders with RGBA pngs, per-view
json cameras, *_nd.exr normal+depth) so launch.py can train end-to-end
without real data.  Used by test_launch_cli.py-style subprocess tests and
the multi-host tests.
"""

import json

import numpy as np
from PIL import Image


def make_gobjaverse_tree(tmp_path, rng, n_views: int = 40, res: int = 32,
                         uids=("000/obj1",)):
    """Returns (root, image_dir): root holds train.json, image_dir the
    per-view folders."""
    from open_diffusiongs_tpu.utils.exr import write_exr

    root = tmp_path / "data"
    img_dir = tmp_path / "images"
    root.mkdir(exist_ok=True)
    (root / "train.json").write_text(json.dumps(list(uids)))
    h = w = res
    for uid in uids:
        for idx in range(n_views):
            d = img_dir / uid / "campos_512_v4" / f"{idx:05d}"
            d.mkdir(parents=True)
            prefix = d / f"{idx:05d}"
            rgba = (rng.uniform(0, 255, (h, w, 4))).astype(np.uint8)
            rgba[..., 3] = 255
            Image.fromarray(rgba, "RGBA").save(str(prefix) + ".png")
            ang = 2 * np.pi * idx / n_views
            origin = np.asarray([2.2 * np.cos(ang), 2.2 * np.sin(ang), 0.9])
            z = -origin / np.linalg.norm(origin)
            up = np.asarray([0.0, 0.0, 1.0])
            x = np.cross(z, up)
            x /= np.linalg.norm(x)
            y = np.cross(z, x)
            (d / f"{idx:05d}.json").write_text(json.dumps(
                {"x": x.tolist(), "y": y.tolist(), "z": z.tolist(),
                 "origin": origin.tolist()}))
            nd = np.zeros((h, w, 4), np.float32)
            nd[..., 3] = rng.uniform(1.8, 2.8, (h, w))
            write_exr(str(prefix) + "_nd.exr", nd, ["R", "G", "B", "A"])
    return root, img_dir
