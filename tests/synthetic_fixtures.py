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


def make_re10k_tree(tmp_path, rng, n_scenes: int = 2, n_frames: int = 6,
                    res=(24, 32)):
    """Miniature RE10K-convention tree (the layout data/re10k.py consumes:
    per-scene metadata json with frames + a full_list.txt).  Returns the
    full_list.txt path."""
    h, w = res
    meta_dir = tmp_path / "metadata"
    img_dir = tmp_path / "images"
    meta_dir.mkdir(exist_ok=True)
    paths = []
    for s in range(n_scenes):
        sd = img_dir / f"scene{s}"
        sd.mkdir(parents=True)
        frames = []
        for i in range(n_frames):
            arr = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
            p = sd / f"{i:05d}.png"
            Image.fromarray(arr).save(p)
            ang = 0.1 * i
            w2c = np.eye(4)
            w2c[:3, 3] = [0.1 * np.cos(ang), 0.05 * np.sin(ang), 0.2 * i]
            frames.append({"image_path": str(p),
                           "fxfycxcy": [30.0, 30.0, w / 2.0, h / 2.0],
                           "w2c": w2c.tolist()})
        mp = meta_dir / f"scene{s}.json"
        mp.write_text(json.dumps({"scene_name": f"scene{s}",
                                  "frames": frames}))
        paths.append(str(mp))
    full_list = tmp_path / "full_list.txt"
    full_list.write_text("\n".join(paths) + "\n")
    return full_list
