"""Generate a multi-view-consistent synthetic GObjaverse-convention dataset.

The reference's training QA is "watch the loss on 8 GPUs" over GObjaverse
(scripts/train_obj_stage1.sh); this image has no egress to fetch that data,
so the at-scale convergence run (docs/TRAINING_RUN.md) trains on scenes this
tool renders with the framework's own rasterizer: a ground-truth 3DGS blob
per object, viewed from the real GObjaverse camera layout (24-view azimuth
ring + upper ring, matching data/objaverse.py's even-view index sets), with
exact per-pixel ray-distance depth for the xyz loss.

Consistency argument: the loader re-anchors azimuth to the first sampled
view (orbit_camera/undo_orbit_camera, data/base.py:190-201) — a rigid
world-z rotation of all cameras.  Rotating every camera of a look-at-origin
orbit rig is equivalent to rotating the scene, so per-view images/depths
stay consistent with ONE (rotated) scene for any anchor; the model's
pixel-aligned parameterization is frame-relative, so training is unaffected.

Usage:
  python tools/make_synthetic_objaverse.py --out outputs/synth_obja \
      [--objects 8] [--res 256] [--gaussians 4096]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DIS = 2.4          # orbit radius; the loader rescales to norm_radius
FXFY = 1422.222 / 1024.0


def view_layout():
    """(ele, azi) per GObjaverse view index 0..39: 24-view low ring,
    indices 24-26 auxiliary, 27-38 upper ring, 39 top-down-ish — only the
    even-view sets (0..23, 27..38) are sampled by training."""
    views = {}
    for i in range(24):
        views[i] = (5.0, 15.0 * i)
    for j, i in enumerate(range(24, 27)):
        views[i] = (-45.0, 120.0 * j)
    for j, i in enumerate(range(27, 39)):
        views[i] = (25.0, 30.0 * j)
    views[39] = (85.0, 0.0)
    return views


def make_scene(rng: np.random.Generator, n: int):
    """GT Gaussian blob in the final (z-up) training world frame."""
    from open_diffusiongs_tpu.ops.gaussians import Gaussians

    # cluster of soft ellipsoids: a few lobes so views differ meaningfully
    centers = rng.normal(0, 0.35, (6, 3))
    which = rng.integers(0, len(centers), n)
    xyz = centers[which] + rng.normal(0, 0.22, (n, 3))
    xyz = np.clip(xyz, -0.85, 0.85)
    # raw (pre-activation) params: scaling is log-space, opacity is logit
    scaling = np.log(rng.uniform(0.02, 0.06, (n, 3)))
    rotation = rng.normal(0, 1, (n, 4))
    opacity = rng.uniform(1.0, 3.0, (n, 1))              # sigmoid -> .73-.95
    base = rng.uniform(0.1, 0.9, (len(centers), 3))
    rgb = np.clip(base[which] + rng.normal(0, 0.08, (n, 3)), 0.02, 0.98)
    sh0 = (rgb - 0.5) / 0.28209479177387814               # RGB2SH, degree 0
    return Gaussians(
        xyz=xyz.astype(np.float32)[None],
        features=sh0.astype(np.float32)[None, :, None, :],
        scaling=scaling.astype(np.float32)[None],
        rotation=rotation.astype(np.float32)[None],
        opacity=opacity.astype(np.float32)[None])


def render_object(gauss, res: int):
    """Render all 40 views; returns (rgb [40,h,w,3], alpha, ray_depth)."""
    import jax.numpy as jnp

    from open_diffusiongs_tpu.data.cameras import orbit_camera
    from open_diffusiongs_tpu.data.objaverse import RT_MATRIX
    from open_diffusiongs_tpu.ops.rasterize import RasterizeConfig, render
    from open_diffusiongs_tpu.ops.rays import pixel_rays

    c2ws = []
    for i in range(40):
        ele, azi = view_layout()[i]
        c2w = orbit_camera(ele, azi, DIS)                 # OpenGL
        c2w[:3, 1:3] *= -1                                # -> OpenCV
        c2ws.append(RT_MATRIX @ c2w)                      # -> z-up frame
    c2w = np.stack(c2ws).astype(np.float32)[None]         # [1, 40, 4, 4]
    f = FXFY * res
    fxy = np.tile(np.asarray([f, f, res / 2.0, res / 2.0], np.float32),
                  (1, 40, 1))

    out = render(gauss, jnp.asarray(c2w), jnp.asarray(fxy), res, res,
                 bg_color=(0.0, 0.0, 0.0),
                 cfg=RasterizeConfig(max_per_tile=512), channels_first=False)
    color = np.asarray(out["render"][0])                  # [40, h, w, 3]
    alpha = np.asarray(out["alpha"][0, :, 0])             # [40, h, w]
    zacc = np.asarray(out["depth"][0, :, 0])
    # un-premultiply: rasterizer color/depth are alpha-weighted sums
    a = np.maximum(alpha, 1e-6)
    rgb = np.clip(color / a[..., None], 0.0, 1.0)
    zview = zacc / a
    # view-z -> Euclidean ray distance (gt_xyz = ray_o + ray_d * depth with
    # unit ray_d, systems/object_system.py:146)
    ro, rd = pixel_rays(jnp.asarray(c2w[0]), jnp.asarray(fxy[0]), res, res)
    fwd = c2w[0, :, :3, 2]                                # OpenCV cam +z
    cos = np.einsum("vhwc,vc->vhw", np.asarray(rd), fwd)
    # threshold BELOW any mask consumer's 0.5 cut: boundary pixels whose
    # png-quantized alpha rounds above 0.5 must still carry real depth,
    # or the xyz loss sees GT points at the camera origin
    depth = np.where(alpha > 0.25, zview / np.maximum(cos, 1e-6), 0.0)
    return rgb, alpha, depth.astype(np.float32), c2w[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="outputs/synth_obja")
    ap.add_argument("--objects", type=int, default=8)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--gaussians", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from PIL import Image

    from open_diffusiongs_tpu.data.cameras import orbit_camera
    from open_diffusiongs_tpu.utils.cache import enable_persistent_cache
    from open_diffusiongs_tpu.utils.exr import write_exr

    enable_persistent_cache()
    root = os.path.join(args.out, "meta")
    img_dir = os.path.join(args.out, "images")
    os.makedirs(root, exist_ok=True)
    uids = [f"synth/{i:03d}" for i in range(args.objects)]
    with open(os.path.join(root, "train.json"), "w") as fh:
        json.dump(uids, fh)
    rng = np.random.default_rng(args.seed)

    for oi, uid in enumerate(uids):
        gauss = make_scene(rng, args.gaussians)
        rgb, alpha, depth, _ = render_object(gauss, args.res)
        for i in range(40):
            d = os.path.join(img_dir, uid, "campos_512_v4", f"{i:05d}")
            os.makedirs(d, exist_ok=True)
            prefix = os.path.join(d, f"{i:05d}")
            rgba = np.concatenate(
                [rgb[i], alpha[i, ..., None]], axis=-1)
            Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(
                prefix + ".png")
            # json in the raw (Blender-ish) convention load_camera_json
            # inverts: write the OpenGL c2w back through the loader's
            # row/col ops run in reverse
            ele, azi = view_layout()[i]
            gl = orbit_camera(ele, azi, DIS)
            raw = gl.copy()
            raw[:3, 1:3] *= -1                  # undo cols 1:3 *= -1
            raw[[1, 2]] = raw[[2, 1]]           # undo row swap
            raw[1] *= -1                        # undo row 1 negate
            with open(prefix + ".json", "w") as fh:
                json.dump({"x": raw[:3, 0].tolist(),
                           "y": raw[:3, 1].tolist(),
                           "z": raw[:3, 2].tolist(),
                           "origin": raw[:3, 3].tolist()}, fh)
            nd = np.zeros((args.res, args.res, 4), np.float32)
            nd[..., 3] = depth[i]
            write_exr(prefix + "_nd.exr", nd, ["R", "G", "B", "A"])
        print(f"object {oi + 1}/{args.objects} done", flush=True)
    print(json.dumps({"out": args.out, "objects": args.objects,
                      "res": args.res, "uids": uids}))


if __name__ == "__main__":
    main()
