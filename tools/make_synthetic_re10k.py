"""Generate a multi-view-consistent synthetic RealEstate10K-convention
dataset — the scene-family counterpart of make_synthetic_objaverse.py.

The reference trains the scene model on RE10K walkthrough clips
(scripts/train_scene_stage1.sh, data/base_scene.py); this image has no
egress to fetch that data, so the scene-family at-scale convergence run
(docs/CONVERGENCE.md) trains on interiors this tool renders with the
framework's own rasterizer: a ground-truth 3DGS "room" per scene (five
wallpapered box walls + floating colored lobes, so every ray hits
geometry like a real interior) viewed along a forward dolly trajectory
with gentle lateral sway and yaw — the RE10K camera statistics.

Consistency argument: data/re10k.py normalizes the chosen frames' poses
by a rigid mean-camera alignment plus a translation scale 1/s
(preprocess_poses, base_scene.py:122-156).  A rigid transform of all
cameras is a rigid transform of the scene, and scaling camera
translations by 1/s yields images identical to scaling the whole scene
(positions AND sizes) by 1/s — projection depends only on x/z — so every
normalized sample remains consistent with ONE (transformed) scene.

Layout written (exactly what data/re10k.py consumes):
  out/images/scene{S}/{F:05d}.png          256x256 RGB frames
  out/meta/scene{S}.json                   {scene_name, frames:[{
                                             image_path, fxfycxcy, w2c}]}
  out/full_list.txt                        one metadata path per line

Usage:
  python tools/make_synthetic_re10k.py --out outputs/synth_re10k \
      [--scenes 8] [--frames 48] [--res 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Room box (world units, OpenCV world: x right, y DOWN, z forward).
ROOM_X, ROOM_Y, ROOM_Z = 3.0, 2.0, 8.0
FOCAL_REL = 1.4          # fx = fy = 1.4 * res -> ~39 deg FOV, RE10K-like


def look_at_c2w(origin: np.ndarray, target: np.ndarray) -> np.ndarray:
    """OpenCV c2w (x right, y down, z forward), world down = +y."""
    z = target - origin
    z = z / np.linalg.norm(z)
    x = np.cross(np.asarray([0.0, 1.0, 0.0]), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, origin
    return c2w


def trajectory(rng: np.random.Generator, n: int) -> np.ndarray:
    """Forward dolly with lateral sway + drifting look-at (c2w [n,4,4])."""
    phase = rng.uniform(0, 2 * np.pi, 3)
    amp_x = rng.uniform(0.1, 0.3)
    amp_y = rng.uniform(0.05, 0.12)
    span = rng.uniform(1.8, 2.6)                 # forward travel
    c2ws = []
    for i in range(n):
        u = i / max(n - 1, 1)
        origin = np.asarray([
            amp_x * np.sin(2 * np.pi * u + phase[0]),
            amp_y * np.sin(4 * np.pi * u + phase[1]),
            span * u])
        target = origin + np.asarray([
            0.5 * np.sin(2 * np.pi * u + phase[2]),
            0.15 * np.cos(2 * np.pi * u + phase[1]),
            3.0])
        c2ws.append(look_at_c2w(origin, target))
    return np.stack(c2ws).astype(np.float64)


def _wallpaper(pts: np.ndarray, base: np.ndarray,
               freqs: np.ndarray, phases: np.ndarray) -> np.ndarray:
    """Smooth per-point color pattern so walls carry learnable structure."""
    s = np.stack([np.sin(pts @ freqs[c] + phases[c]) for c in range(3)],
                 axis=-1)
    return np.clip(base + 0.25 * s, 0.05, 0.95)


def make_room(rng: np.random.Generator, step: float = 0.18,
              n_lobes: int = 10, per: int = 160):
    """GT Gaussians: 5 box walls + floating lobes (raw-param Gaussians)."""
    from open_diffusiongs_tpu.ops.gaussians import Gaussians
    planes = []
    # back wall z=ROOM_Z; side walls x=+-ROOM_X; floor/ceiling y=+-ROOM_Y
    gx = np.arange(-ROOM_X, ROOM_X + 1e-6, step)
    gy = np.arange(-ROOM_Y, ROOM_Y + 1e-6, step)
    gz = np.arange(-0.5, ROOM_Z + 1e-6, step)
    xx, yy = np.meshgrid(gx, gy, indexing="ij")
    planes.append(np.stack([xx, yy, np.full_like(xx, ROOM_Z)], -1)
                  .reshape(-1, 3))
    zz, yy2 = np.meshgrid(gz, gy, indexing="ij")
    for sx in (-ROOM_X, ROOM_X):
        planes.append(np.stack([np.full_like(zz, sx), yy2, zz], -1)
                      .reshape(-1, 3))
    xx2, zz2 = np.meshgrid(gx, gz, indexing="ij")
    for sy in (-ROOM_Y, ROOM_Y):
        planes.append(np.stack([xx2, np.full_like(xx2, sy), zz2], -1)
                      .reshape(-1, 3))
    wall_xyz = np.concatenate(planes) + rng.normal(0, 0.02, (1, 3))

    base = rng.uniform(0.25, 0.75, 3)
    freqs = rng.uniform(-2.2, 2.2, (3, 3))
    phases = rng.uniform(0, 2 * np.pi, 3)
    wall_rgb = _wallpaper(wall_xyz, base, freqs, phases)
    n_w = len(wall_xyz)
    wall_scale = np.log(np.full((n_w, 3), 0.6 * step))

    # floating furniture lobes, kept off the camera corridor
    centers = np.stack([rng.uniform(-2.0, 2.0, n_lobes),
                        rng.uniform(-1.4, 1.4, n_lobes),
                        rng.uniform(1.5, 7.0, n_lobes)], -1)
    centers[:, 0] += np.sign(centers[:, 0] + 1e-3) * 0.6
    which = np.repeat(np.arange(n_lobes), per)
    lobe_xyz = centers[which] + rng.normal(0, 0.18, (n_lobes * per, 3))
    lobe_base = rng.uniform(0.1, 0.9, (n_lobes, 3))
    lobe_rgb = np.clip(lobe_base[which]
                       + rng.normal(0, 0.06, (n_lobes * per, 3)), 0.02, 0.98)
    lobe_scale = np.log(rng.uniform(0.04, 0.10, (n_lobes * per, 3)))

    xyz = np.concatenate([wall_xyz, lobe_xyz])
    rgb = np.concatenate([wall_rgb, lobe_rgb])
    scaling = np.concatenate([wall_scale, lobe_scale])
    n = len(xyz)
    sh0 = (rgb - 0.5) / 0.28209479177387814      # RGB2SH, degree 0
    return Gaussians(
        xyz=xyz.astype(np.float32)[None],
        features=sh0.astype(np.float32)[None, :, None, :],
        scaling=scaling.astype(np.float32)[None],
        rotation=np.tile(np.asarray([1.0, 0, 0, 0], np.float32),
                         (n, 1))[None],
        opacity=np.full((1, n, 1), 3.0, np.float32))  # sigmoid -> 0.95


def render_scene(gauss, c2ws: np.ndarray, res: int):
    """Render every frame with generous capacities (offline: exactness
    over speed — overflow counters are asserted zero)."""
    import jax.numpy as jnp

    from open_diffusiongs_tpu.ops.rasterize import RasterizeConfig, render

    f = FOCAL_REL * res
    v = len(c2ws)
    fxy = np.tile(np.asarray([f, f, res / 2.0, res / 2.0], np.float32),
                  (1, v, 1))
    cfg = RasterizeConfig(max_tiles_per_gaussian=256, max_per_tile=4096,
                          blend_chunk=32)
    chunks = []
    overflow = 0
    for lo in range(0, v, 8):                    # bound per-launch memory
        out = render(gauss, jnp.asarray(c2ws[None, lo:lo + 8], jnp.float32),
                     jnp.asarray(fxy[:, lo:lo + 8]), res, res,
                     bg_color=(0.0, 0.0, 0.0), cfg=cfg, channels_first=False)
        color = np.asarray(out["render"][0])
        alpha = np.asarray(out["alpha"][0, :, 0])
        overflow += int(out["overflow_tiles"]) + int(out["overflow_gaussians"])
        a = np.maximum(alpha, 1e-6)[..., None]
        # un-premultiply over black bg: color already = sum(w*c); alpha<1
        # leaks bg black, matching what a camera in this GT world sees
        chunks.append(np.clip(color + (1.0 - a) * 0.0, 0.0, 1.0))
    return np.concatenate(chunks), overflow


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="outputs/synth_re10k")
    ap.add_argument("--scenes", type=int, default=8)
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--wall-step", type=float, default=0.18,
                    help="wall Gaussian spacing (bigger = fewer, for tests)")
    ap.add_argument("--lobes", type=int, default=10)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU plugin "
                         "ignores JAX_PLATFORMS=cpu)")
    args = ap.parse_args()

    from PIL import Image

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    from open_diffusiongs_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    meta_dir = os.path.join(args.out, "meta")
    os.makedirs(meta_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    f = FOCAL_REL * args.res

    meta_paths = []
    for s in range(args.scenes):
        name = f"synthscene{s:03d}"
        img_dir = os.path.join(args.out, "images", name)
        os.makedirs(img_dir, exist_ok=True)
        gauss = make_room(rng, step=args.wall_step, n_lobes=args.lobes)
        c2ws = trajectory(rng, args.frames)
        rgb, overflow = render_scene(gauss, c2ws, args.res)
        assert overflow == 0, f"capacity clipped GT renders: {overflow}"
        frames = []
        for i in range(args.frames):
            p = os.path.join(img_dir, f"{i:05d}.png")
            Image.fromarray((rgb[i] * 255).astype(np.uint8)).save(p)
            w2c = np.linalg.inv(c2ws[i])
            frames.append({
                "image_path": p,
                "fxfycxcy": [f, f, args.res / 2.0, args.res / 2.0],
                "w2c": w2c.tolist()})
        mp = os.path.join(meta_dir, f"{name}.json")
        with open(mp, "w") as fh:
            json.dump({"scene_name": name, "frames": frames}, fh)
        meta_paths.append(mp)
        print(f"scene {s + 1}/{args.scenes} done "
              f"(n_gauss={gauss.xyz.shape[1]})", flush=True)

    full_list = os.path.join(args.out, "full_list.txt")
    with open(full_list, "w") as fh:
        fh.write("\n".join(meta_paths) + "\n")
    print(json.dumps({"out": args.out, "scenes": args.scenes,
                      "frames": args.frames, "full_list": full_list}))


if __name__ == "__main__":
    main()
