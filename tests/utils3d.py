"""Shared helpers to build small random scenes + cameras for tests."""

import numpy as np

from open_diffusiongs_tpu.ops.gaussians import Gaussians


def look_at(eye, target=(0.0, 0.0, 0.0), up=(0.0, -1.0, 0.0)):
    """OpenCV-convention c2w (x right, y down, z forward) looking at target."""
    eye = np.asarray(eye, np.float32)
    target = np.asarray(target, np.float32)
    up = np.asarray(up, np.float32)
    z = target - eye
    z = z / np.linalg.norm(z)
    x = np.cross(-up, z)  # y points down in OpenCV, so screen-up is -y
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, eye
    return c2w


def orbit_cameras(n_views, radius=3.0, h=64, w=64, fov_deg=40.0, elev=0.3):
    c2ws, fxy = [], []
    f = 0.5 * w / np.tan(np.radians(fov_deg) / 2)
    for i in range(n_views):
        ang = 2 * np.pi * i / max(n_views, 1) + 0.3
        eye = (radius * np.cos(ang), radius * elev, radius * np.sin(ang))
        c2ws.append(look_at(eye))
        fxy.append([f, f, w / 2.0, h / 2.0])
    return (np.stack(c2ws).astype(np.float32),
            np.asarray(fxy, np.float32))


def random_gaussians(rng, b, n, sh_degree=0, spread=0.7, scale_mean=-3.5):
    shs = (sh_degree + 1) ** 2
    return Gaussians(
        xyz=rng.normal(0, spread, (b, n, 3)).astype(np.float32),
        features=rng.normal(0, 0.6, (b, n, shs, 3)).astype(np.float32),
        scaling=(scale_mean + 0.4 * rng.normal(0, 1, (b, n, 3))).astype(np.float32),
        rotation=rng.normal(0, 1, (b, n, 4)).astype(np.float32),
        opacity=rng.normal(1.0, 1.5, (b, n, 1)).astype(np.float32),
    )
