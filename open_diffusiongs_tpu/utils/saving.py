"""Artifact saving: image grids, videos, Gaussian PLYs + turntables.

Functional replacement for the reference SaverMixin (utils/saving.py:24-751):
each saver takes explicit inputs and a target path rooted at the trial dir.
Videos are MJPEG AVI (no ffmpeg in this image, see utils/video.py).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..ops.gaussians import Gaussians, NumpyGaussians
from ..utils.ply import save_gaussians_ply
from ..utils.video import to_uint8, write_mjpeg_avi


def _ensure_dir(path: str):
    if os.path.dirname(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)


def save_image(path: str, img: np.ndarray) -> str:
    """img: [h, w, 3] float [0,1] or uint8."""
    _ensure_dir(path)
    if img.dtype != np.uint8:
        img = to_uint8(img)
    Image.fromarray(img).save(path)
    return path


def save_image_grid(path: str, imgs: np.ndarray, ncols: Optional[int] = None
                    ) -> str:
    """imgs: [n, h, w, 3] -> single grid png (SaverMixin.save_image_grid)."""
    n, h, w, c = imgs.shape
    ncols = ncols or n
    nrows = -(-n // ncols)
    grid = np.ones((nrows * h, ncols * w, c), imgs.dtype) \
        * (255 if imgs.dtype == np.uint8 else 1.0)
    for i in range(n):
        r, col = divmod(i, ncols)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = imgs[i]
    return save_image(path, grid)


def save_video(path: str, frames: Sequence[np.ndarray], fps: int = 30) -> str:
    """frames: [t, h, w, 3] float or uint8 -> MJPEG AVI."""
    frames = [to_uint8(f) if f.dtype != np.uint8 else f for f in frames]
    _ensure_dir(path)
    if not path.endswith(".avi"):
        path = os.path.splitext(path)[0] + ".avi"
    write_mjpeg_avi(path, frames, fps=fps)
    return path


def chw_to_hwc(x: np.ndarray) -> np.ndarray:
    return np.moveaxis(np.asarray(x), -3, -1)


def turntable_cameras(n_frames: int = 60, radius: float = 2.7,
                      elevation_deg: float = 15.0, h: int = 512, w: int = 512,
                      fov_deg: float = 40.0, focal: float = None):
    """Orbit c2ws (OpenCV convention, z-up world) for turntable videos
    (render_turntable, gs_core.py:1201-1219 spirit).  The single canonical
    orbit constructor — pipeline camera templates wrap this (a focal
    override replaces the fov)."""
    f = focal if focal is not None \
        else 0.5 * w / np.tan(np.radians(fov_deg) / 2)
    ele = np.radians(elevation_deg)
    c2ws, fxy = [], []
    for i in range(n_frames):
        ang = 2 * np.pi * i / n_frames
        eye = np.asarray([radius * np.cos(ele) * np.cos(ang),
                          radius * np.cos(ele) * np.sin(ang),
                          radius * np.sin(ele)], np.float64)
        z = -eye / np.linalg.norm(eye)
        up = np.asarray([0.0, 0.0, 1.0])
        x = np.cross(z, up); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = x, y, z, eye
        c2ws.append(c2w)
        fxy.append([f, f, w / 2.0, h / 2.0])
    return (np.stack(c2ws).astype(np.float32),
            np.asarray(fxy, np.float32))


def save_gaussians(g: NumpyGaussians, path_ply: str,
                   save_turntable: bool = False, h: int = 256, w: int = 256,
                   raster_cfg=None, fps: int = 30,
                   turntable_frames: int = 36) -> str:
    """PLY (+ optional turntable AVI) — SaverMixin.save_gaussians
    (saving.py:452-469)."""
    save_gaussians_ply(g, path_ply)
    if save_turntable:
        from ..ops import rasterize
        cfg = raster_cfg or rasterize.RasterizeConfig()
        c2ws, fxy = turntable_cameras(turntable_frames, h=h, w=w)
        gb = Gaussians(*(jnp.asarray(x)[None] for x in g))
        out = rasterize.render(gb, jnp.asarray(c2ws)[None],
                               jnp.asarray(fxy)[None], h, w, cfg=cfg,
                               channels_first=False)
        frames = np.asarray(out["render"][0])
        save_video(os.path.splitext(path_ply)[0] + "_turntable.avi",
                   frames, fps=fps)
    return path_ply
