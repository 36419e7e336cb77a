"""Per-pixel camera rays from poses + intrinsics.

TPU-native equivalent of the reference's `TransformInput`
(diffusionGS/systems/utils.py:621-757): pixel centers at (i+0.5), direction
(x_c, y_c, 1) = ((u+0.5-cx)/fx, (v+0.5-cy)/fy, 1) rotated to world and
L2-normalized; origin is the camera center.  Layout here is channels-last
[..., h, w, 3] (TPU-friendly); use `rays_chw` for the reference's
channels-first view.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def pixel_rays(c2w: jnp.ndarray, fxfycxcy: jnp.ndarray, h: int, w: int
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute world-space rays.

    Args:
      c2w:      [..., 4, 4] camera-to-world (OpenCV convention).
      fxfycxcy: [..., 4] intrinsics.

    Returns:
      (ray_o, ray_d): each [..., h, w, 3] float32.  ray_d is unit-norm.
    """
    c2w = c2w.astype(jnp.float32)
    fxfycxcy = fxfycxcy.astype(jnp.float32)
    y = jnp.arange(h, dtype=jnp.float32)
    x = jnp.arange(w, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(y, x, indexing="ij")  # [h, w]

    fx = fxfycxcy[..., 0, None, None]
    fy = fxfycxcy[..., 1, None, None]
    cx = fxfycxcy[..., 2, None, None]
    cy = fxfycxcy[..., 3, None, None]

    dir_x = (xx + 0.5 - cx) / fx          # [..., h, w]
    dir_y = (yy + 0.5 - cy) / fy
    dir_z = jnp.ones_like(dir_x)
    d_cam = jnp.stack([dir_x, dir_y, dir_z], axis=-1)  # [..., h, w, 3]

    rot = c2w[..., :3, :3]                # [..., 3, 3]
    d_world = jnp.einsum("...hwc,...dc->...hwd", d_cam, rot,
                         precision=jax.lax.Precision.HIGHEST)
    d_world = d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)

    o_world = jnp.broadcast_to(c2w[..., None, None, :3, 3], d_world.shape)
    return o_world, d_world


def rays_chw(c2w: jnp.ndarray, fxfycxcy: jnp.ndarray, h: int, w: int
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Channels-first [..., 3, h, w] variant matching the reference layout."""
    ray_o, ray_d = pixel_rays(c2w, fxfycxcy, h, w)
    return jnp.moveaxis(ray_o, -1, -3), jnp.moveaxis(ray_d, -1, -3)
