"""Camera math (OpenCV convention), fully vectorized JAX.

Semantics match the reference Camera (gs_core.py:277-316): camera-to-world
matrices in OpenCV convention (x right, y down, z forward), znear=0.01,
zfar=100, and the custom intrinsics-aware projection matrix used by the CUDA
rasterizer.  Where the reference stores transposed matrices for the CUDA
row-vector convention, we keep plain column-vector math — the composition
`P @ W2C @ [p;1]` is numerically identical to the reference's
`[p;1]^T @ W2C^T @ P^T`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Geometry matmuls are tiny; always run them in full f32 precision (the TPU
# default would otherwise route them through bf16 MXU passes).
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

ZNEAR = 0.01
ZFAR = 100.0


class CameraParams(NamedTuple):
    """Static per-view camera data (all leading dims broadcastable).

    w2c:       [..., 4, 4] world->camera (OpenCV).
    proj:      [..., 4, 4] intrinsics projection (see projection_matrix).
    full_proj: [..., 4, 4] proj @ w2c.
    cam_pos:   [..., 3] camera center in world space (c2w[:3, 3]).
    fxfycxcy:  [..., 4]
    tanfov:    [..., 2] (tanfovX, tanfovY) = (w/2fx, h/2fy).
    """

    w2c: jnp.ndarray
    proj: jnp.ndarray
    full_proj: jnp.ndarray
    cam_pos: jnp.ndarray
    fxfycxcy: jnp.ndarray
    tanfov: jnp.ndarray


def projection_matrix(fxfycxcy: jnp.ndarray, h: int, w: int,
                      znear: float = ZNEAR, zfar: float = ZFAR) -> jnp.ndarray:
    """Intrinsics projection matrix (ref gs_core.py:296-305).

    fxfycxcy: [..., 4] -> [..., 4, 4].
    """
    fx, fy, cx, cy = (fxfycxcy[..., 0], fxfycxcy[..., 1],
                      fxfycxcy[..., 2], fxfycxcy[..., 3])
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    z22 = jnp.full_like(fx, -(zfar + znear) / (zfar - znear))
    z23 = jnp.full_like(fx, -(2.0 * zfar * znear) / (zfar - znear))
    rows = [
        jnp.stack([2.0 * fx / w, zero, 2.0 * (cx / w) - 1.0, zero], axis=-1),
        jnp.stack([zero, 2.0 * fy / h, 2.0 * (cy / h) - 1.0, zero], axis=-1),
        jnp.stack([zero, zero, z22, z23], axis=-1),
        jnp.stack([zero, zero, one, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def make_camera(c2w: jnp.ndarray, fxfycxcy: jnp.ndarray, h: int, w: int) -> CameraParams:
    """Build CameraParams from [..., 4, 4] c2w + [..., 4] intrinsics
    (ref gs_core.py:277-316)."""
    c2w = c2w.astype(jnp.float32)
    w2c = jnp.linalg.inv(c2w)
    proj = projection_matrix(fxfycxcy.astype(jnp.float32), h, w)
    full_proj = _mm(proj, w2c)
    fx, fy = fxfycxcy[..., 0], fxfycxcy[..., 1]
    tanfov = jnp.stack([w / (2.0 * fx), h / (2.0 * fy)], axis=-1)
    return CameraParams(
        w2c=w2c,
        proj=proj,
        full_proj=full_proj,
        cam_pos=c2w[..., :3, 3],
        fxfycxcy=fxfycxcy.astype(jnp.float32),
        tanfov=tanfov.astype(jnp.float32),
    )


def transform_points(mat4: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply [..., 4, 4] to [..., N, 3] points -> homogeneous [..., N, 4]."""
    xyz = _mm(pts, mat4[..., :3, :3].mT) + mat4[..., None, :3, 3]
    wcol = _mm(pts, mat4[..., 3:4, :3].mT) + mat4[..., None, 3:4, 3]
    return jnp.concatenate([xyz, wcol], axis=-1)


def transform_points_3x4(mat4: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply the affine part of [..., 4, 4] to [..., N, 3] -> [..., N, 3]."""
    return _mm(pts, mat4[..., :3, :3].mT) + mat4[..., None, :3, 3]


def ndc2pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    """NDC [-1, 1] -> pixel coordinate (ref auxiliary.h ndc2Pix):
    ((v + 1) * S - 1) / 2, pixel centers at integer coordinates."""
    return ((v + 1.0) * size - 1.0) * 0.5
