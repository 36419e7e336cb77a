"""Core 3D Gaussian Splatting math, vectorized JAX.

Replicates the reference CUDA formulas exactly (float32):
  * quat -> rotation + cov3D:   forward.cu:118-152 (Sigma = R S S^T R^T)
  * EWA 2D covariance:          forward.cu:74-113 (J W Sigma W^T J^T + 0.3 I,
                                with the 1.3*tanfov frustum clamp)
  * conic / radius / tile rect: forward.cu:218-237 (3-sigma radius from
                                eigenvalues, det guard)
  * SH -> RGB:                  forward.cu:20-71 (clamped to >= 0)

All functions operate on a trailing "attribute" axis and broadcast over any
leading batch axes, so they vmap/shard cleanly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

# SH constants (auxiliary.h of the reference rasterizer; standard real SH).
SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396)
SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w, x, y, z) -> rotation matrix [..., 3, 3].

    Matches computeCov3D's R (forward.cu:126-138, accounting for glm
    column-major storage).  The quaternion is assumed normalized (the
    reference normalizes via GaussianModel.rotation_activation,
    gs_core.py:332).
    """
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - r * z),
                      2.0 * (x * z + r * y)], axis=-1)
    row1 = jnp.stack([2.0 * (x * y + r * z), 1.0 - 2.0 * (x * x + z * z),
                      2.0 * (y * z - r * x)], axis=-1)
    row2 = jnp.stack([2.0 * (x * z - r * y), 2.0 * (y * z + r * x),
                      1.0 - 2.0 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def build_cov3d(scale: jnp.ndarray, rot: jnp.ndarray,
                scale_modifier: float = 1.0) -> jnp.ndarray:
    """World-space covariance Sigma = R diag(s^2) R^T.

    scale: [..., 3] (post-activation, i.e. exp of the raw parameter);
    rot:   [..., 4] normalized quaternion (w, x, y, z).
    Returns the 6 unique entries [..., 6] ordered (xx, xy, xz, yy, yz, zz)
    exactly like forward.cu:146-151.
    """
    # Elementwise formulation (no batched 3x3 matmuls — those pad each tiny
    # GEMM onto the MXU; this runs on the VPU at full width).
    R = quat_to_rotmat(rot)                           # [..., 3, 3]
    M = R * (scale_modifier * scale)[..., None, :]    # columns scaled: R @ diag(s)
    # sigma_ij = sum_k M[i, k] * M[j, k]
    m0, m1, m2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    return jnp.stack([
        jnp.sum(m0 * m0, -1), jnp.sum(m0 * m1, -1), jnp.sum(m0 * m2, -1),
        jnp.sum(m1 * m1, -1), jnp.sum(m1 * m2, -1), jnp.sum(m2 * m2, -1),
    ], axis=-1)


def ewa_cov2d(mean_world: jnp.ndarray, cov3d: jnp.ndarray, w2c: jnp.ndarray,
              fxfycxcy: jnp.ndarray, tanfov: jnp.ndarray) -> jnp.ndarray:
    """Project a 3D covariance to the 2D screen (forward.cu:74-113).

    mean_world: [..., N, 3]; cov3d: [..., N, 6]; w2c: [..., 4, 4];
    fxfycxcy: [..., 4]; tanfov: [..., 2].
    Returns [..., N, 3] = (cov.xx, cov.xy, cov.yy) with the +0.3 low-pass.
    """
    # Elementwise formulation (VPU): view transform, the 2x3 Jacobian rows
    # t0 = (fx/tz) * W0 - (fx*tx/tz^2) * W2 and t1 likewise, then
    # cov2d = T Vrk T^T expanded as scalar sums.
    W = w2c[..., :3, :3]                                  # [..., 3, 3]
    p = mean_world
    t_x = (W[..., None, 0, 0] * p[..., 0] + W[..., None, 0, 1] * p[..., 1]
           + W[..., None, 0, 2] * p[..., 2] + w2c[..., None, 0, 3])
    t_y = (W[..., None, 1, 0] * p[..., 0] + W[..., None, 1, 1] * p[..., 1]
           + W[..., None, 1, 2] * p[..., 2] + w2c[..., None, 1, 3])
    t_z = (W[..., None, 2, 0] * p[..., 0] + W[..., None, 2, 1] * p[..., 1]
           + W[..., None, 2, 2] * p[..., 2] + w2c[..., None, 2, 3])
    fx = fxfycxcy[..., None, 0]
    fy = fxfycxcy[..., None, 1]
    limx = 1.3 * tanfov[..., None, 0]
    limy = 1.3 * tanfov[..., None, 1]
    tx = jnp.clip(t_x / t_z, -limx, limx) * t_z
    ty = jnp.clip(t_y / t_z, -limy, limy) * t_z
    tz = t_z

    # T = J @ W: row0 = (fx/tz) W[0,:] - (fx tx/tz^2) W[2,:], row1 analogous
    a0 = fx / tz
    a2 = -(fx * tx) / (tz * tz)
    b1 = fy / tz
    b2 = -(fy * ty) / (tz * tz)
    T0 = [a0 * W[..., None, 0, k] + a2 * W[..., None, 2, k] for k in range(3)]
    T1 = [b1 * W[..., None, 1, k] + b2 * W[..., None, 2, k] for k in range(3)]

    c_xx, c_xy, c_xz = cov3d[..., 0], cov3d[..., 1], cov3d[..., 2]
    c_yy, c_yz, c_zz = cov3d[..., 3], cov3d[..., 4], cov3d[..., 5]

    def quad(u, v):
        # u^T Vrk v for 3-vectors u, v (lists of scalars)
        return (u[0] * (c_xx * v[0] + c_xy * v[1] + c_xz * v[2])
                + u[1] * (c_xy * v[0] + c_yy * v[1] + c_yz * v[2])
                + u[2] * (c_xz * v[0] + c_yz * v[1] + c_zz * v[2]))

    return jnp.stack([quad(T0, T0) + 0.3, quad(T0, T1), quad(T1, T1) + 0.3],
                     axis=-1)


def _cov6_to_mat(cov6: jnp.ndarray) -> jnp.ndarray:
    xx, xy, xz, yy, yz, zz = (cov6[..., i] for i in range(6))
    return jnp.stack([
        jnp.stack([xx, xy, xz], axis=-1),
        jnp.stack([xy, yy, yz], axis=-1),
        jnp.stack([xz, yz, zz], axis=-1),
    ], axis=-2)


def conic_and_radius(cov2d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Invert 2D covariance and compute the 3-sigma pixel radius
    (forward.cu:218-232).

    cov2d: [..., 3] = (xx, xy, yy).
    Returns (conic [..., 3], radius [...], valid [...]).  `valid` is False
    where det == 0 (the CUDA kernel early-outs there).
    """
    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = a * c - b * b
    valid = det != 0.0
    det_inv = jnp.where(valid, 1.0 / jnp.where(valid, det, 1.0), 0.0)
    conic = jnp.stack([c * det_inv, -b * det_inv, a * det_inv], axis=-1)
    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, mid - disc)))
    return conic, radius, valid


def eval_sh(sh: jnp.ndarray, degree: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH colors (forward.cu:20-71).

    sh:   [..., (degree+1)^2, 3] coefficients.
    dirs: [..., 3] *unnormalized* view directions (gaussian_pos - cam_pos);
          normalized internally as in computeColorFromSH.
    Returns RGB [..., 3] clamped to >= 0 after the +0.5 offset.
    """
    result = SH_C0 * sh[..., 0, :]
    if degree > 0:
        d = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        x, y, z = d[..., 0:1], d[..., 1:2], d[..., 2:3]
        result = result - SH_C1 * y * sh[..., 1, :] + SH_C1 * z * sh[..., 2, :] \
            - SH_C1 * x * sh[..., 3, :]
        if degree > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (result
                      + SH_C2[0] * xy * sh[..., 4, :]
                      + SH_C2[1] * yz * sh[..., 5, :]
                      + SH_C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                      + SH_C2[3] * xz * sh[..., 7, :]
                      + SH_C2[4] * (xx - yy) * sh[..., 8, :])
            if degree > 2:
                result = (result
                          + SH_C3[0] * y * (3.0 * xx - yy) * sh[..., 9, :]
                          + SH_C3[1] * xy * z * sh[..., 10, :]
                          + SH_C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11, :]
                          + SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12, :]
                          + SH_C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13, :]
                          + SH_C3[5] * z * (xx - yy) * sh[..., 14, :]
                          + SH_C3[6] * x * (xx - 3.0 * yy) * sh[..., 15, :])
    return jnp.maximum(result + 0.5, 0.0)


def rgb_to_sh0(rgb: jnp.ndarray) -> jnp.ndarray:
    """Inverse of degree-0 eval (gs_core.py RGB2SH): (rgb - 0.5) / C0."""
    return (rgb - 0.5) / SH_C0


def sh0_to_rgb(sh0: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(sh0 * SH_C0 + 0.5, 0.0)
