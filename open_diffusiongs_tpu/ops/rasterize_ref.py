"""Naive exact reference renderer — the test oracle.

O(N * H * W) per-pixel alpha blending over *all* Gaussians, written
independently from the tiled renderer (`rasterize.py`) so the two can
cross-check each other (the test strategy the reference never had,
SURVEY.md §4).  Semantics are the CUDA renderCUDA loop (forward.cu:261-374)
executed literally per pixel with a Python-level jnp.where chain; the
sequential transmittance product is an explicit cumprod over depth-sorted
Gaussians.

Supports `respect_tiles=True` to also replicate the tile-rect visibility
restriction (a pixel only sees Gaussians whose tile rect covers the pixel's
tile), which is part of the CUDA algorithm's observable behavior.

Only for small scenes/images (tests, golden images) — use
`rasterize.render` for real work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import camera as cam_lib
from . import gs_math
from .gaussians import Gaussians
from .rasterize import (ALPHA_MAX, ALPHA_MIN, EARLY_STOP_T, TILE,
                        preprocess_view)


def render_view_naive(act, cov3d, cam: cam_lib.CameraParams, h: int, w: int,
                      sh_degree: int, bg: jnp.ndarray,
                      respect_tiles: bool = True, pixel_chunk: int = 1024):
    """Render one view exactly. act fields [N, ...]; returns ([h, w, 3], [h, w])."""
    pre = preprocess_view(act, cov3d, cam, h, w, sh_degree)
    n = pre.depth.shape[0]

    # Depth-sort all Gaussians (stable, like the CUDA radix sort).
    order = jnp.argsort(pre.depth, stable=True)
    xy = pre.xy[order]
    conic = pre.conic[order]
    color = pre.color[order]
    opa = pre.opacity[order]
    valid = pre.valid[order]
    rect = pre.rect[order]

    pid = jnp.arange(h * w, dtype=jnp.int32)
    pix_xy = jnp.stack([(pid % w), (pid // w)], axis=-1).astype(jnp.float32)
    tile_xy = (pix_xy // TILE).astype(jnp.int32)

    def blend_pixels(args):
        pxy, txy = args                                     # [P, 2]
        d = xy[None, :, :] - pxy[:, None, :]                # [P, N, 2]
        dx, dy = d[..., 0], d[..., 1]
        power = (-0.5 * (conic[None, :, 0] * dx * dx
                         + conic[None, :, 2] * dy * dy)
                 - conic[None, :, 1] * dx * dy)
        alpha = jnp.minimum(ALPHA_MAX, opa[None, :] * jnp.exp(power))
        visible = valid[None, :]
        if respect_tiles:
            visible = visible & ((txy[:, None, 0] >= rect[None, :, 0])
                                 & (txy[:, None, 0] < rect[None, :, 2])
                                 & (txy[:, None, 1] >= rect[None, :, 1])
                                 & (txy[:, None, 1] < rect[None, :, 3]))
        skip = (power > 0.0) | (alpha < ALPHA_MIN) | (~visible)
        a = jnp.where(skip, 0.0, alpha)
        cp = jnp.cumprod(1.0 - a, axis=-1)
        t_before = jnp.concatenate(
            [jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=-1)
        viol = (~skip) & (t_before * (1.0 - alpha) < EARLY_STOP_T)
        earlier_viol = (jnp.cumsum(viol, axis=-1) - viol.astype(jnp.int32)) > 0
        contrib = (~skip) & (~viol) & (~earlier_viol)
        wgt = jnp.where(contrib, alpha * t_before, 0.0)     # [P, N]
        c_out = jnp.matmul(wgt, color,
                           precision=jax.lax.Precision.HIGHEST)  # [P, 3]
        t_fin = jnp.prod(jnp.where(contrib, 1.0 - alpha, 1.0), axis=-1)
        return c_out + t_fin[:, None] * bg[None, :], 1.0 - t_fin

    num_px = h * w
    pad = (-num_px) % pixel_chunk
    pxy_p = jnp.pad(pix_xy, ((0, pad), (0, 0)))
    txy_p = jnp.pad(tile_xy, ((0, pad), (0, 0)))
    nck = (num_px + pad) // pixel_chunk
    colors, alphas = jax.lax.map(
        blend_pixels,
        (pxy_p.reshape(nck, pixel_chunk, 2), txy_p.reshape(nck, pixel_chunk, 2)))
    colors = colors.reshape(-1, 3)[:num_px].reshape(h, w, 3)
    alphas = alphas.reshape(-1)[:num_px].reshape(h, w)
    return colors, alphas


@functools.partial(jax.jit,
                   static_argnames=("h", "w", "respect_tiles", "channels_first"))
def render_naive(gaussians: Gaussians, c2w: jnp.ndarray, fxfycxcy: jnp.ndarray,
                 h: int, w: int, bg_color=(1.0, 1.0, 1.0),
                 respect_tiles: bool = True, channels_first: bool = True):
    """Batched naive render, same API as rasterize.render (minus capacities)."""
    sh_degree = gaussians.sh_degree
    bg = jnp.asarray(bg_color, jnp.float32)

    def scene(args):
        g_b, c2w_b, fxy_b = args
        act = Gaussians(*g_b).activate()
        cov3d = gs_math.build_cov3d(act.scaling, act.rotation)
        cams = cam_lib.make_camera(c2w_b, fxy_b, h, w)

        def view(cam):
            return render_view_naive(act, cov3d, cam, h, w, sh_degree, bg,
                                     respect_tiles)
        return jax.vmap(view)(cams)

    color, alpha = jax.lax.map(scene, (tuple(gaussians), c2w, fxfycxcy))
    out = {"alpha": alpha[:, :, None]}
    out["render"] = color.transpose(0, 1, 4, 2, 3) if channels_first else color
    return out
