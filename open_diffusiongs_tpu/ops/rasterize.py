"""TPU-native differentiable 3D Gaussian tile rasterizer (XLA path).

Re-designs the reference CUDA rasterizer
(`submodules/diff-gaussian-rasterization`, rasterizer_impl.cu:198-336) for
XLA's static-shape, sort-based world:

  CUDA design                          TPU design (this file)
  -----------                          ----------------------
  1 thread/Gaussian preprocess         vectorized jnp over [N] (VPU)
  cub scan + dynamic key duplication   static D duplicate slots per Gaussian
  cub radix sort (tile<<32|depth)      lax.sort multi-key (tile, depth), stable
  identifyTileRanges                   searchsorted over sorted tile ids
  dynamic per-tile ranges              static per-tile capacity K (overflow
                                       drops the *farthest* Gaussians, counted)
  16x16 thread block alpha-blend       per-tile masked blend via a lax.scan
                                       over depth chunks; the sequential
                                       T-product becomes a cumprod (parallel)

Blend semantics replicate forward.cu:261-374 exactly: pixel centers at
integer coords, power>0 skip, alpha = min(0.99, op*exp(power)), skip below
1/255, early stop when T*(1-alpha) < 1e-4 (the violating Gaussian does not
contribute), out = C + T*bg.  Gradients come from JAX AD through the same
masked ops, which matches the analytic CUDA backward (backward.cu:399-557)
by construction; the scan chunking doubles as rematerialization so backward
memory stays O(K/kc) like the reference's deferred renderer
(gs_core.py:949-1064) — without its per-view Python loop.

All per-view work is vmapped over views in one launch, removing the
reference's biggest serialization (the b x v Python loop in
gs_core.py:987-1003).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import camera as cam_lib
from . import gs_math
from .gaussians import ActivatedGaussians, Gaussians

TILE = 16                    # BLOCK_X = BLOCK_Y = 16 (config.h:15-17)
EARLY_STOP_T = 1e-4          # forward.cu:348
ALPHA_MIN = 1.0 / 255.0      # forward.cu:345
ALPHA_MAX = 0.99             # forward.cu:344
NEAR_CULL_Z = 0.2            # auxiliary.h in_frustum


class RasterizeConfig(NamedTuple):
    """Static shape/capacity knobs (all must be Python ints at trace time).

    max_tiles_per_gaussian: D duplicate slots; a Gaussian overlapping more
      tiles keeps only the first D in row-major rect order (counted in
      `overflow_tiles`).
    max_per_tile: K per-tile candidate capacity; beyond-K (farthest)
      Gaussians are dropped (counted in `overflow_gaussians`).
    blend_chunk: depth-chunk size for the blend scan.
    """

    max_tiles_per_gaussian: int = 16
    max_per_tile: int = 1024   # docs/CAPACITY.md: measured accuracy vs K
    blend_chunk: int = 32
    # rematerialize each view's rasterization in backward instead of saving
    # the blend intermediates (the reference's DeferredGaussianRender memory
    # trick, gs_core.py:949-1064, as a one-line remat policy)
    remat: bool = True


class PreprocessedView(NamedTuple):
    """Per-view screen-space Gaussian data ([N, ...])."""

    xy: jnp.ndarray       # [N, 2] pixel-space mean
    depth: jnp.ndarray    # [N] view-space z
    conic: jnp.ndarray    # [N, 3] inverse 2D covariance (xx, xy, yy)
    color: jnp.ndarray    # [N, 3] RGB from SH
    opacity: jnp.ndarray  # [N]
    rect: jnp.ndarray     # [N, 4] int32 (tx0, ty0, tx1, ty1), max exclusive
    valid: jnp.ndarray    # [N] bool


def preprocess_view(act: ActivatedGaussians, cov3d: jnp.ndarray,
                    cam: cam_lib.CameraParams, h: int, w: int,
                    sh_degree: int) -> PreprocessedView:
    """Per-Gaussian view preprocessing (forward.cu preprocessCUDA:156-256).

    `act` holds single-scene arrays [N, ...]; `cam` is a single view;
    `cov3d` [N, 6] is precomputed once per scene (view-independent).
    """
    p = act.xyz                                           # [N, 3]
    px, py, pz = p[..., 0], p[..., 1], p[..., 2]

    def affine_row(m, row):
        # elementwise [N] dot with a matrix row (VPU, no tiny-K matmul)
        return m[row, 0] * px + m[row, 1] * py + m[row, 2] * pz + m[row, 3]

    depth = affine_row(cam.w2c, 2)
    in_front = depth > NEAR_CULL_Z

    hom_x = affine_row(cam.full_proj, 0)
    hom_y = affine_row(cam.full_proj, 1)
    p_w = affine_row(cam.full_proj, 3)
    rcp_w = 1.0 / (p_w + 1e-7)
    xy = jnp.stack([cam_lib.ndc2pix(hom_x * rcp_w, w),
                    cam_lib.ndc2pix(hom_y * rcp_w, h)], axis=-1)

    cov2d = gs_math.ewa_cov2d(p, cov3d, cam.w2c, cam.fxfycxcy, cam.tanfov)
    conic, radius, det_ok = gs_math.conic_and_radius(cov2d)

    tiles_x = -(-w // TILE)
    tiles_y = -(-h // TILE)
    # getRect (auxiliary.h:46-56)
    tx0 = jnp.clip(jnp.floor((xy[..., 0] - radius) / TILE), 0, tiles_x)
    ty0 = jnp.clip(jnp.floor((xy[..., 1] - radius) / TILE), 0, tiles_y)
    tx1 = jnp.clip(jnp.floor((xy[..., 0] + radius + TILE - 1) / TILE), 0, tiles_x)
    ty1 = jnp.clip(jnp.floor((xy[..., 1] + radius + TILE - 1) / TILE), 0, tiles_y)
    rect = jnp.stack([tx0, ty0, tx1, ty1], axis=-1).astype(jnp.int32)
    nonempty = ((rect[..., 2] - rect[..., 0]) * (rect[..., 3] - rect[..., 1])) > 0

    color = gs_math.eval_sh(act.features, sh_degree, p - cam.cam_pos)

    valid = in_front & det_ok & nonempty
    return PreprocessedView(xy=xy, depth=depth, conic=conic, color=color,
                            opacity=act.opacity, rect=rect, valid=valid)


class TileBins(NamedTuple):
    idx: jnp.ndarray        # [T, K] int32 Gaussian indices, depth-sorted
    mask: jnp.ndarray       # [T, K] bool
    overflow_tiles: jnp.ndarray      # [] int32: rect tiles beyond D
    overflow_gaussians: jnp.ndarray  # [] int32: per-tile entries beyond K
    entries: jnp.ndarray             # [] int32: total binned entries


def bin_tiles(pre: PreprocessedView, tiles_x: int, tiles_y: int,
              cfg: RasterizeConfig) -> TileBins:
    """Sort-based tile binning (rasterizer_impl.cu duplicateWithKeys +
    radix sort + identifyTileRanges, :70-138, 277-314).

    Static-shape version: every Gaussian emits D = max_tiles_per_gaussian
    (tile_id, depth, idx) records (invalid ones get sentinel tile T), one
    stable lexicographic sort orders them, searchsorted recovers per-tile
    ranges, and a static K-capacity gather yields [T, K] candidate lists.
    """
    n = pre.depth.shape[0]
    d_slots = cfg.max_tiles_per_gaussian
    num_tiles = tiles_x * tiles_y

    # 1. Depth pre-sort of the N Gaussians (small), so the later tile sort
    #    only needs ONE int32 key: a stable tile sort of a depth-ordered
    #    stream yields exactly the CUDA (tile, depth-bits) radix order —
    #    ~25% cheaper than the multi-key sort of N*D elements.
    _, order = jax.lax.sort(
        (pre.depth, jnp.arange(n, dtype=jnp.int32)), num_keys=1,
        is_stable=True)
    rect_d = pre.rect[order]
    valid_d = pre.valid[order]

    rw = rect_d[:, 2] - rect_d[:, 0]                       # [N]
    rh = rect_d[:, 3] - rect_d[:, 1]
    area = rw * rh
    overflow_tiles = jnp.sum(
        jnp.where(valid_d, jnp.maximum(area - d_slots, 0), 0))

    s = jnp.arange(d_slots, dtype=jnp.int32)               # [D]
    # row-major within rect: slot s -> (s % rw, s // rw).  Integer div/mod
    # by a runtime divisor lowers to ~30 VPU ops each (measured ~20ms/view
    # at 512^2); an unrolled incremental walk over the D slots is ~2 ops
    # per step.
    safe_rw = jnp.maximum(rw, 1)
    ox = jnp.zeros_like(rw)
    oy = jnp.zeros_like(rw)
    off_cols = []
    for _ in range(d_slots):
        off_cols.append((ox, oy))
        nx1 = ox + 1
        wrap = nx1 >= safe_rw
        ox = jnp.where(wrap, 0, nx1)
        oy = oy + wrap.astype(oy.dtype)
    off_x = jnp.stack([c[0] for c in off_cols], axis=1)    # [N, D]
    off_y = jnp.stack([c[1] for c in off_cols], axis=1)
    tx = rect_d[:, 0:1] + off_x
    ty = rect_d[:, 1:2] + off_y
    slot_ok = (s[None, :] < area[:, None]) & valid_d[:, None]
    tile_id = jnp.where(slot_ok, ty * tiles_x + tx, num_tiles).astype(jnp.int32)

    rank_bits = max(1, (n - 1).bit_length())               # depth rank < n
    tile_bits = (num_tiles + 1 - 1).bit_length()           # incl. sentinel
    if rank_bits + tile_bits <= 32:
        # Pack (tile, depth-rank) into ONE uint32 key and sort a single
        # array: same order as the stable (tile, depth) sort (ranks are
        # unique so stability is moot), at half the sort data movement.
        rank = jnp.arange(n, dtype=jnp.uint32)
        key = ((tile_id.astype(jnp.uint32) << rank_bits)
               | rank[:, None]).reshape(-1)
        key_s = jax.lax.sort(key, is_stable=False)
        tids = jnp.arange(num_tiles + 1, dtype=jnp.uint32) << rank_bits
        bounds = jnp.searchsorted(key_s, tids, side="left").astype(jnp.int32)
        starts, ends = bounds[:-1], bounds[1:]
        # defer rank extraction + the rank -> original-index mapping to
        # after the [T, K] gather (T*K elements instead of N*D)
        rank_s = None
        idx_s = None
    else:  # shapes too large for 32-bit packing: two-array stable sort
        gidx = jnp.broadcast_to(order[:, None], (n, d_slots))
        tile_s, idx_s = jax.lax.sort(
            (tile_id.reshape(-1), gidx.reshape(-1)), num_keys=1,
            is_stable=True)
        tids = jnp.arange(num_tiles, dtype=jnp.int32)
        starts = jnp.searchsorted(tile_s, tids, side="left").astype(jnp.int32)
        ends = jnp.searchsorted(tile_s, tids + 1, side="left").astype(jnp.int32)

    counts = ends - starts
    entries = jnp.sum(counts)
    overflow_gaussians = jnp.sum(jnp.maximum(counts - cfg.max_per_tile, 0))

    k = jnp.arange(cfg.max_per_tile, dtype=jnp.int32)
    gather_pos = jnp.clip(starts[:, None] + k[None, :], 0, n * d_slots - 1)
    if idx_s is None:
        key_g = key_s[gather_pos]                          # [T, K]
        rank_g = (key_g & jnp.uint32((1 << rank_bits) - 1)).astype(jnp.int32)
        idx_mat = order[rank_g]
    else:
        idx_mat = idx_s[gather_pos]                        # [T, K]
    mask = k[None, :] < jnp.minimum(counts, cfg.max_per_tile)[:, None]
    return TileBins(idx=idx_mat, mask=mask, overflow_tiles=overflow_tiles,
                    overflow_gaussians=overflow_gaussians, entries=entries)


def blend_tiles(pre: PreprocessedView, bins: TileBins, tiles_x: int,
                tiles_y: int, bg: jnp.ndarray, cfg: RasterizeConfig
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Front-to-back alpha blending per tile (forward.cu renderCUDA:261-374).

    The sequential per-pixel loop becomes a chunked scan: within each depth
    chunk the transmittance product is an (exclusive) cumprod and the
    early-stop is a cumulative-or, both parallel over [tiles, pixels, chunk].

    Returns (color [Hp, Wp, 3], alpha [Hp, Wp], depth [Hp, Wp]) where
    Hp = tiles_y*TILE, Wp = tiles_x*TILE (crop to h, w at the caller).
    """
    num_tiles = tiles_x * tiles_y
    ppt = TILE * TILE
    kc = cfg.blend_chunk
    K = cfg.max_per_tile
    assert K % kc == 0, "max_per_tile must be divisible by blend_chunk"

    # Gather per-tile candidate attributes with ONE row gather of a packed
    # [N, 10] matrix (5 separate gathers measured ~3.5x slower on TPU).
    packed = jnp.concatenate(
        [pre.xy, pre.conic, pre.color, pre.opacity[:, None],
         pre.depth[:, None]], axis=-1)
    g_all = packed[bins.idx]                                # [T, K, 10]
    g_xy = g_all[..., 0:2]
    g_conic = g_all[..., 2:5]
    g_color = g_all[..., 5:8]
    g_opa = g_all[..., 8]
    g_depth = g_all[..., 9]

    # Pixel centers per tile: [T, ppt, 2]  (pixf = integer coords, forward.cu:283)
    t_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    t_origin = jnp.stack([(t_ids % tiles_x) * TILE, (t_ids // tiles_x) * TILE],
                         axis=-1).astype(jnp.float32)       # [T, 2]
    lp = jnp.arange(ppt, dtype=jnp.int32)
    local = jnp.stack([lp % TILE, lp // TILE], axis=-1).astype(jnp.float32)
    pix = t_origin[:, None, :] + local[None, :, :]          # [T, ppt, 2]

    def chunk(carry, chunk_in):
        # Layout: pixels on the last (lane) axis — [T, kc, ppt]; the
        # cumulative transmittance runs along the kc (sublane) axis.
        t_run, dead, acc_c, acc_d = carry                   # [T, ppt] / [T, ppt, 3]
        cxy, ccon, ccol, copa, cdep, cmask = chunk_in       # [T, kc, .]
        dx = cxy[:, :, 0, None] - pix[:, None, :, 0]        # [T, kc, ppt]
        dy = cxy[:, :, 1, None] - pix[:, None, :, 1]
        power = (-0.5 * (ccon[:, :, 0, None] * dx * dx
                         + ccon[:, :, 2, None] * dy * dy)
                 - ccon[:, :, 1, None] * dx * dy)           # [T, kc, ppt]
        alpha = jnp.minimum(ALPHA_MAX, copa[:, :, None] * jnp.exp(power))
        skip = (power > 0.0) | (alpha < ALPHA_MIN) | (~cmask[:, :, None])
        a = jnp.where(skip, 0.0, alpha)
        g = 1.0 - a
        cp = jnp.cumprod(g, axis=1)
        cp_exc = jnp.concatenate(
            [jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=1)
        t_before = t_run[:, None, :] * cp_exc
        viol = (~skip) & (t_before * (1.0 - alpha) < EARLY_STOP_T)
        earlier_viol = (jnp.cumsum(viol, axis=1) - viol.astype(jnp.int32)) > 0
        dead_before = dead[:, None, :] | earlier_viol
        contrib = (~skip) & (~viol) & (~dead_before)
        wgt = jnp.where(contrib, alpha * t_before, 0.0)     # [T, kc, ppt]
        acc_c = acc_c + jnp.einsum("tkp,tkc->tpc", wgt, ccol,
                                   precision=jax.lax.Precision.HIGHEST)
        acc_d = acc_d + jnp.sum(wgt * cdep[:, :, None], axis=1)
        t_run = t_run * jnp.prod(jnp.where(contrib, 1.0 - alpha, 1.0), axis=1)
        dead = dead | jnp.any(viol, axis=1)
        return (t_run, dead, acc_c, acc_d), None

    n_chunks = K // kc
    chunks = jax.tree.map(
        lambda x: x.reshape(num_tiles, n_chunks, kc, *x.shape[2:])
                   .swapaxes(0, 1),
        (g_xy, g_conic, g_color, g_opa, g_depth, bins.mask))
    init = (jnp.ones((num_tiles, ppt), jnp.float32),
            jnp.zeros((num_tiles, ppt), bool),
            jnp.zeros((num_tiles, ppt, 3), jnp.float32),
            jnp.zeros((num_tiles, ppt), jnp.float32))
    # checkpoint the chunk body: backward recomputes the [T, kc, ppt]
    # blend intermediates per chunk instead of saving all n_chunks of them
    (t_fin, _, acc_c, acc_d), _ = jax.lax.scan(
        jax.checkpoint(chunk, prevent_cse=False), init, chunks)

    color = acc_c + t_fin[..., None] * bg[None, None, :]    # forward.cu:370-372
    # [T, ppt, c] -> [ty, tx, py, px, c] -> [Hp, Wp, c]
    def assemble(img):
        c = img.shape[-1] if img.ndim == 3 else 1
        img = img.reshape(tiles_y, tiles_x, TILE, TILE, c)
        return img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * TILE,
                                                    tiles_x * TILE, c)
    out_c = assemble(color)
    out_a = assemble((1.0 - t_fin)[..., None])[..., 0]
    out_d = assemble(acc_d[..., None])[..., 0]
    return out_c, out_a, out_d


def rasterize_single_view(act: ActivatedGaussians, cov3d: jnp.ndarray,
                          cam: cam_lib.CameraParams, h: int, w: int,
                          sh_degree: int, bg: jnp.ndarray,
                          cfg: RasterizeConfig):
    tiles_x = -(-w // TILE)
    tiles_y = -(-h // TILE)
    pre = preprocess_view(act, cov3d, cam, h, w, sh_degree)
    bins = bin_tiles(pre, tiles_x, tiles_y, cfg)
    # name the (integer, gradient-free) bin structure so the remat policy in
    # render() keeps it as a residual — backward then skips the re-sort
    from jax.ad_checkpoint import checkpoint_name
    bins = bins._replace(
        idx=checkpoint_name(bins.idx, "raster_bins_idx"),
        mask=checkpoint_name(bins.mask, "raster_bins_mask"))
    color, alpha, depth = blend_tiles(pre, bins, tiles_x, tiles_y, bg, cfg)
    return (color[:h, :w], alpha[:h, :w], depth[:h, :w],
            bins.overflow_tiles, bins.overflow_gaussians, bins.entries)


@functools.partial(jax.jit, static_argnames=("h", "w", "cfg", "channels_first"))
def render(gaussians: Gaussians, c2w: jnp.ndarray, fxfycxcy: jnp.ndarray,
           h: int, w: int, bg_color=(1.0, 1.0, 1.0),
           cfg: RasterizeConfig = RasterizeConfig(),
           channels_first: bool = True):
    """Batched multi-view render — the `deferred_gaussian_render` equivalent
    (gs_core.py:949-1064) with all views in one compiled launch.

    Args:
      gaussians: raw Gaussians with leading batch axis: fields [B, N, ...].
      c2w:       [B, V, 4, 4]; fxfycxcy: [B, V, 4].

    Returns dict:
      render: [B, V, 3, h, w] (or [B, V, h, w, 3] if channels_first=False)
      alpha:  [B, V, 1, h, w], depth: [B, V, 1, h, w]
      overflow_tiles / overflow_gaussians: [] int32 diagnostics
      ("no silent caps": nonzero means capacity clipped real work).
    """
    sh_degree = gaussians.sh_degree
    bg = jnp.asarray(bg_color, jnp.float32)

    def render_scene(g_b, c2w_b, fxy_b):
        act = Gaussians(*g_b).activate()
        cov3d = gs_math.build_cov3d(act.scaling, act.rotation)
        cams = cam_lib.make_camera(c2w_b, fxy_b, h, w)      # [V, ...]

        def one_view(cam):
            return rasterize_single_view(act, cov3d, cam, h, w,
                                         sh_degree, bg, cfg)
        if cfg.remat:
            one_view = jax.checkpoint(
                one_view,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "raster_bins_idx", "raster_bins_mask"))
        # sequential over views: a batched (vmapped) lax.sort is ~2.4x
        # slower than V independent sorts on TPU (measured on v5e), and the
        # per-view transients don't multiply
        return jax.lax.map(one_view, cams)

    color, alpha, depth, otile, ogauss, entries = jax.lax.map(
        lambda args: render_scene(*args), (tuple(gaussians), c2w, fxfycxcy))
    out = {
        "alpha": alpha[:, :, None],
        "depth": depth[:, :, None],
        "overflow_tiles": jnp.sum(otile),
        "overflow_gaussians": jnp.sum(ogauss),
        "binned_entries": jnp.sum(entries),
    }
    if channels_first:
        out["render"] = color.transpose(0, 1, 4, 2, 3)
    else:
        out["render"] = color
    return out
