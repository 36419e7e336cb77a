"""TPU-native differentiable 3D Gaussian tile rasterizer (XLA path).

Re-designs the reference CUDA rasterizer
(`submodules/diff-gaussian-rasterization`, rasterizer_impl.cu:198-336) for
XLA's static-shape, sort-based world:

  CUDA design                          TPU design (this file)
  -----------                          ----------------------
  1 thread/Gaussian preprocess         vectorized jnp over [N] (VPU)
  cub scan + dynamic key duplication   static D duplicate slots per Gaussian
  cub radix sort (tile<<32|depth)      lax.sort multi-key (tile, depth), stable
                                       — carrying the 10 attribute columns as
                                       sort payload when split_slots > 0, so
                                       the per-tile candidate rows come out of
                                       the sort already materialized (payload
                                       operands are free on TPU; the [T, K, 10]
                                       row gather they replace is ~8 ms/view)
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
    # Which D tiles survive when a rect covers more than D:
    #   'center' (default) — shrink the rect proportionally AROUND the
    #     Gaussian's center tile, so the kept window carries the bulk of the
    #     2D-Gaussian mass (symmetric tail truncation; exact whenever
    #     area <= D, i.e. always at trained statistics).
    #   'first'  — keep the first D tiles in row-major rect order (the
    #     pre-r5 behavior).  At init statistics rects cover ~100+ tiles and
    #     this renders each Gaussian ONLY in the top rows of its footprint —
    #     a geometric corruption that was the round-4 non-learning mechanism
    #     (docs/CONVERGENCE.md): 73% of candidate-slot mass clipped into
    #     asymmetric garbage and zero gradient over most of each footprint.
    # The CUDA reference never drops (rasterizer_impl.cu:277-308); both
    # modes count clipped slots in overflow_tiles.
    rect_clip: str = "center"
    # --- split (two-stream) binning ---------------------------------------
    # The N*D key sort dominates binning, yet trained pixel-aligned models
    # have E[rect area] ~ 1-2 tiles, so most of the D=16 slots are sentinel
    # padding.  With split_slots = S > 0, stream A emits only S slots for
    # ALL Gaussians (exact for rects <= S tiles) and stream B re-emits just
    # the rare big-rect Gaussians (selected by a cheap N-key sort, capacity
    # `big_select`, auto N/8) for their remaining slots S..D.  A small
    # per-tile merge of the two depth-ordered candidate lists reconstructs
    # the exact CUDA order.  Sort volume drops from N*D to
    # N*S + big_select*(D-S) + T*(K + big_per_tile)  (~3-4x at 512^2).
    split_slots: int = 0       # 0 = single-stream (exact baseline path)
    big_select: int = 0        # max big-rect Gaussians per view (0 = N//8)
    big_per_tile: int = 0      # unused since the fused payload sort (kept
    #                            for config compatibility; the combined
    #                            sort has no separate stream-B tile cap)
    # Inference-only: blend via lax.while_loop that STOPS once every pixel's
    # transmittance has died or every per-tile list is exhausted — exactly
    # CUDA's per-pixel early termination (forward.cu:341-351) lifted to the
    # chunk level.  The per-chunk attribute gather moves inside the loop, so
    # skipped chunks never touch HBM.  Bit-identical results (skipped
    # contributions are provably zero).  NOT reverse-differentiable
    # (lax.while_loop); training paths must keep the scan (False).
    early_exit: bool = False
    # rematerialize each view's rasterization in backward instead of saving
    # the blend intermediates (the reference's DeferredGaussianRender memory
    # trick, gs_core.py:949-1064, as a one-line remat policy)
    remat: bool = True
    # Pallas per-tile blend kernel (ops/blend_kernel.py): forward-path
    # replacement for the chunked XLA scan, 'auto' = on TPU backends.
    pallas_blend: str = "auto"   # 'auto' | 'on' | 'off'
    # Backward-pass blend: 'auto'/'on' = the analytic per-tile Pallas
    # kernel (blend_kernel._blend_bwd_kernel, the CUDA backward.cu
    # equivalent — per-candidate gradient rows + one deterministic
    # scatter-add, no scan recompute); 'off' = differentiate the
    # checkpointed XLA scan (bit-identical to JAX AD, slower).  'auto'
    # follows pallas_blend's decision.  Gradients agree to ~1e-5
    # (tests/test_rasterize.py::test_pallas_bwd_matches_scan_grads).
    pallas_bwd: str = "auto"     # 'auto' | 'on' | 'off'


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
    #   (an order[rank] element gather costs ~13 ms/view at 512^2, but
    #   moving the permutation to the blend's attribute matrix was measured
    #   WORSE: any ~1M-row gather costs 15-23 ms on v5e, and the [N, 10]
    #   f32 permutation is bigger than the int32 rank gather it replaces)
    mask: jnp.ndarray       # [T, K] bool
    overflow_tiles: jnp.ndarray      # [] int32: rect tiles beyond D
    overflow_gaussians: jnp.ndarray  # [] int32: per-tile entries beyond K
    entries: jnp.ndarray             # [] int32: total binned entries


def _emit_tile_rows(x0, y0, rw, area, valid, n_slots: int, slot0: int,
                    tiles_x: int, num_tiles: int,
                    start_x=None, start_y=None) -> jnp.ndarray:
    """[S, N] int32 tile ids for rect slots slot0..slot0+S (row-major walk
    within each rect), sentinel `num_tiles` for out-of-area/invalid slots.

    Slot-major layout keeps N on the TPU lane axis ([N, 16] arrays put a
    16-wide minor dim on the 128-lane registers).  Slot s maps to (s % rw, s // rw);
    integer div/mod by a runtime divisor lowers to ~30 VPU ops each, so an
    unrolled incremental walk (~2 ops/step) generates the offsets;
    `start_x/start_y` seed the walk when slot0 > 0 (split stream B).
    """
    safe_rw = jnp.maximum(rw, 1)
    ox = jnp.zeros_like(rw) if start_x is None else start_x
    oy = jnp.zeros_like(rw) if start_y is None else start_y
    rows = []
    for j in range(n_slots):
        ok = ((slot0 + j) < area) & valid
        rows.append(jnp.where(ok, (y0 + oy) * tiles_x + (x0 + ox), num_tiles))
        nx1 = ox + 1
        wrap = nx1 >= safe_rw
        ox = jnp.where(wrap, 0, nx1)
        oy = oy + wrap.astype(oy.dtype)
    return jnp.stack(rows, axis=0).astype(jnp.int32)


def _clip_rect_centered(pre: PreprocessedView, d_slots: int):
    """Shrink every rect with area > D to a <=D-tile window centered on the
    Gaussian's center tile (cfg.rect_clip='center').

    Proportional shrink: s = sqrt(D/area) scales both dims, then the height
    is adjusted so cw*ch <= D exactly.  The window is re-centered on the
    tile containing the projected mean and clamped inside the original
    rect, so the kept tiles carry the peak of the 2D Gaussian — the dropped
    tail beyond ~the window edge is the same KIND of truncation as the
    rasterizer's own 3-sigma radius cutoff, just tighter.  Rects with
    area <= D pass through untouched (bit-exact at trained statistics).

    Returns (pre with clipped rects, clipped_slots [] int32 — the slot mass
    removed, reported via overflow_tiles so the cap is never silent)."""
    rect = pre.rect
    x0, y0, x1, y1 = rect[:, 0], rect[:, 1], rect[:, 2], rect[:, 3]
    rw = x1 - x0
    rh = y1 - y0
    area = rw * rh
    over = pre.valid & (area > d_slots)
    s = jnp.sqrt(d_slots / jnp.maximum(area, 1).astype(jnp.float32))
    cw = jnp.clip((rw.astype(jnp.float32) * s).astype(jnp.int32),
                  1, jnp.minimum(rw, d_slots))
    ch = jnp.clip((rh.astype(jnp.float32) * s).astype(jnp.int32), 1, rh)
    ch = jnp.clip(jnp.minimum(ch, d_slots // cw), 1, rh)
    # center tile of the projected mean, clamped into the rect
    ctx = jnp.clip(jnp.floor(pre.xy[:, 0] / TILE).astype(jnp.int32),
                   x0, x1 - 1)
    cty = jnp.clip(jnp.floor(pre.xy[:, 1] / TILE).astype(jnp.int32),
                   y0, y1 - 1)
    nx0 = jnp.clip(ctx - cw // 2, x0, x1 - cw)
    ny0 = jnp.clip(cty - ch // 2, y0, y1 - ch)
    new_rect = jnp.stack([nx0, ny0, nx0 + cw, ny0 + ch], axis=-1)
    rect = jnp.where(over[:, None], new_rect, rect)
    clipped = jnp.sum(jnp.where(over, area - cw * ch, 0))
    return pre._replace(rect=rect), clipped


def _row_gather(arr: jnp.ndarray, starts: jnp.ndarray, cap: int, pad_val
                ) -> jnp.ndarray:
    """[T, cap] contiguous rows arr[starts[t] : starts[t]+cap].

    The per-tile candidate ranges are contiguous in the sorted key array,
    so a vmapped dynamic_slice (one DMA row per tile) replaces the flat
    element gather of T*K positions (measured ~23 -> ~3 ms per view at
    512^2).  `arr` is padded with `cap` sentinels so no slice clamps.
    """
    padded = jnp.concatenate([arr, jnp.full((cap,), pad_val, arr.dtype)])
    return jax.vmap(
        lambda s: jax.lax.dynamic_slice(padded, (s,), (cap,)))(starts)


def _depth_ranks(depth: jnp.ndarray) -> jnp.ndarray:
    """[N] int32 depth rank of every Gaussian (0 = nearest; ties by index,
    matching cub radix stability).  Two small N-element sorts instead of a
    scatter of the argsort (XLA scatter on TPU measured ~24 ms/M, sorts
    ~4 ms/M): the second sort inverts the permutation."""
    n = depth.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    _, order = jax.lax.sort((depth, idx), num_keys=1, is_stable=True)
    _, inv = jax.lax.sort((order, idx), num_keys=1, is_stable=True)
    return inv


def _sorted_stream_bounds(tile_rows: jnp.ndarray, ranks, rank_bits: int,
                          num_tiles: int):
    """Pack (tile, depth-rank) into ONE uint32 key, sort it together with
    an original-index payload, and recover per-tile [starts, counts].

    `tile_rows` is [S, N] (sentinel = num_tiles); `ranks` is [N] uint32
    depth ranks (unique, so an unstable single-key sort reproduces the
    stable (tile, depth) order).  Carrying the index as a sort payload is
    ~2x cheaper than a post-hoc order[rank] element gather: sorts stream
    sequentially through HBM while 1M-scale random gathers run at
    ~13-15 ms/view on v5e regardless of element size.

    Returns (key_sorted [S*N], idx_sorted [S*N], starts [T], counts [T]).
    """
    n = tile_rows.shape[1]
    key = ((tile_rows.astype(jnp.uint32) << rank_bits)
           | ranks[None, :]).reshape(-1)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :],
                           tile_rows.shape).reshape(-1)
    key_s, idx_s = jax.lax.sort((key, idx), num_keys=1, is_stable=False)
    tids = jnp.arange(num_tiles + 1, dtype=jnp.uint32) << rank_bits
    bounds = jnp.searchsorted(key_s, tids, side="left").astype(jnp.int32)
    return key_s, idx_s, bounds[:-1], bounds[1:] - bounds[:-1]


class FusedBins(NamedTuple):
    """Binning output with the candidate ATTRIBUTE rows already in per-tile
    layout — the blend's [T, K, 10] random row gather (measured ~8-10
    ms/view at 512^2, latency-bound regardless of index order,
    tools/bench_gather.py) never happens on the payload-sort path."""

    g: jnp.ndarray        # [T, Kp, 10] f32 rows, depth-sorted, zero-padded
    idxm: jnp.ndarray     # [T, Kp] int32 source Gaussian (sentinel N)
    counts: jnp.ndarray   # [T] int32 live candidates (<= K)
    overflow_tiles: jnp.ndarray      # [] int32: rect tiles beyond D
    overflow_gaussians: jnp.ndarray  # [] int32: per-tile entries beyond K
    entries: jnp.ndarray             # [] int32: total binned entries


def _fused_bin_payload(packed, depth, rect, valid, tiles_x: int,
                       tiles_y: int, cfg: RasterizeConfig) -> FusedBins:
    """Combined-stream 3-key binning.

    ONE `lax.sort((tile, depth_bits, idx), num_keys=3)` orders every slot
    record of both streams — stream A = the first S slots of ALL N
    Gaussians, stream B = slots S..D of the `big_select` big-rect
    Gaussians.  Positive-float depth bits sort identically to depth as
    uint32, and idx as the third key reproduces the CUDA stable radix
    tie-break exactly, so this replaces BOTH of round 3's per-stream
    rank-packed sorts AND their [T, K + k_big] rank merge AND the
    depth-rank pre-sorts (`_depth_ranks`, two stable N-row passes) with
    one call over N*S + M*(D-S) rows.

    Measured dead end recorded for posterity: carrying the 10 attribute
    columns as sort payload to skip the blend's row gather LOSES — sort
    cost is ~3.2 ms/operand at 4M rows on v5e (a 12-operand sort is 38 ms
    vs the ~8 ms gather it would replace; the earlier "payload is free"
    reading came from XLA DCE-ing unused sort outputs in the bench).  The
    single [T, Kp] row gather stays — it is the one unavoidable ~1M-row
    permutation (~8 ms, latency-bound regardless of index order or
    element size, tools/bench_gather.py).
    """
    n = depth.shape[0]
    d_slots = cfg.max_tiles_per_gaussian
    s_slots = cfg.split_slots
    num_tiles = tiles_x * tiles_y
    K = cfg.max_per_tile
    kp = -(-K // 128) * 128
    m_big = min(cfg.big_select or max(1, n // 8), n)

    x0, y0 = rect[:, 0], rect[:, 1]
    rw = rect[:, 2] - x0
    rh = rect[:, 3] - y0
    area = rw * rh

    # --- stream A: slots [0, S) for all N --------------------------------
    tile_a = _emit_tile_rows(x0, y0, rw, area, valid, s_slots, 0,
                             tiles_x, num_tiles)           # [S, N]

    # --- stream B: slots [S, D) of the selected big-rect Gaussians -------
    is_big = valid & (area > s_slots)
    _, big_idx = jax.lax.sort(
        ((~is_big).astype(jnp.int32), jnp.arange(n, dtype=jnp.int32)),
        num_keys=1, is_stable=True)
    n_big = jnp.sum(is_big.astype(jnp.int32))
    big_idx = big_idx[:m_big]                              # [M] orig indices
    sel_ok = jnp.arange(m_big, dtype=jnp.int32) < n_big
    area_b = area[big_idx]
    rw_b = jnp.maximum(rw[big_idx], 1)
    tile_b = _emit_tile_rows(x0[big_idx], y0[big_idx], rw_b, area_b, sel_ok,
                             d_slots - s_slots, s_slots, tiles_x, num_tiles,
                             start_x=s_slots % rw_b, start_y=s_slots // rw_b)

    # --- ONE 3-key sort over both streams ---------------------------------
    # near-cull guarantees valid depths > 0, whose IEEE bits are monotone
    # as uint32; invalid slots carry the sentinel tile and sort last anyway
    dbits = jax.lax.bitcast_convert_type(depth, jnp.uint32)

    def flat(rows_a, rows_b):
        return jnp.concatenate([
            jnp.broadcast_to(rows_a[None, :], tile_a.shape).reshape(-1),
            jnp.broadcast_to(rows_b[None, :], tile_b.shape).reshape(-1)])

    tile_f = jnp.concatenate([tile_a.reshape(-1), tile_b.reshape(-1)])
    key_t, _, idx_s = jax.lax.sort(
        (tile_f, flat(dbits, dbits[big_idx]),
         flat(jnp.arange(n, dtype=jnp.int32), big_idx)),
        num_keys=3, is_stable=False)

    tids = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    bounds = jnp.searchsorted(key_t, tids, side="left").astype(jnp.int32)
    starts, counts_raw = bounds[:-1], bounds[1:] - bounds[:-1]

    # --- contiguous per-tile index recovery + the one row gather ----------
    im = _row_gather(idx_s, starts, kp, jnp.int32(n))      # [T, Kp]
    counts = jnp.minimum(counts_raw, K)
    live = jnp.arange(kp, dtype=jnp.int32)[None, :] < counts[:, None]
    im = jnp.where(live, im, n)
    packed_pad = jax.lax.optimization_barrier(
        jnp.pad(packed, ((0, 1), (0, 0))))                 # sentinel row N
    g = packed_pad[im]                                     # [T, Kp, 10]

    # --- diagnostics (exact, never silent) --------------------------------
    entries = jnp.sum(counts_raw)
    overflow_gaussians = jnp.sum(jnp.maximum(counts_raw - K, 0))
    # tile slots lost: rects beyond D (as single-stream) + slots S..D of
    # big Gaussians that did not fit in the big_select capacity
    unselected_loss = jnp.sum(
        jnp.where(is_big, jnp.minimum(area, d_slots) - s_slots, 0)
    ) - jnp.sum(jnp.where(sel_ok, jnp.minimum(area_b, d_slots) - s_slots, 0))
    overflow_tiles = jnp.sum(
        jnp.where(valid, jnp.maximum(area - d_slots, 0), 0)
    ) + unselected_loss
    return FusedBins(g=g, idxm=im, counts=counts,
                     overflow_tiles=overflow_tiles,
                     overflow_gaussians=overflow_gaussians, entries=entries)


def _fused_bin_fallback(packed, pre: PreprocessedView, tiles_x: int,
                        tiles_y: int, cfg: RasterizeConfig) -> FusedBins:
    """Exact single-stream binning + the row gather, in FusedBins form
    (the payload path's cond partner for init-statistics populations)."""
    bins = _bin_tiles_single(pre, tiles_x, tiles_y, cfg)
    g, counts, im = _prep_pallas_inputs(packed, bins.idx, bins.mask)
    return FusedBins(g=g, idxm=im, counts=counts,
                     overflow_tiles=bins.overflow_tiles,
                     overflow_gaussians=bins.overflow_gaussians,
                     entries=bins.entries)


def fused_bin(packed, pre: PreprocessedView, tiles_x: int, tiles_y: int,
              cfg: RasterizeConfig) -> FusedBins:
    """Bin + candidate-row materialization in one step (gradient-free; see
    `attach_rows` for the differentiable seam).

    With cfg.split_slots > 0 an adaptive guard keeps the payload sort safe
    for TRAINING, where early steps have init statistics with E[rect area]
    ~ 100 tiles: when the big-rect census exceeds stream B's selection
    capacity, the exact single-stream sort runs for this view instead.
    Both branches trace (compile cost), execution picks per view by the
    actual population, so a config can leave split_slots: 2 on for a whole
    run: init-stats steps ride the fallback, converged steps get the
    payload-sort win (~2x bin AND no blend gather).
    """
    n = pre.depth.shape[0]
    d_slots = cfg.max_tiles_per_gaussian
    packed = jax.lax.stop_gradient(packed)
    pre = jax.tree.map(jax.lax.stop_gradient, pre)
    # NB: no 32-bit key-packing constraint here — the payload path's 3-key
    # sort carries (tile, depth-bits, idx) as separate operands; only
    # _bin_tiles_single's packed-key fast path checks bit budgets.
    if 0 < cfg.split_slots < d_slots:
        x0t, y0t = pre.rect[:, 0], pre.rect[:, 1]
        area_t = (pre.rect[:, 2] - x0t) * (pre.rect[:, 3] - y0t)
        n_big = jnp.sum((pre.valid & (area_t > cfg.split_slots))
                        .astype(jnp.int32))
        m_big = min(cfg.big_select or max(1, n // 8), n)
        return jax.lax.cond(
            n_big <= m_big,
            lambda pk, pr: _fused_bin_payload(pk, pr.depth, pr.rect,
                                              pr.valid, tiles_x, tiles_y,
                                              cfg),
            lambda pk, pr: _fused_bin_fallback(pk, pr, tiles_x, tiles_y,
                                               cfg),
            packed, pre)
    return _fused_bin_fallback(packed, pre, tiles_x, tiles_y, cfg)


@functools.lru_cache(maxsize=None)
def _make_attach(n: int):
    """The differentiable seam between binning and blending.

    Forward: identity on the pre-materialized candidate rows `g0`.
    Backward: the deterministic scatter-add of the per-candidate gradient
    rows onto d_packed via the source-index map (the CUDA backward's
    atomicAdd, backward.cu:399-557, made deterministic) — exactly the VJP
    of `g0[t, k] = packed[idxm[t, k]]`, without ever re-running the
    binning sort: idxm arrives as an INPUT, so under `render`'s remat
    policy (which names g0/idxm as saved residuals) the backward pass
    recomputes nothing of the bin."""

    @jax.custom_vjp
    def attach(packed, g0, idxm):
        return g0

    def fwd(packed, g0, idxm):
        return g0, idxm

    def bwd(idxm, dg):
        import numpy as _np
        w = dg.shape[-1]
        d_packed = jnp.zeros((n + 1, w), dg.dtype).at[
            idxm.reshape(-1)].add(dg.reshape(-1, w))[:n]
        return (d_packed, jnp.zeros_like(dg),
                _np.zeros(idxm.shape, jax.dtypes.float0))

    attach.defvjp(fwd, bwd)
    return attach


def attach_rows(packed, g0, idxm):
    """g = packed rows in per-tile order (value: `g0`; gradient: scatter).

    INVARIANT: `g0` must be gradient-free (every caller materializes it
    under stop_gradient via `fused_bin`) — its cotangent is discarded and
    the full gradient is scattered onto `packed` through `idxm`.  A caller
    passing a differentiable g0 would silently lose that gradient path."""
    return _make_attach(packed.shape[0])(packed, g0, idxm)


def bin_tiles(pre: PreprocessedView, tiles_x: int, tiles_y: int,
              cfg: RasterizeConfig) -> TileBins:
    """Sort-based tile binning (rasterizer_impl.cu duplicateWithKeys +
    radix sort + identifyTileRanges, :70-138, 277-314).

    Static-shape version: every Gaussian emits D = max_tiles_per_gaussian
    (tile_id, depth, idx) records (invalid ones get sentinel tile T), one
    stable lexicographic sort orders them, searchsorted recovers per-tile
    ranges, and a static K-capacity gather yields [T, K] candidate lists.

    This is the index-only API (always single-stream); `render` rides
    `fused_bin`, whose payload-sort path also materializes the attribute
    rows and so never pays the blend's candidate gather.
    """
    return _bin_tiles_single(pre, tiles_x, tiles_y, cfg)


def _bin_tiles_single(pre: PreprocessedView, tiles_x: int, tiles_y: int,
                      cfg: RasterizeConfig) -> TileBins:
    """Single-stream N*D-key binning (the exact baseline path)."""
    n = pre.depth.shape[0]
    d_slots = cfg.max_tiles_per_gaussian
    num_tiles = tiles_x * tiles_y
    rank_bits = max(1, (n - 1).bit_length())
    tile_bits = (num_tiles + 1 - 1).bit_length()

    # Emit tile rows from the ORIGINAL (unsorted) arrays — no gathers; the
    # CUDA (tile, depth-bits) radix order is reproduced by packing each
    # Gaussian's depth RANK (computed with two small sorts) into the key.
    x0, y0 = pre.rect[:, 0], pre.rect[:, 1]
    rw = pre.rect[:, 2] - x0
    rh = pre.rect[:, 3] - y0
    area = rw * rh
    overflow_tiles = jnp.sum(
        jnp.where(pre.valid, jnp.maximum(area - d_slots, 0), 0))

    tile_rows = _emit_tile_rows(x0, y0, rw, area, pre.valid, d_slots, 0,
                                tiles_x, num_tiles)        # [D, N]
    inv = _depth_ranks(pre.depth)                          # [N]

    k = jnp.arange(cfg.max_per_tile, dtype=jnp.int32)
    if rank_bits + tile_bits <= 32:
        # ONE uint32 (tile << bits | rank) key + an index payload: same
        # order as a stable (tile, depth) sort (ranks are unique), at a
        # fraction of the data movement, and the payload removes the
        # order[rank] element gather entirely.
        _, idx_s, starts, counts = _sorted_stream_bounds(
            tile_rows, inv.astype(jnp.uint32), rank_bits, num_tiles)
        idx_mat = _row_gather(idx_s, starts, cfg.max_per_tile,
                              jnp.int32(0))                # [T, K]
    else:  # shapes too large for 32-bit packing: two-key sort
        bcast = lambda a: jnp.broadcast_to(a[None, :],
                                           (d_slots, n)).reshape(-1)
        tile_s, _, idx_s = jax.lax.sort(
            (tile_rows.reshape(-1), bcast(inv),
             bcast(jnp.arange(n, dtype=jnp.int32))), num_keys=2,
            is_stable=False)
        tids = jnp.arange(num_tiles + 1, dtype=jnp.int32)
        bounds = jnp.searchsorted(tile_s, tids, side="left").astype(jnp.int32)
        starts, counts = bounds[:-1], bounds[1:] - bounds[:-1]
        idx_mat = _row_gather(idx_s, starts, cfg.max_per_tile,
                              jnp.int32(0))                # [T, K]

    entries = jnp.sum(counts)
    overflow_gaussians = jnp.sum(jnp.maximum(counts - cfg.max_per_tile, 0))
    mask = k[None, :] < jnp.minimum(counts, cfg.max_per_tile)[:, None]
    return TileBins(idx=idx_mat, mask=mask, overflow_tiles=overflow_tiles,
                    overflow_gaussians=overflow_gaussians, entries=entries)


def _blend_chunk(pix, carry, chunk_in):
    """One depth chunk of the blend scan (forward.cu:261-374 semantics).
    Layout: pixels on the last (lane) axis — [T, kc, ppt]; the cumulative
    transmittance runs along the kc (sublane) axis."""
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


def _blend_scan_core(g_all, mask, tiles_x: int, tiles_y: int,
                     cfg: RasterizeConfig):
    """Differentiable chunked-scan blend core over pre-materialized
    candidate rows g_all [T, Kp, 10].  Returns the per-tile accumulators
    (t_fin [T,ppt], acc_c [T,ppt,3], acc_d [T,ppt])."""
    num_tiles = tiles_x * tiles_y
    ppt = TILE * TILE
    kc = cfg.blend_chunk
    K = g_all.shape[1]
    assert K % kc == 0, "padded K must be divisible by blend_chunk"
    n_chunks = K // kc
    pix = _tile_pixel_centers(tiles_x, tiles_y)
    chunks = jax.tree.map(
        lambda x: x.reshape(num_tiles, n_chunks, kc, *x.shape[2:])
                   .swapaxes(0, 1),
        (g_all[..., 0:2], g_all[..., 2:5], g_all[..., 5:8],
         g_all[..., 8], g_all[..., 9], mask))
    init = (jnp.ones((num_tiles, ppt), jnp.float32),
            jnp.zeros((num_tiles, ppt), bool),
            jnp.zeros((num_tiles, ppt, 3), jnp.float32),
            jnp.zeros((num_tiles, ppt), jnp.float32))
    # checkpoint the chunk body: backward recomputes the [T, kc, ppt]
    # blend intermediates per chunk instead of saving all n_chunks
    (t_fin, _, acc_c, acc_d), _ = jax.lax.scan(
        jax.checkpoint(functools.partial(_blend_chunk, pix),
                       prevent_cse=False), init, chunks)
    return t_fin, acc_c, acc_d


def _tile_pixel_centers(tiles_x: int, tiles_y: int) -> jnp.ndarray:
    """[T, ppt, 2] integer pixel coords per tile (pixf, forward.cu:283)."""
    num_tiles = tiles_x * tiles_y
    ppt = TILE * TILE
    t_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    t_origin = jnp.stack([(t_ids % tiles_x) * TILE, (t_ids // tiles_x) * TILE],
                         axis=-1).astype(jnp.float32)       # [T, 2]
    lp = jnp.arange(ppt, dtype=jnp.int32)
    local = jnp.stack([lp % TILE, lp // TILE], axis=-1).astype(jnp.float32)
    return t_origin[:, None, :] + local[None, :, :]         # [T, ppt, 2]


def _prep_pallas_inputs(packed, idx, mask):
    """Gather the per-tile candidate rows for the Pallas blend kernels.
    Returns (g [T, Kp, 10], counts [T], idxm [T, Kp]).

    Mask-fold and K->Kp padding are folded INTO the gather indices: the
    candidate table gets one all-zero sentinel row at index N and every
    masked/padded slot points at it.  A zero attribute row blends to
    nothing (opacity 0 < ALPHA_MIN -> CUDA skip, forward.cu:345), so the
    kernels need no separate mask pass — this removes two full [T, Kp, 10]
    elementwise round-trips (mask-fold concat + pad) that used to follow
    the gather, and the returned idxm doubles as the deterministic
    scatter-add target map for the analytic backward.

    The barrier forces `packed` (a concat of 7 preprocess outputs) to
    materialize as one [N+1, 10] array BEFORE the row gather — otherwise
    XLA fuses the concat into the gather, multiplying the random-access
    passes (measured: the isolated gather from a materialized table runs
    ~1-2 ms vs ~9 ms in context at 512^2/K=1024, tools/bench_gather.py)."""
    n = packed.shape[0]
    packed = jax.lax.optimization_barrier(
        jnp.pad(packed, ((0, 1), (0, 0))))                  # sentinel row N
    K = idx.shape[1]
    kp = -(-K // 128) * 128
    idxm = jnp.where(mask, idx, n)
    if kp != K:
        idxm = jnp.pad(idxm, ((0, 0), (0, kp - K)), constant_values=n)
    g = packed[idxm]                                        # [T, Kp, 10]
    # chunk-level early exit wants the index one past the LAST set mask bit
    # (robust even if the mask is not a contiguous prefix)
    any_m = mask.any(axis=1)
    last = K - jnp.argmax(mask[:, ::-1].astype(jnp.int32), axis=1)
    counts = jnp.where(any_m, last, 0).astype(jnp.int32)
    return g, counts, idxm


def _counts_mask(counts, kp: int):
    return (jnp.arange(kp, dtype=jnp.int32)[None, :]
            < counts[:, None])                          # [T, Kp]


@functools.lru_cache(maxsize=None)
def _make_blend_core(cfg: RasterizeConfig, tiles_x: int, tiles_y: int,
                     interpret: bool = False):
    """custom_vjp blend core over pre-materialized rows (g, counts):
    primal = Pallas kernel; backward = the analytic Pallas kernel
    (pallas_bwd 'auto'/'on', the CUDA backward.cu:399-557 equivalent,
    returning the per-candidate gradient rows d_g — the scatter back onto
    d_packed lives in `attach_rows`) or JAX AD of the checkpointed XLA
    scan ('off', bit-identical reference)."""
    import numpy as _np

    use_bwd_kernel = cfg.pallas_bwd != "off"

    @jax.custom_vjp
    def core(g, counts):
        from .blend_kernel import blend_tiles_pallas
        return blend_tiles_pallas(g, counts, tiles_x, interpret=interpret)

    if use_bwd_kernel:
        from .blend_kernel import PPT, blend_bwd_pallas, blend_tiles_pallas

        def fwd(g, counts):
            t_fin, acc_c, acc_d = blend_tiles_pallas(
                g, counts, tiles_x, interpret=interpret)
            return (t_fin, acc_c, acc_d), (g, counts, t_fin, acc_c, acc_d)

        def bwd(res, cot):
            g, counts, t_fin, acc_c, acc_d = res
            d_tfin, d_accc, d_accd = cot
            T = g.shape[0]

            def pack8(c3, s1, s2):                      # -> [T, 8, PPT]
                return jnp.concatenate(
                    [c3.transpose(0, 2, 1), s1[:, None, :], s2[:, None, :],
                     jnp.zeros((T, 3, PPT), jnp.float32)], axis=1)

            fo = pack8(acc_c, t_fin, acc_d)
            ct = pack8(d_accc, d_tfin, d_accd)
            dg = blend_bwd_pallas(g, counts, fo, ct, tiles_x,
                                  interpret=interpret)
            return dg, _np.zeros(counts.shape, jax.dtypes.float0)
    else:
        def fwd(g, counts):
            out, vjp_fn = jax.vjp(
                lambda gg: _blend_scan_core(
                    gg, _counts_mask(counts, gg.shape[1]), tiles_x,
                    tiles_y, cfg), g)
            return out, (vjp_fn, counts)

        def bwd(res, cot):
            vjp_fn, counts = res
            return (vjp_fn(cot)[0],
                    _np.zeros(counts.shape, jax.dtypes.float0))

    core.defvjp(fwd, bwd)
    return core


def blend_tiles(pre: PreprocessedView, bins: TileBins, tiles_x: int,
                tiles_y: int, bg: jnp.ndarray, cfg: RasterizeConfig
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Index-based blending API: gathers the candidate rows from a packed
    [N, 10] attribute matrix (ONE row gather; 5 separate gathers measured
    ~3.5x slower on TPU), then blends via `blend_tiles_g`.  `render` rides
    the gather-free `fused_bin` path instead."""
    packed = jnp.concatenate(
        [pre.xy, pre.conic, pre.color, pre.opacity[:, None],
         pre.depth[:, None]], axis=-1)
    g0, counts, idxm = _prep_pallas_inputs(
        jax.lax.stop_gradient(packed), bins.idx, bins.mask)
    g = attach_rows(packed, g0, idxm)
    return blend_tiles_g(g, counts, tiles_x, tiles_y, bg, cfg)


def blend_tiles_g(g_rows: jnp.ndarray, counts: jnp.ndarray, tiles_x: int,
                  tiles_y: int, bg: jnp.ndarray, cfg: RasterizeConfig
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Front-to-back alpha blending per tile (forward.cu renderCUDA:261-374)
    over pre-materialized candidate rows g_rows [T, Kp, 10] (depth-sorted,
    zero rows beyond counts[t] — a zero row blends to nothing since its
    opacity 0 < ALPHA_MIN is a CUDA skip, forward.cu:345).

    Three interchangeable cores: the per-tile Pallas kernel (TPU forward
    default — intermediates stay in VMEM), a chunked lax.scan (the
    differentiable reference the kernel's custom_vjp routes gradients
    through), and a while_loop variant with chunk-level early exit.  Within
    each depth chunk the transmittance product is an (exclusive) cumprod
    and the early-stop a cumulative-or, parallel over [tiles, pixels, chunk].

    Returns (color [Hp, Wp, 3], alpha [Hp, Wp], depth [Hp, Wp]) where
    Hp = tiles_y*TILE, Wp = tiles_x*TILE (crop to h, w at the caller).
    """
    num_tiles = tiles_x * tiles_y
    ppt = TILE * TILE
    kc = cfg.blend_chunk
    K = g_rows.shape[1]
    assert K % kc == 0, "padded K must be divisible by blend_chunk"
    # Materialize the candidate rows before blending: the Pallas kernel
    # needs them as a real buffer anyway, and the barrier keeps the blend
    # bit-identical regardless of which bin path (payload sort vs gather)
    # produced them — without it XLA fuses the differing producers into
    # the (interpret-mode) blend and reassociates f32 math differently.
    g_rows = jax.lax.optimization_barrier(g_rows)

    use_pallas = cfg.pallas_blend == "on" or (
        cfg.pallas_blend == "auto" and jax.default_backend() == "tpu")
    if use_pallas:
        # 'on' on a non-TPU backend runs the kernel interpreted (tests)
        interp = jax.default_backend() != "tpu"
        t_fin, acc_c, acc_d = _make_blend_core(cfg, tiles_x, tiles_y,
                                               interpret=interp)(
            g_rows, counts)
    elif cfg.early_exit:
        # Chunk-level CUDA early termination (forward.cu:341-351): stop as
        # soon as every pixel is saturated or every tile list is exhausted.
        chunk = functools.partial(_blend_chunk,
                                  _tile_pixel_centers(tiles_x, tiles_y))
        n_chunks = K // kc
        mask = _counts_mask(counts, K)
        init = (jnp.ones((num_tiles, ppt), jnp.float32),
                jnp.zeros((num_tiles, ppt), bool),
                jnp.zeros((num_tiles, ppt, 3), jnp.float32),
                jnp.zeros((num_tiles, ppt), jnp.float32))

        def slice_chunk(arr, c, width):
            return jax.lax.dynamic_slice(
                arr, (0, c * kc) + (0,) * (arr.ndim - 2),
                (num_tiles, width) + arr.shape[2:])

        def cond(carry):
            c, _, dead, _, _ = carry
            cc = jnp.minimum(c, n_chunks - 1)
            m = slice_chunk(mask, cc, kc)                   # [T, kc]
            tile_alive = ~jnp.all(dead, axis=1)             # [T]
            return (c < n_chunks) & jnp.any(jnp.any(m, axis=1) & tile_alive)

        def body(carry):
            c, t_run, dead, acc_c, acc_d = carry
            g = slice_chunk(g_rows, c, kc)                  # [T, kc, 10]
            m_c = slice_chunk(mask, c, kc)
            state, _ = chunk((t_run, dead, acc_c, acc_d),
                             (g[..., 0:2], g[..., 2:5], g[..., 5:8],
                              g[..., 8], g[..., 9], m_c))
            return (c + 1,) + state

        _, t_fin, _, acc_c, acc_d = jax.lax.while_loop(
            cond, body, (jnp.int32(0),) + init)
    else:
        t_fin, acc_c, acc_d = _blend_scan_core(
            g_rows, _counts_mask(counts, K), tiles_x, tiles_y, cfg)

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
    # Materialize the preprocess outputs once: without the barrier XLA
    # fuses this math into whichever bin path consumes it, and the two
    # paths' different fusion contexts round pre/packed differently —
    # breaking the payload-vs-gather bit-exactness guarantee.
    pre = jax.lax.optimization_barrier(pre)
    if cfg.rect_clip == "center":
        pre, clipped_slots = _clip_rect_centered(
            pre, cfg.max_tiles_per_gaussian)
    else:
        clipped_slots = jnp.zeros((), jnp.int32)
    packed = jnp.concatenate(
        [pre.xy, pre.conic, pre.color, pre.opacity[:, None],
         pre.depth[:, None]], axis=-1)                      # [N, 10]
    fb = fused_bin(packed, pre, tiles_x, tiles_y, cfg)
    fb = fb._replace(overflow_tiles=fb.overflow_tiles + clipped_slots)
    # name the bin outputs so the remat policy in render() keeps them as
    # residuals — backward then skips the re-sort (and, on the payload
    # path, never materializes a gather at all: attach_rows' bwd scatters
    # straight from the saved idxm)
    from jax.ad_checkpoint import checkpoint_name
    g0 = checkpoint_name(fb.g, "raster_g")
    idxm = checkpoint_name(fb.idxm, "raster_bins_idx")
    counts = checkpoint_name(fb.counts, "raster_bins_counts")
    g = attach_rows(packed, g0, idxm)
    color, alpha, depth = blend_tiles_g(g, counts, tiles_x, tiles_y, bg, cfg)
    return (color[:h, :w], alpha[:h, :w], depth[:h, :w],
            fb.overflow_tiles, fb.overflow_gaussians, fb.entries)


@functools.partial(jax.jit, static_argnames=("h", "w"))
def mark_visible(xyz: jnp.ndarray, c2w: jnp.ndarray, fxfycxcy: jnp.ndarray,
                 h: int, w: int) -> jnp.ndarray:
    """[N] bool frustum-visibility mask per view — the CUDA binding's
    `GaussianRasterizer.markVisible` (diff_gaussian_rasterization/
    __init__.py:208-221, in_frustum auxiliary.h): view-space z above the
    near-cull plane.  xyz [N, 3]; c2w [V, 4, 4]; returns [V, N]."""
    cams = cam_lib.make_camera(c2w, fxfycxcy, h, w)
    px, py, pz = xyz[:, 0], xyz[:, 1], xyz[:, 2]

    def one(w2c):
        depth = w2c[2, 0] * px + w2c[2, 1] * py + w2c[2, 2] * pz + w2c[2, 3]
        return depth > NEAR_CULL_Z
    return jax.vmap(one)(cams.w2c)


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
                    "raster_g", "raster_bins_idx", "raster_bins_counts"))
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
