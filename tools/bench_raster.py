"""Rasterizer phase microbenchmark on the current backend (TPU by default).

Times, per view at a given resolution, the three phases of the tile
rasterizer (ops/rasterize.py): preprocess (project/EWA/SH), bin (duplicate +
sort + range recovery), and blend — plus the full multi-view render().
Synthesizes a pixel-aligned Gaussian population with the same statistics the
flagship denoiser emits at init (scale ~ exp(-2.3), opacity ~ sigmoid(-2)),
matching what bench.py exercises.

Usage:  python tools/bench_raster.py [--res 512] [--views 4] [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from open_diffusiongs_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
import jax.numpy as jnp
import numpy as np


def synth_gaussians(n: int, rng: np.random.Generator, stats: str = "init",
                    res: int = 512):
    """Two measured populations (docs/CAPACITY.md):

    init:    what the random-init denoiser head emits (scale exp(-2.3),
             opacity sigmoid(-2) ~ 0.12) — huge rects (~100 tiles), weak
             saturation.  This is what bench.py's random-weights model
             produces.
    trained: what converged pixel-aligned checkpoints emit — a surface
             shell, screen-space size ~1.5 px (world scale = px * depth/f
             at the orbit camera), opacity ~ sigmoid(1.0) = 0.73.  Rect
             areas 1-4 tiles, front surface saturates transmittance in
             ~10-20 entries.
    """
    from open_diffusiongs_tpu.ops.gaussians import Gaussians
    if stats == "trained":
        # points on a noisy shell of radius ~0.45 (inside the crop box)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True) + 1e-9
        r = (0.45 + 0.04 * rng.normal(size=(n, 1))).astype(np.float32)
        xyz = d * r
        f = 0.5 * res / np.tan(np.radians(40.0) / 2)     # orbit camera focal
        world_px = 3.0 / f                               # depth ~ radius 3
        scaling = (np.log(1.5 * world_px)
                   + 0.3 * rng.normal(size=(n, 3))).astype(np.float32)
        opacity = (1.0 + 0.5 * rng.normal(size=(n, 1))).astype(np.float32)
    else:
        xyz = rng.uniform(-0.9, 0.9, size=(n, 3)).astype(np.float32)
        # raw (pre-activation) params, matching denoiser head init stats
        scaling = rng.normal(-2.3, 0.1, size=(n, 3)).astype(np.float32)
        opacity = rng.normal(-2.0, 0.3, size=(n, 1)).astype(np.float32)
    feats = rng.normal(0, 0.3, size=(n, 1, 3)).astype(np.float32)
    rotation = rng.normal(0, 1, size=(n, 4)).astype(np.float32)
    return Gaussians(
        xyz=jnp.asarray(xyz)[None], features=jnp.asarray(feats)[None],
        scaling=jnp.asarray(scaling)[None],
        rotation=jnp.asarray(rotation)[None],
        opacity=jnp.asarray(opacity)[None])


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))),
                 out)  # sync (relay-safe: fetch scalars)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.tree.map(lambda x: float(jnp.sum(x.astype(jnp.float32))), out)
    return (time.time() - t0) / iters


def loop_timed(make_fn, iters=20):
    """Time `make_fn` amortized inside one jitted lax.scan, dodging the
    ~20-30ms per-dispatch overhead of the axon relay.  make_fn(eps) must
    fold the f32 scalar `eps` into its inputs (eps==0.0 at runtime) so XLA
    cannot hoist the body out of the loop (0*x is NOT constant-folded —
    NaN/inf semantics)."""

    @jax.jit
    def run():
        def body(carry, _):
            out = make_fn(carry)
            leaves = [jnp.sum(x.astype(jnp.float32))
                      for x in jax.tree.leaves(out)]
            s = functools.reduce(lambda a, b: a + b, leaves)
            return 0.0 * s, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(run())  # compile + warm
    t0 = time.time()
    r = float(run())
    assert r == r, "NaN escaped the timing loop"
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--render-views", type=int, default=3)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--d", type=int, default=16)
    ap.add_argument("--k", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--split", type=int, default=0,
                    help="split_slots S for two-stream binning (0 = off)")
    ap.add_argument("--big-select", type=int, default=0)
    ap.add_argument("--big-per-tile", type=int, default=0)
    ap.add_argument("--early-exit", action="store_true")
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--stats", choices=("init", "trained"), default="init")
    ap.add_argument("--pallas", choices=("auto", "on", "off"), default="auto")
    ap.add_argument("--quick", action="store_true",
                    help="phases + full render only (skip sort microbenches)")
    args = ap.parse_args()

    from __graft_entry__ import _orbit_cameras
    from open_diffusiongs_tpu.ops import camera as cam_lib
    from open_diffusiongs_tpu.ops import gs_math, rasterize

    h = w = args.res
    n = args.views * h * w
    cfg = rasterize.RasterizeConfig(
        max_tiles_per_gaussian=args.d, max_per_tile=args.k,
        blend_chunk=args.chunk, split_slots=args.split,
        big_select=args.big_select, big_per_tile=args.big_per_tile,
        early_exit=args.early_exit, remat=not args.no_remat,
        pallas_blend=args.pallas)
    tiles_x = tiles_y = -(-w // rasterize.TILE)

    g = synth_gaussians(n, np.random.default_rng(0), stats=args.stats,
                        res=args.res)
    c2ws, fxy = _orbit_cameras(args.render_views, h=h, w=w)
    c2w = jnp.asarray(c2ws)[None]
    fxy = jnp.asarray(fxy)[None]

    act = jax.jit(lambda gg: rasterize.Gaussians(
        *[x[0] for x in gg]).activate())(tuple(g))
    cov3d = jax.jit(gs_math.build_cov3d)(act.scaling, act.rotation)
    cam = jax.tree.map(lambda x: x[0],
                       cam_lib.make_camera(c2w[0], fxy[0], h, w))

    pre_fn = jax.jit(lambda a, c3, cm: rasterize.preprocess_view(
        a, c3, cm, h, w, 0))
    pre = pre_fn(act, cov3d, cam)
    bin_fn = jax.jit(lambda p: rasterize.bin_tiles(p, tiles_x, tiles_y, cfg))
    bins = bin_fn(pre)
    bg = jnp.ones((3,), jnp.float32)
    blend_fn = jax.jit(lambda p, b: rasterize.blend_tiles(
        p, b, tiles_x, tiles_y, bg, cfg))

    render_fn = jax.jit(lambda gg, cw, fx: rasterize.render(
        rasterize.Gaussians(*gg), cw, fx, h, w, cfg=cfg))

    t_pre = loop_timed(
        lambda e: pre_fn(act._replace(xyz=act.xyz + e), cov3d, cam),
        iters=args.iters)
    t_bin = loop_timed(
        lambda e: bin_fn(pre._replace(depth=pre.depth + e)),
        iters=args.iters)
    t_blend = loop_timed(
        lambda e: blend_fn(pre._replace(xy=pre.xy + e), bins),
        iters=args.iters)

    # the [T, K, 10] candidate-row gather inside the blend, alone
    packed = jnp.concatenate(
        [pre.xy, pre.conic, pre.color, pre.opacity[:, None],
         pre.depth[:, None]], axis=-1)
    gather_fn = jax.jit(lambda pk, ix: pk[ix])
    t_gather = loop_timed(
        lambda e: gather_fn(packed + e, bins.idx), iters=args.iters)

    # the fused payload-sort bin (bin + candidate-row materialization in
    # one step — the gather-free path render() rides when split_slots > 0)
    def fused(p):
        pk = jnp.concatenate(
            [p.xy, p.conic, p.color, p.opacity[:, None],
             p.depth[:, None]], axis=-1)
        return rasterize.fused_bin(pk, p, tiles_x, tiles_y, cfg)
    fused_fn = jax.jit(fused)
    t_fusedbin = loop_timed(
        lambda e: fused_fn(pre._replace(depth=pre.depth + e)),
        iters=args.iters)

    if args.quick:
        t_depthsort = t_keysort = t_mkkeys = t_realsort = t_recover = 0.0
    else:
        # sub-phases of bin: the N-element depth pre-sort and the N*D key sort
        n_idx = jnp.arange(n, dtype=jnp.int32)
        t_depthsort = loop_timed(
            lambda e: jax.lax.sort((pre.depth + e, n_idx), num_keys=1,
                                   is_stable=True),
            iters=args.iters)
        key_demo = jnp.arange(n * args.d, dtype=jnp.uint32)
        t_keysort = loop_timed(
            lambda e: jax.lax.sort(key_demo ^ jnp.uint32(e), is_stable=False),
            iters=args.iters)

        # bin-internal breakdown: key construction (rect -> [D, N] tile rows ->
        # packed keys) vs sorting the REAL keys vs range-recovery+gather
        rank_bits = max(1, (n - 1).bit_length())
        num_tiles = tiles_x * tiles_y

        def make_keys(p):
            d_slots = cfg.max_tiles_per_gaussian
            _, order = jax.lax.sort(
                (p.depth, jnp.arange(n, dtype=jnp.int32)), num_keys=1,
                is_stable=True)
            rect_d = p.rect[order]
            x0, y0 = rect_d[:, 0], rect_d[:, 1]
            rw = rect_d[:, 2] - x0
            rh = rect_d[:, 3] - y0
            tile_rows = rasterize._emit_tile_rows(
                x0, y0, rw, rw * rh, p.valid[order], d_slots, 0, tiles_x,
                num_tiles)
            rank = jnp.arange(n, dtype=jnp.uint32)
            key = ((tile_rows.astype(jnp.uint32) << rank_bits)
                   | rank[None, :]).reshape(-1)
            return key, order

        keys_fn = jax.jit(make_keys)
        real_key, order_v = keys_fn(pre)
        t_mkkeys = loop_timed(
            lambda e: keys_fn(pre._replace(depth=pre.depth + e))[0],
            iters=args.iters)
        t_realsort = loop_timed(
            lambda e: jax.lax.sort(real_key ^ jnp.uint32(e), is_stable=False),
            iters=args.iters)
        key_sorted = jax.jit(lambda kk: jax.lax.sort(kk, is_stable=False))(
            real_key)

        def recover(kk, order_):
            tids = jnp.arange(num_tiles + 1, dtype=jnp.uint32) << rank_bits
            bounds = jnp.searchsorted(kk, tids, side="left").astype(jnp.int32)
            key_g = rasterize._row_gather(kk, bounds[:-1], cfg.max_per_tile,
                                          jnp.uint32(0xFFFFFFFF))
            rank_g = (key_g & jnp.uint32((1 << rank_bits) - 1)).astype(jnp.int32)
            return order_[jnp.minimum(rank_g, n - 1)]

        rec_fn = jax.jit(recover)
        t_recover = loop_timed(
            lambda e: rec_fn(key_sorted ^ jnp.uint32(e), order_v),
            iters=args.iters)

    t_full = timed(render_fn, tuple(g), c2w, fxy, iters=max(3, args.iters // 4))

    ov_t = int(bins.overflow_tiles)
    ov_g = int(bins.overflow_gaussians)
    mg_s = n * args.render_views / t_full / 1e6
    print(json.dumps({
        "res": args.res, "n_gaussians": n, "D": args.d, "K": args.k,
        "stats": args.stats, "split": args.split,
        "early_exit": args.early_exit, "pallas": args.pallas,
        "overflow_frac": round(ov_g / max(int(bins.entries), 1), 4),
        "preprocess_ms": round(t_pre * 1e3, 2),
        "bin_ms": round(t_bin * 1e3, 2),
        "blend_ms": round(t_blend * 1e3, 2),
        "gather_ms": round(t_gather * 1e3, 2),
        "fused_bin_ms": round(t_fusedbin * 1e3, 2),
        "depth_presort_ms": round(t_depthsort * 1e3, 2),
        "key_sort_ms": round(t_keysort * 1e3, 2),
        "make_keys_ms": round(t_mkkeys * 1e3, 2),
        "real_key_sort_ms": round(t_realsort * 1e3, 2),
        "recover_gather_ms": round(t_recover * 1e3, 2),
        "render_full_ms": round(t_full * 1e3, 2),
        "render_views": args.render_views,
        "mgaussians_per_s": round(mg_s, 1),
        "overflow_tiles": ov_t, "overflow_gaussians": ov_g,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
