"""Gradient fidelity of the rasterizer capacity policy (docs/CAPACITY.md).

Forward-PSNR-vs-K (tests/test_overflow_accuracy.py) misses the training
question: dropped candidates get ZERO gradient, and the r4 'first-D-tiles'
rect policy gave geometrically WRONG gradients at init statistics
(docs/CONVERGENCE.md).  This tool measures, against an exact no-drop oracle
(D = num_tiles, K >= N):

  * cosine similarity of d(loss)/d(field) for xyz/scaling/opacity/features,
  * the fraction of Gaussians receiving zero gradient,

for (rect_clip, D, K) combos on two populations at flagship-like occupancy:

  * init:    the statistics the flagship denoiser emits at step 0
             (scaling ~ -2.3, opacity raw ~ -2.0 -> 0.12, points spread
             along camera rays over depth o.d +- 1.8 — footprints of
             tens-to-hundreds of tiles),
  * trained: compact surface shell (scale ~1.5 px, opacity ~0.73).

Usage: python tools/bench_capacity_grads.py [--n 16384] [--res 256]
Writes outputs/bench/capacity_grads.json and prints a table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_population(rng: np.random.Generator, n: int, mode: str, dis: float):
    from open_diffusiongs_tpu.ops.gaussians import Gaussians
    if mode == "init":
        # flagship denoiser at init: xyz = ray_o + depth*ray_d with depth
        # in o.d +- 1.8 -> points spread through a ~1.8-radius ball biased
        # along view rays; scaling raw ~ N(-2.3, .05) (exp -> 0.1 world
        # units), opacity raw ~ N(-2.0, .05) (sigmoid -> 0.12)
        xyz = rng.normal(0, 0.9, (n, 3)) * np.asarray([1, 1, 1.4])
        xyz = np.clip(xyz, -1.75, 1.75)
        scaling = rng.normal(-2.3, 0.05, (n, 3))
        opacity = rng.normal(-2.0, 0.05, (n, 1))
    elif mode == "trained":
        # compact surface shell, ~1.5 px screen scale at 256^2/f=355:
        # world scale ~ 1.5 * dis / 355 ~ 0.01
        u = rng.normal(0, 1, (n, 3))
        u /= np.linalg.norm(u, axis=-1, keepdims=True)
        r = 0.7 + 0.05 * rng.normal(0, 1, (n, 1))
        xyz = u * r
        scaling = np.log(np.clip(rng.lognormal(np.log(0.011), 0.3, (n, 3)),
                                 1e-4, 1.0))
        opacity = rng.normal(1.0, 0.5, (n, 1))
    else:
        raise ValueError(mode)
    feats = rng.normal(0, 0.4, (n, 1, 3))
    rot = rng.normal(0, 1, (n, 4))
    return Gaussians(
        xyz=xyz.astype(np.float32)[None],
        features=feats.astype(np.float32)[None],
        scaling=scaling.astype(np.float32)[None],
        rotation=rot.astype(np.float32)[None],
        opacity=opacity.astype(np.float32)[None])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--views", type=int, default=2)
    ap.add_argument("--out", default="outputs/bench/capacity_grads.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from open_diffusiongs_tpu.ops import rasterize as rz
    from open_diffusiongs_tpu.ops.gaussians import Gaussians
    from open_diffusiongs_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    h = w = args.res
    tiles = (h // 16) * (w // 16)
    n = args.n
    dis = 3.0
    rng = np.random.default_rng(0)
    f = 1422.222 / 1024.0 * args.res
    c2ws = []
    for i in range(args.views):
        ang = 2 * np.pi * i / max(args.views, 1)
        o = np.asarray([dis * np.cos(ang), dis * np.sin(ang), 0.8])
        z = -o / np.linalg.norm(o)
        up = np.asarray([0.0, 0.0, 1.0])
        x = np.cross(z, up); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        m = np.eye(4); m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = x, y, z, o
        c2ws.append(m)
    c2w = jnp.asarray(np.stack(c2ws), jnp.float32)[None]
    fxy = jnp.asarray(np.tile([f, f, args.res / 2, args.res / 2],
                              (1, args.views, 1)), jnp.float32)
    target = jnp.asarray(rng.uniform(0, 1, (1, args.views, 3, h, w)),
                         jnp.float32)

    def grads(g: Gaussians, cfg):
        def loss(gg):
            out = rz.render(gg, c2w, fxy, h, w, cfg=cfg)
            return jnp.mean((out["render"] - target) ** 2), out
        (_, out), gr = jax.jit(jax.value_and_grad(loss, has_aux=True))(g)
        frac = (float(out["overflow_gaussians"])
                / max(float(out["binned_entries"]), 1.0))
        return jax.tree.map(np.asarray, gr), frac

    def cos(a, b):
        a, b = a.reshape(-1), b.reshape(-1)
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na > 0 and nb > 0 else 0.0

    results = {}
    for mode in ("init", "trained"):
        g = make_population(rng, n, mode, dis)
        g = Gaussians(*(jnp.asarray(x) for x in g))
        # K=n rows per tile exceed the Pallas blend's VMEM scope — the
        # oracle rides the (bit-equivalent, differentiable) XLA scan core
        oracle_cfg = rz.RasterizeConfig(
            max_tiles_per_gaussian=tiles, max_per_tile=n,
            rect_clip="center", pallas_blend="off", pallas_bwd="off",
            blend_chunk=128)
        print(f"[{mode}] oracle (D={tiles}, K={n})...", flush=True)
        g_o, frac_o = grads(g, oracle_cfg)
        assert frac_o == 0.0, frac_o
        for clip in ("center", "first"):
            for d_, k_ in ((16, 512), (16, 1024), (16, 2048), (16, 4096)):
                cfg = rz.RasterizeConfig(max_tiles_per_gaussian=d_,
                                         max_per_tile=k_, rect_clip=clip)
                g_p, frac = grads(g, cfg)
                per = {f: cos(getattr(g_p, f), getattr(g_o, f))
                       for f in ("xyz", "scaling", "opacity", "features")}
                allv = cos(np.concatenate([getattr(g_p, f).ravel()
                                           for f in per]),
                           np.concatenate([getattr(g_o, f).ravel()
                                           for f in per]))
                zero = float(np.mean(
                    np.all(g_p.xyz[0] == 0, axis=-1)
                    & np.all(g_p.opacity[0] == 0, axis=-1)))
                key = f"{mode}/{clip}/D{d_}/K{k_}"
                results[key] = {"cos_all": round(allv, 4),
                                **{f"cos_{f}": round(v, 4)
                                   for f, v in per.items()},
                                "zero_grad_frac": round(zero, 4),
                                "overflow_frac": round(frac, 4)}
                print(f"{key}: cos_all={allv:.4f} "
                      f"zero={zero:.3f} overflow={frac:.3f}", flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    meta = {"n": n, "res": args.res, "views": args.views}
    with open(args.out, "w") as fh:
        json.dump({"meta": meta, "results": results}, fh, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
