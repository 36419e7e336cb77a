"""Diagnose sampler compile time (VERDICT r2 weak #5: 142 s at 256^2 vs
52.6 s at 512^2 — inverted).

Splits cold-start into jaxpr TRACE time vs XLA COMPILE time for the
flagship sample loop, at a given resolution, with toggles for the usual
suspects (remat, early_exit, pallas blend, attention impl).

Usage: python tools/diag_compile.py --res 256 [--steps 30]
       [--raster-remat/--no-early-exit/--pallas off/--attn splash] ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# NOTE: no compilation cache — we are measuring the cold compile itself
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--pallas", default="auto")
    ap.add_argument("--attn", default="auto")
    ap.add_argument("--no-early-exit", action="store_true")
    ap.add_argument("--run", action="store_true",
                    help="also execute once (device compile included)")
    args = ap.parse_args()

    from __graft_entry__ import _orbit_cameras
    from open_diffusiongs_tpu.ops.rasterize import RasterizeConfig
    from open_diffusiongs_tpu.systems.object_system import (ObjectSystem,
                                                            ObjectSystemConfig)

    h = w = args.res
    system = ObjectSystem(ObjectSystemConfig(
        num_inference_steps=args.steps,
        shape_model=dict(width=1024, num_layers=args.layers, patch_size=8,
                         dim_heads=64, dtype=jnp.bfloat16,
                         attn_impl=args.attn),
        raster=RasterizeConfig(max_tiles_per_gaussian=16, max_per_tile=1024,
                               blend_chunk=32, pallas_blend=args.pallas,
                               early_exit=not args.no_early_exit),
        use_lpips=False))
    params = system.init_params(jax.random.PRNGKey(0), h, w, v=args.views)
    c2ws, fxy = _orbit_cameras(args.views, h=h, w=w)
    cond = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, 1, 3, h, w)), jnp.float32)
    c2w = np.asarray(c2ws)[None]  # host constant: no trace-time device fetch
    fxy_j = np.asarray(fxy)[None]
    key = jax.random.PRNGKey(1)

    fn = jax.jit(lambda p, c, r: system.sample(p, c, c2w, fxy_j, r))

    t0 = time.time()
    lowered = fn.lower(params, cond, key)
    t_trace = time.time() - t0

    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0

    out = {"res": args.res, "steps": args.steps,
           "trace_s": round(t_trace, 1),
           "xla_compile_s": round(t_compile, 1),
           "pallas": args.pallas, "attn": args.attn,
           "early_exit": not args.no_early_exit,
           "backend": jax.default_backend()}
    if args.run:
        t0 = time.time()
        r = compiled(params, cond, key)
        float(r["sample"].sum())
        out["first_run_s"] = round(time.time() - t0, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
