"""Diagnose the trained-stats 512^2 sampling regression (r5).

One-process A/B of the full 30-step sampler at 512^2 across
{population: init|trained} x {binning: single|split2}: the r5 in-process
measurement found init/single 18.10 s but trained/split2 19.81 s, even
though the render microbench (tools/bench_raster.py) shows trained/split2
beating trained/single 148.5 vs 183.9 ms.  This isolates which factor the
full sampler actually pays for.

Usage: python tools/diag_512_split.py [--res 512] [--variants a,b,c,d]
  a = init/single   b = trained/single   c = trained/split2  d = init/split2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--variants", default="b,d")
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench as bench_mod
    from __graft_entry__ import _orbit_cameras
    from open_diffusiongs_tpu.ops.rasterize import RasterizeConfig
    from open_diffusiongs_tpu.systems.object_system import (ObjectSystem,
                                                            ObjectSystemConfig)

    bench_mod.wait_for_device()
    h = w = args.res
    n_views, steps = 4, args.steps

    spec = {
        "a": (False, 0), "b": (True, 0), "c": (True, 2), "d": (False, 2),
    }

    def build(trained: bool, split: int):
        model = dict(width=1024, num_layers=24, patch_size=8,
                     dim_heads=64, dtype=jnp.bfloat16, remat=False)
        if trained:
            ds, do = bench_mod._trained_stat_offsets(h)
            model.update(gs_raw_offset_scaling=ds, gs_raw_offset_opacity=do)
        return ObjectSystem(ObjectSystemConfig(
            num_inference_steps=steps, shape_model=model,
            raster=RasterizeConfig(max_tiles_per_gaussian=16,
                                   max_per_tile=1024, blend_chunk=32,
                                   split_slots=split),
            use_lpips=False))

    c2ws, fxy = _orbit_cameras(n_views, h=h, w=w)
    c2w = np.asarray(c2ws)[None]
    fxyn = np.asarray(fxy)[None]
    cond = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, 1, 3, h, w)), jnp.float32)

    out = {}
    for v in args.variants.split(","):
        trained, split = spec[v]
        system = build(trained, split)
        params = system.init_params(jax.random.PRNGKey(0), h, w, v=n_views)
        sample = jax.jit(lambda p, c, rng, s=system: s.sample(
            p, c, c2w, fxyn, rng))

        def run(key, fn=sample, p=params, c=cond):
            return float(fn(p, c, key)["sample"].sum())

        t0 = time.time()
        run(jax.random.PRNGKey(1))
        compile_s = time.time() - t0
        times = []
        for i in range(3):
            t0 = time.time()
            run(jax.random.PRNGKey(2 + i))
            times.append(time.time() - t0)
        out[v] = {"trained": trained, "split": split,
                  "s": round(min(times), 3), "compile_s": round(compile_s, 1)}
        print(json.dumps({v: out[v]}), flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
