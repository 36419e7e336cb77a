"""End-to-end A/B of the duplicate-slot budget D at 512^2 sampling (r5).

PERF_NOTES' 512^2 budget names the N*D-key sort the largest non-attention
term ("D (slots/Gaussian) auto-tuned from trained-model radius statistics"
was listed as a next lever in round 2 and never measured).  At trained
statistics the screen-space footprint is ~1.5 px (docs/CAPACITY.md), so a
rect spans at most 2x2 = 4 tiles and D=16 carries 4x more sort keys than
the population needs.  rect_clip="center" keeps any overflowing rect's
center window, so smaller D degrades gracefully rather than dropping work.

This measures the FULL jitted 30-step sampler (the split-binning lesson:
control-flow/shape changes must be measured in the full compiled graph),
plus render fidelity of the D-reduced sampler vs the D=16 baseline on the
same seed (PSNR of the final sample renders).

Usage: python tools/diag_512_dslots.py [--res 512] [--dslots 16,8,4]
       [--pop trained|init|both]
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
    ap.add_argument("--dslots", default="16,8,4")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--pop", default="trained", choices=["trained", "init",
                                                         "both"])
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

    def build(trained: bool, d_slots: int):
        model = dict(width=1024, num_layers=24, patch_size=8,
                     dim_heads=64, dtype=jnp.bfloat16, remat=False)
        if trained:
            ds, do = bench_mod._trained_stat_offsets(h)
            model.update(gs_raw_offset_scaling=ds, gs_raw_offset_opacity=do)
        return ObjectSystem(ObjectSystemConfig(
            num_inference_steps=steps, shape_model=model,
            raster=RasterizeConfig(max_tiles_per_gaussian=d_slots,
                                   max_per_tile=1024, blend_chunk=32,
                                   split_slots=0),
            use_lpips=False))

    c2ws, fxy = _orbit_cameras(n_views, h=h, w=w)
    c2w = np.asarray(c2ws)[None]
    fxyn = np.asarray(fxy)[None]
    cond = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, 1, 3, h, w)), jnp.float32)

    from open_diffusiongs_tpu.ops import rasterize as rz

    def psnr(a, b):
        mse = float(np.mean((np.asarray(a, np.float32)
                             - np.asarray(b, np.float32)) ** 2))
        return round(-10 * np.log10(mse), 1) if mse > 0 else float("inf")

    pops = {"trained": [True], "init": [False], "both": [True, False]}
    out = {}
    for trained in pops[args.pop]:
        base_render = None     # end-of-trajectory renders (divergence proxy)
        base_gauss = None      # first-D's final Gaussians (fidelity input)
        base_bare = None       # those Gaussians rendered at the first D
        for d_slots in [int(x) for x in args.dslots.split(",")]:
            system = build(trained, d_slots)
            params = system.init_params(jax.random.PRNGKey(0), h, w,
                                        v=n_views)
            sample = jax.jit(lambda p, c, rng, s=system: s.sample(
                p, c, c2w, fxyn, rng))

            def run(key, fn=sample, p=params, c=cond):
                r = fn(p, c, key)
                # host round-trip: handing a sampler-output device pytree
                # straight into a fresh jit compile has crashed the
                # remote-chip relay (read-body mid-compile); numpy in
                # between makes the bare-render call self-contained
                return (np.asarray(r["renders"]),
                        jax.tree.map(np.asarray, r["gaussians"]))

            t0 = time.time()
            img, gauss = run(jax.random.PRNGKey(1))
            compile_s = time.time() - t0
            times = []
            for i in range(3):
                t0 = time.time()
                img, gauss = run(jax.random.PRNGKey(2))  # same seed
                times.append(time.time() - t0)
            key = ("trained" if trained else "init") + f"/D{d_slots}"
            rec = {"s": round(min(times), 3), "compile_s": round(compile_s, 1)}
            # Per-render fidelity: the FIRST D's final Gaussians rendered
            # under this D vs under the first D — isolates the single-render
            # error from the 30-step trajectory feedback divergence.
            rcfg = system.cfg.raster._replace(early_exit=True, remat=False)
            bare = jax.jit(lambda g: rz.render(
                g, jnp.asarray(c2w), jnp.asarray(fxyn), h, w, cfg=rcfg))
            if base_render is None:
                base_render, base_gauss = img, gauss
                bb = bare(base_gauss)
                base_bare = np.asarray(bb["render"])
                rec["overflow_tiles"] = int(bb["overflow_tiles"])
            else:
                rec["traj_psnr_vs_first"] = psnr(img, base_render)
                bb = bare(base_gauss)
                rec["render_psnr_vs_first"] = psnr(bb["render"], base_bare)
                rec["overflow_tiles"] = int(bb["overflow_tiles"])
            out[key] = rec
            print(json.dumps({key: rec}), flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
