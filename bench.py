"""Benchmark: end-to-end single-image -> 3D asset wall-clock on one chip.

Runs the flagship object model (24-layer/1024-wide DiT, 30 denoising steps,
1 condition view + 3 generation views) at 256 x 256 through the fully jitted
sample loop (denoiser + tile rasterizer every step) and reports seconds per
asset, compile excluded (warmup run first).

Baseline: the reference paper claims ~6 s single-image -> 3D on one GPU
(README.md:39; A100-class, 512 demo).  vs_baseline is our seconds / 6.0
(< 1.0 is faster than the reference claim).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SECONDS = 6.0  # README.md:39 (paper claim, 1 GPU)


def main():
    from __graft_entry__ import _orbit_cameras
    from open_diffusiongs_tpu.ops.rasterize import RasterizeConfig
    from open_diffusiongs_tpu.systems.object_system import (
        ObjectSystem, ObjectSystemConfig)

    h = w = int(os.environ.get("BENCH_RES", "256"))
    n_views = 4          # 1 cond + 3 generation targets (pipline_obj.py:269-287)
    steps = 30

    system = ObjectSystem(ObjectSystemConfig(
        num_inference_steps=steps,
        shape_model=dict(width=1024, num_layers=24, patch_size=8,
                         dim_heads=64, dtype=jnp.bfloat16, remat=False),
        raster=RasterizeConfig(max_tiles_per_gaussian=16, max_per_tile=512,
                               blend_chunk=32),
        use_lpips=False,
    ))
    params = system.init_params(jax.random.PRNGKey(0), h, w, v=n_views)

    c2ws, fxy = _orbit_cameras(n_views, h=h, w=w)
    cond = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, 1, 3, h, w)), jnp.float32)
    c2w = jnp.asarray(c2ws)[None]
    fxy = jnp.asarray(fxy)[None]

    sample = jax.jit(lambda p, c, rng: system.sample(p, c, c2w, fxy, rng))

    def run(key):
        out = sample(params, cond, key)
        # NOTE: under the axon relay block_until_ready can return before the
        # remote computation finishes; fetching a scalar is the reliable sync.
        return float(out["sample"].sum())

    # Warmup (compile)
    t0 = time.time()
    run(jax.random.PRNGKey(1))
    compile_s = time.time() - t0

    times = []
    for i in range(3):
        t0 = time.time()
        run(jax.random.PRNGKey(2 + i))
        times.append(time.time() - t0)
    best = min(times)

    print(json.dumps({
        "metric": f"image_to_3d_seconds_{h}",
        "value": round(best, 3),
        "unit": "s/asset",
        "vs_baseline": round(best / BASELINE_SECONDS, 3),
        "compile_s": round(compile_s, 1),
        "denoise_steps": steps,
        "views": n_views,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
