"""Decompose the sampling (serving) cost per diffusion step.

The 512^2 asset (r3: 18.43 s / 30 steps = ~614 ms/step) splits into:
  denoiser   one jitted DGSDenoiser forward (DiT + tokenizer + heads)
  attention  24 x the packed-kernel layer time (bench.py::bench_attention)
  dense      denoiser - attention - heads (residual dense/LN/elementwise)
  render     one 3-view rasterizer call at trained-stats population
             (tools/bench_raster.py measures this independently)

With --quant the denoiser row runs the W8A8 int8 path (ops/quant.py) so
the dense-residual delta isolates what int8 actually buys end-to-end.

Usage: python tools/bench_sample_breakdown.py [--res 512] [--iters 10]
       [--quant]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--quant", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from open_diffusiongs_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    import bench as bench_mod
    from __graft_entry__ import _orbit_cameras
    from open_diffusiongs_tpu.ops.rays import rays_chw

    bench_mod.wait_for_device()
    h = w = args.res
    v = args.views
    system = bench_mod._make_system(h, w, quant=args.quant)
    params = system.init_params(jax.random.PRNGKey(0), h, w, v=v)
    c2ws, fxy = _orbit_cameras(v, h=h, w=w)
    c2w = np.asarray(c2ws)[None]
    fxyn = np.asarray(fxy)[None]

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(size=(1, v, 3, h, w)), jnp.float32)
    t = jnp.asarray([500])

    @jax.jit
    def denoiser_only(p, images):
        ro, rd = rays_chw(jnp.asarray(c2w), jnp.asarray(fxyn), h, w)
        gs, depth = system.model.apply(p, images, ro, rd, t)
        # fetchable scalar that depends on every output head
        return (jnp.sum(gs.xyz.astype(jnp.float32))
                + jnp.sum(depth.astype(jnp.float32)))

    def timed(fn, *a):
        float(fn(*a))                      # compile + sync
        t0 = time.time()
        for _ in range(args.iters):
            r = fn(*a)
        float(r)
        return (time.time() - t0) / args.iters * 1e3

    den_ms = timed(denoiser_only, params, imgs)
    attn_ms, attn_mfu = bench_mod.bench_attention(
        l=2 + v * (h // 8) * (w // 8), iters=max(args.iters, 20))
    layers = 24
    print(f"res {h}  views {v}  quant={args.quant}")
    print(f"denoiser fwd/step      {den_ms:8.1f} ms")
    print(f"attention ({layers} layers)  {layers * attn_ms:8.1f} ms "
          f"({attn_ms:.2f} ms/layer @ {attn_mfu:.1f}% MFU)")
    print(f"dense+heads residual   {den_ms - layers * attn_ms:8.1f} ms")
    print("render: see tools/bench_raster.py (per-view bin/gather/blend)")


if __name__ == "__main__":
    main()
