"""Diagnose sampler compile time (VERDICT r2 weak #5: 142 s at 256^2 vs
52.6 s at 512^2 — inverted and unexplained).

Separates the three phases a first `sample()` call pays:
  1. trace+lower  (python tracing -> StableHLO; pure host work)
  2. backend compile (XLA:TPU; what the persistent cache can skip)
  3. first execution

Usage:
  python tools/bench_compile.py --res 256 [--cold] [--steps 30]
  --cold wipes /tmp/jax_cache first so phase 2 is a true cold compile.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--cold", action="store_true",
                    help="wipe the persistent compilation cache first")
    ap.add_argument("--cache", default="/tmp/jax_cache")
    ap.add_argument("--remat", action="store_true",
                    help="run the sampler with the DiT remat policy on "
                         "(the training default) instead of the inference "
                         "default (remat=False)")
    args = ap.parse_args()

    if args.cold and os.path.isdir(args.cache):
        shutil.rmtree(args.cache)

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench as bench_mod
    from __graft_entry__ import _orbit_cameras
    from open_diffusiongs_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache(args.cache)

    bench_mod.wait_for_device()
    h = w = args.res
    system = bench_mod._make_system(h, w, steps=args.steps, remat=args.remat)

    t0 = time.time()
    params = system.init_params(jax.random.PRNGKey(0), h, w, v=4)
    t_init = time.time() - t0

    c2ws, fxy = _orbit_cameras(4, h=h, w=w)
    cond = jnp.asarray(
        np.random.default_rng(0).uniform(size=(1, 1, 3, h, w)), jnp.float32)
    c2w = np.asarray(c2ws)[None]  # host constant: no trace-time device fetch
    fxy = np.asarray(fxy)[None]

    fn = jax.jit(lambda p, c, rng: system.sample(p, c, c2w, fxy, rng))

    t0 = time.time()
    lowered = fn.lower(params, cond, jax.random.PRNGKey(1))
    t_lower = time.time() - t0

    hlo = lowered.as_text()
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0

    t0 = time.time()
    out = compiled(params, cond, jax.random.PRNGKey(1))
    float(out["sample"].sum())
    t_exec = time.time() - t0

    try:
        mem = compiled.memory_analysis()
        peak = getattr(mem, "temp_size_in_bytes", None)
    except Exception:  # noqa: BLE001
        peak = None

    print(f"res={h} steps={args.steps} cold={args.cold} remat={args.remat}")
    print(f"  param-init s : {t_init:8.1f}")
    print(f"  trace+lower s: {t_lower:8.1f}   (HLO chars: {len(hlo):,})")
    print(f"  xla compile s: {t_compile:8.1f}")
    print(f"  first exec s : {t_exec:8.1f}")
    if peak is not None:
        print(f"  temp bytes   : {peak:,}")


if __name__ == "__main__":
    main()
