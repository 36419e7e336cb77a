"""Packed-kernel sweep: blocks x group_cols at both DiT lengths.

Usage: python tools/bench_attn3.py [--l 4098] [--iters 30]
Specs via ATTN_SPECS="bq:bkv:pad:gc[:smax],..." (pad = lcm the length is
padded to; smax=1 uses the block-scalar flash recurrence).
"""

from __future__ import annotations

import argparse
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
from jax import lax

PEAK_BF16 = 197e12


def loop_timed(make_fn, iters=30):
    @jax.jit
    def run():
        def body(carry, _):
            out = make_fn(carry)
            s = jnp.sum(out.astype(jnp.float32))
            return 0.0 * s, None
        c, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(run())
    t0 = time.time()
    r = float(run())
    assert r == r
    return (time.time() - t0) / iters


def main():
    from open_diffusiongs_tpu.ops.attention import flash_mha_packed

    ap = argparse.ArgumentParser()
    ap.add_argument("--l", type=int, default=4098)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    h, d = args.heads, 64

    specs = os.environ.get(
        "ATTN_SPECS",
        "1536:768:4608:128,1536:768:4608:256,768:768:4608:256,"
        "1536:512:4608:256,512:512:4608:256,1536:768:4608:512")
    rng = np.random.default_rng(0)
    results = {}
    for spec in specs.split(","):
        parts = [int(x) for x in spec.split(":")]
        bq, bkv, pad, gc = parts[:4]
        smax = bool(parts[4]) if len(parts) > 4 else False
        lp = -(-args.l // pad) * pad
        q, k, v = (jnp.asarray(rng.normal(size=(1, lp, h * d)), jnp.bfloat16)
                   for _ in range(3))
        flops = 4.0 * args.l * args.l * h * d
        name = f"bq{bq}_bkv{bkv}_gc{gc}" + ("_smax" if smax else "")
        try:
            t = loop_timed(
                lambda e, q=q, k=k, v=v, bq=bq, bkv=bkv, gc=gc, sm=smax:
                flash_mha_packed(q + e.astype(q.dtype), k, v, num_heads=h,
                                 l_real=args.l, blocks=(bq, bkv),
                                 group_cols=gc, scalar_max=sm),
                iters=args.iters)
        except Exception as ex:  # noqa: BLE001
            results[name] = f"error: {str(ex)[:100]}"
            print(name, results[name], flush=True)
            continue
        results[name] = {"ms": round(t * 1e3, 2), "L_padded": lp,
                         "mfu_pct": round(100 * flops / t / PEAK_BF16, 1)}
        print(name, results[name], flush=True)

    print(json.dumps({"l": args.l, "results": results,
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
