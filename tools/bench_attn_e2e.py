"""End-to-end fused_attention timing: flash (new) vs splash, both DiT
lengths, through the production wrapper (includes padding/transpose/ones-
column overhead).  Usage: python tools/bench_attn_e2e.py"""

from __future__ import annotations

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


def loop_timed(make_fn, iters=20):
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
    from open_diffusiongs_tpu.models.transformer import fused_attention

    rng = np.random.default_rng(0)
    h, d = 16, 64
    results = {}
    grad_too = bool(os.environ.get("ATTN_GRAD"))
    for l in (4098, 16386):
        q, k, v = (jnp.asarray(rng.normal(size=(1, l, h, d)), jnp.bfloat16)
                   for _ in range(3))
        flops = 4.0 * l * l * h * d
        for impl in ("flash", "splash"):
            t = loop_timed(lambda e, q=q, k=k, v=v, impl=impl:
                           fused_attention(q + e.astype(q.dtype), k, v, impl))
            results[f"{impl}_L{l}"] = {
                "ms": round(t * 1e3, 2),
                "mfu_pct": round(100 * flops / t / PEAK_BF16, 1)}
            print(f"{impl}_L{l}", results[f"{impl}_L{l}"], flush=True)
            if grad_too:
                def g(e, q=q, k=k, v=v, impl=impl):
                    def f(q):
                        o = fused_attention(q, k, v, impl)
                        return jnp.sum(o.astype(jnp.float32))
                    return jax.grad(f)(q + e.astype(q.dtype))
                tg = loop_timed(g)
                results[f"{impl}_grad_L{l}"] = {
                    "ms": round(tg * 1e3, 2),
                    "bwd_ms_est": round((tg - t) * 1e3, 2)}
                print(f"{impl}_grad_L{l}", results[f"{impl}_grad_L{l}"],
                      flush=True)

    print(json.dumps({"results": results, "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
