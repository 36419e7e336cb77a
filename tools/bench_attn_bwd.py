"""Analytic packed-attention backward (ops/attention.py) on real TPU.

Times, at the flagship DiT lengths:
  * the stats forward (flash_mha_packed with_stats=True) vs the plain one
    (the stats export must be ~free);
  * the full value-and-grad through the packed custom_vjp
    (models/transformer.py::_make_packed_attn) — the training path;
  * the dq / dkv kernels individually (to guide block sweeps);
and cross-checks analytic grads against splash-backward grads on device.

Round-2 baseline to beat (tools/bench_attn_e2e.py ATTN_GRAD=1): the
splash-routed grad path.  Usage:
  python tools/bench_attn_bwd.py [--l 16386] [--bq 512 --bkv 512] [--check]
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


def loop_timed(make_fn, iters=20):
    @jax.jit
    def run():
        def body(carry, _):
            out = make_fn(carry)
            s = sum(jnp.sum(o.astype(jnp.float32))
                    for o in jax.tree.leaves(out))
            return 0.0 * s, None
        c, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(run())
    t0 = time.time()
    r = float(run())
    assert r == r, "NaN"
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--l", type=int, default=16386)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--bq", type=int, default=0, help="bwd q block override")
    ap.add_argument("--bkv", type=int, default=0)
    ap.add_argument("--gc", type=int, default=0, help="bwd head-group cols")
    ap.add_argument("--vmem", type=int, default=0, help="bwd VMEM scope MiB")
    ap.add_argument("--bwd-only", action="store_true",
                    help="skip fwd/value_and_grad sections (sweep mode)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--check", action="store_true",
                    help="grad parity vs splash backward on device")
    args = ap.parse_args()

    from open_diffusiongs_tpu.models.transformer import (_make_packed_attn,
                                                         _splash_attention)
    from open_diffusiongs_tpu.ops import attention as at

    h, dh = args.heads, 64
    l = args.l
    lp, fwd_blocks = at.plan_packed(l)
    bwd_blocks = ((args.bq, args.bkv) if args.bq
                  else at.pick_packed_bwd_blocks(l))
    rng = np.random.default_rng(0)
    hd = h * dh
    q, k, v = (jnp.asarray(rng.normal(size=(1, lp, hd)), jnp.bfloat16)
               for _ in range(3))
    # fwd: 2 matmul passes per score element; bwd: 5 (qk, dp, dq, dk, dv)
    fwd_flops = 4.0 * l * l * hd
    bwd_flops = 10.0 * l * l * hd
    bwd_kw = dict(blocks=bwd_blocks)
    if args.gc:
        bwd_kw["group_cols"] = args.gc
    if args.vmem:
        bwd_kw["vmem_limit_mb"] = args.vmem
    results = {"l": l, "lp": lp, "fwd_blocks": fwd_blocks,
               "bwd_blocks": bwd_blocks, "gc": args.gc or 128,
               # flash_mha_packed_bwd's actual default scope is 100 MiB
               # (ops/attention.py: vmem_limit_mb or 100)
               "vmem_mb": args.vmem or 100}

    def rec(name, t, flops=None):
        results[name] = {"ms": round(t * 1e3, 2)}
        if flops:
            results[name]["mfu_pct"] = round(100 * flops / t / PEAK_BF16, 1)
        print(name, results[name], flush=True)

    if not args.bwd_only:
        fwd = lambda e: at.flash_mha_packed(q + e.astype(q.dtype), k, v,
                                            num_heads=h, l_real=l,
                                            blocks=fwd_blocks)
        rec("fwd", loop_timed(fwd, args.iters), fwd_flops)

        fwd_st = lambda e: at.flash_mha_packed(q + e.astype(q.dtype), k, v,
                                               num_heads=h, l_real=l,
                                               blocks=fwd_blocks,
                                               with_stats=True)
        rec("fwd_stats", loop_timed(fwd_st, args.iters), fwd_flops)

    o, lse = jax.jit(lambda: at.flash_mha_packed(
        q, k, v, num_heads=h, l_real=l, blocks=fwd_blocks,
        with_stats=True))()
    do = jnp.asarray(rng.normal(size=(1, lp, hd)), jnp.bfloat16)

    bwd = lambda e: at.flash_mha_packed_bwd(
        q + e.astype(q.dtype), k, v, o, do, lse, num_heads=h, l_real=l,
        **bwd_kw)
    rec("bwd_pair", loop_timed(bwd, args.iters), bwd_flops)

    if not args.bwd_only:
        for analytic in (False, True):
            f = _make_packed_attn(h, l, fwd_blocks, analytic_bwd=analytic)

            def vg(e, f=f):
                def loss(q_, k_, v_):
                    return jnp.sum(f(q_, k_, v_).astype(jnp.float32))
                return jax.grad(loss, argnums=(0, 1, 2))(
                    q + e.astype(q.dtype), k, v)

            rec(f"value_and_grad_{'analytic' if analytic else 'splash'}",
                loop_timed(vg, args.iters), fwd_flops + bwd_flops)

    if args.check:
        def splash_loss(q_, k_, v_):
            b = q_.shape[0]
            to4 = lambda x: x[:, :l].reshape(b, l, h, dh)
            o4 = _splash_attention(to4(q_) * dh ** -0.5, to4(k_), to4(v_))
            cot = do[:, :l].reshape(1, l, h, dh).astype(jnp.float32)
            return jnp.sum(o4.astype(jnp.float32) * cot)

        ref = jax.jit(jax.grad(splash_loss, argnums=(0, 1, 2)))(q, k, v)
        got = jax.jit(lambda: at.flash_mha_packed_bwd(
            q, k, v, o, do, lse, num_heads=h, l_real=l, **bwd_kw))()
        for g_, r_, name in zip(got, ref, ("dq", "dk", "dv")):
            g_, r_ = (np.asarray(x, np.float32) for x in (g_, r_))
            denom = max(1e-6, float(np.abs(r_).max()))
            err = float(np.abs(g_ - r_).max()) / denom
            results[f"check_{name}_relmax"] = round(err, 5)
            print(f"check_{name}: rel-max-err {err:.2e}", flush=True)

    print(json.dumps({"results": results, "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
