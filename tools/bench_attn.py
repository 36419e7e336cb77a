"""Attention kernel microbenchmark at the DiT's 512^2 shape.

L = 2 + 4*(512/8)^2 = 16386 tokens padded to a 512 multiple (16896), 16
heads x 64 dim, bf16.  Compares the splash kernel (current), the plain
pallas flash_attention kernel, and block-size variants, reporting ms/layer
and MFU (peak 197 TF/s bf16 on v5e; note d=64 on a 128x128 MXU caps
utilization at ~50%, so ~98 TF/s is the realistic ceiling).

Usage: python tools/bench_attn.py [--l 16386] [--heads 16] [--dim 64]
"""

from __future__ import annotations

import argparse
import functools
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

PEAK_BF16 = 197e12


def loop_timed(make_fn, iters=30):
    @jax.jit
    def run():
        def body(carry, _):
            out = make_fn(carry)
            s = jnp.sum(out.astype(jnp.float32))
            return 0.0 * s, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(run())
    t0 = time.time()
    r = float(run())
    assert r == r
    return (time.time() - t0) / iters


def splash(q, k, v, block, lp):
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sak, splash_attention_mask as sam)
    h = q.shape[1]
    bs = sak.BlockSizes(block_q=block[0], block_kv=block[1],
                        block_kv_compute=block[1])
    mask = sam.MultiHeadMask([sam.FullMask((lp, lp)) for _ in range(h)])
    kernel = sak.make_splash_mha(mask=mask, head_shards=1, q_seq_shards=1,
                                 block_sizes=bs)
    return kernel(q[0], k[0], v[0])[None]


def flash(q, k, v, block, lp):
    from jax.experimental.pallas.ops.tpu import flash_attention as fa
    bs = fa.BlockSizes(block_q=block[0], block_k_major=block[1],
                       block_k=block[1], block_b=1,
                       block_q_major_dkv=block[0], block_k_major_dkv=block[1],
                       block_k_dkv=block[1], block_q_dkv=block[0],
                       block_k_major_dq=block[1], block_k_dq=block[1],
                       block_q_dq=block[0])
    return fa.flash_attention(q, k, v, causal=False, block_sizes=bs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--l", type=int, default=16386)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    h, d = args.heads, args.dim
    rng = np.random.default_rng(0)

    results = {}
    variants = [
        ("splash_512", splash, (512, 512), 512),
        ("splash_1024q_512kv", splash, (1024, 512), 1024),
        ("splash_2048q_512kv", splash, (2048, 512), 2048),
        ("splash_1024", splash, (1024, 1024), 1024),
        ("flash_512", flash, (512, 512), 512),
        ("flash_1024", flash, (1024, 1024), 1024),
        ("flash_2048q_1024kv", flash, (2048, 1024), 2048),
    ]
    if os.environ.get("ATTN_EXTRA"):
        variants = [
            ("splash_1024", splash, (1024, 1024), 1024),
            ("splash_2048q_1024kv", splash, (2048, 1024), 2048),
            ("splash_1024q_2048kv", splash, (1024, 2048), 2048),
            ("splash_2048", splash, (2048, 2048), 2048),
            ("splash_4096q_1024kv", splash, (4096, 1024), 4096),
            ("splash_512q_1024kv", splash, (512, 1024), 1024),
        ]
    for name, fn, block, pad_to in variants:
        lp = -(-args.l // pad_to) * pad_to
        q = jnp.asarray(rng.normal(0, 1, (1, h, lp, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(0, 1, (1, h, lp, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(0, 1, (1, h, lp, d)), jnp.bfloat16)
        flops = 4.0 * lp * lp * h * d
        try:
            t = loop_timed(lambda e, q=q, k=k, v=v, fn=fn, block=block,
                           lp=lp: fn(q + e.astype(q.dtype), k, v, block, lp),
                           iters=args.iters)
        except Exception as ex:  # noqa: BLE001 — report and move on
            results[name] = f"error: {str(ex)[:80]}"
            continue
        results[name] = {"ms": round(t * 1e3, 2), "L_padded": lp,
                         "mfu_pct": round(100 * flops / t / PEAK_BF16, 1)}
        print(name, results[name], flush=True)

    print(json.dumps({"l": args.l, "heads": h, "dim": d,
                      "results": results,
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
