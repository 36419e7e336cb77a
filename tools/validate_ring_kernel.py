"""On-device validation of the ring-attention per-slice kernel plan.

ADVICE r3: `pick_ring_blocks` can select block sizes (e.g. bq=1408 at the
512^2 flagship slice 16896/2 = 8448) that the packed-forward sweep never
compiled on hardware — a Mosaic VMEM failure there would break the sp path
at runtime despite green interpret-mode tests.  This tool compiles + runs
`flash_mha_packed(with_stats=True)` — exactly the call `ring_attention`'s
kernel path makes per ring step (parallel/ring.py::step_stats) — at every
flagship slice shape, checks the output against the XLA softmax reference,
and times it.

Usage: python tools/validate_ring_kernel.py [--dh 64] [--heads 16]
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

from open_diffusiongs_tpu.ops.attention import flash_mha_packed
from open_diffusiongs_tpu.parallel.ring import (pick_ring_blocks,
                                                ring_kernel_eligible)

# (global Lp, l_real, sp): 512^2 object = 16896 pad of 16386 real tokens,
# 256^2 object = 4224 pad of 4098, over the sp values the mesh guide ships
SLICES = [(16896, 16386, 2), (16896, 16386, 4), (16896, 16386, 8),
          (4224, 4098, 2), (4224, 4098, 4)]


def xla_ref(q, k, v, num_heads, l_real):
    b, lp, hd = q.shape
    dh = hd // num_heads
    qh = q.reshape(b, lp, num_heads, dh).astype(jnp.float32)
    kh = k.reshape(b, lp, num_heads, dh).astype(jnp.float32)
    vh = v.reshape(b, lp, num_heads, dh).astype(jnp.float32)
    s = jnp.einsum("blhd,bmhd->bhlm", qh, kh) / np.sqrt(dh)
    mask = (jnp.arange(lp) < l_real)[None, None, None, :]
    s = jnp.where(mask, s, -jnp.inf)
    o = jnp.einsum("bhlm,bmhd->blhd", jax.nn.softmax(s, axis=-1), vh)
    return o.reshape(b, lp, hd)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dh", type=int, default=64)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    hd = args.dh * args.heads
    rng = np.random.default_rng(0)
    results = []
    for lp_g, l_real_g, sp in SLICES:
        lq = lp_g // sp
        if lq % 128:
            continue
        ok = ring_kernel_eligible(lq, hd, args.dh, l_real_g, sp)
        blocks = pick_ring_blocks(lq)
        row = {"lq": lq, "sp": sp, "blocks": blocks, "eligible": ok}
        if not ok:
            results.append(row)
            continue
        q, k, v = (jnp.asarray(rng.normal(size=(1, lq, hd)) * 0.3,
                               jnp.bfloat16) for _ in range(3))
        # a ring step attends its q slice to ONE kv slice; the tail slice
        # carries the pad rows -> l_real for a middle slice is lq
        try:
            fn = jax.jit(lambda a, b_, c: flash_mha_packed(
                a, b_, c, num_heads=args.heads, l_real=lq, blocks=blocks,
                with_stats=True))
            o, lse = fn(q, k, v)
            o.block_until_ready()
            ref = jax.jit(lambda a, b_, c: xla_ref(
                a, b_, c, args.heads, lq))(q, k, v)
            err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref)))
            t0 = time.time()
            for _ in range(args.iters):
                o, lse = fn(q, k, v)
            o.block_until_ready()
            row.update(ms=round((time.time() - t0) / args.iters * 1e3, 2),
                       max_err=round(err, 4), status="ok")
        except Exception as ex:  # noqa: BLE001
            row.update(status=f"FAIL: {str(ex)[:120]}")
        results.append(row)
        print(row, flush=True)
    print(json.dumps({"device": str(jax.devices()[0]), "results": results},
                     default=str))


if __name__ == "__main__":
    main()
