"""The [T, K, 10] candidate-row gather, isolated: XLA variants on TPU.

The blend's row gather (packed[idx], ~1M indices at 512^2/K=1024) is
latency-bound (~10-14 ms/view, PERF_NOTES lesson 1).  This sweeps the
cheap XLA-level alternatives before any kernel work:

  plain        packed[idx]
  promise      packed.at[idx].get(mode='promise_in_bounds')  (no clamping)
  fill         jnp.take(..., mode='fill')
  cols_split   two half-width gathers (tests width-dependence)
  rows_i32     gather of a [N] int32 (tests element-size-dependence)
  one_hot_mxu  tiny one-hot matmul per tile (MXU instead of gather)

Usage: python tools/bench_gather.py [--n 1048576] [--t 1024] [--k 1024]
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


def loop_timed(make_fn, iters=20):
    @jax.jit
    def run():
        def body(carry, _):
            out = make_fn(carry)
            s = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out))
            return 0.0 * s, None
        c, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(run())
    t0 = time.time()
    r = float(run())
    assert r == r
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1048576)
    ap.add_argument("--t", type=int, default=1024)
    ap.add_argument("--k", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.normal(size=(args.n, 10)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, args.n, (args.t, args.k)), jnp.int32)
    ivec = jnp.asarray(rng.normal(size=(args.n,)), jnp.float32)

    results = {}

    def rec(name, fn):
        try:
            t = loop_timed(fn, iters=args.iters)
            results[name] = round(t * 1e3, 2)
        except Exception as ex:  # noqa: BLE001
            results[name] = f"error: {str(ex)[:80]}"
        print(name, results[name], flush=True)

    rec("plain", lambda e: packed[idx] + e)
    rec("promise", lambda e: packed.at[idx].get(
        mode="promise_in_bounds") + e)
    rec("fill", lambda e: jnp.take(packed + e, idx, axis=0,
                                   mode="fill", fill_value=0.0))
    rec("cols_split", lambda e: (packed[..., :5][idx] + e,
                                 packed[..., 5:][idx]))
    rec("rows_f32_1col", lambda e: ivec[idx] + e)
    rec("sorted_flat", lambda e: (packed + e)[
        jnp.sort(idx.reshape(-1)).reshape(args.t, args.k)])

    # --- round-4 decision variants (VERDICT #4) --------------------------
    # Full ascending-gather sandwich: sort (idx, slot) pairs, gather rows in
    # ascending index order, sort back by slot.  Wins iff the monotone
    # gather is enough cheaper than the random one to pay for two 1M-row
    # u32 sorts.
    def sandwich(e):
        flat = idx.reshape(-1)
        slot = jnp.arange(flat.shape[0], dtype=jnp.int32)
        idx_a, slot_a = lax.sort((flat, slot), num_keys=1, is_stable=False)
        rows = (packed + e)[idx_a]                       # monotone gather
        outs = [lax.sort((slot_a, rows[:, c]), num_keys=1,
                         is_stable=False)[1] for c in range(10)]
        return jnp.stack(outs, -1).reshape(args.t, args.k, 10)
    rec("sandwich", sandwich)

    # Payload-through-sort: emit the 10 attribute columns alongside the
    # sort key at bin time (split-binning stream-A shape: 2 slots/gaussian
    # -> 2N rows), so no post-hoc row gather exists at all.  Compare 2N-row
    # 11-operand sort vs (2N-row 2-operand sort + this gather).
    def payload_sort(e):
        m = 2 * args.n
        keys = jnp.broadcast_to(ivec[None, :], (2, args.n)).reshape(-1)
        cols = [jnp.broadcast_to((packed[:, c] + e)[None, :],
                                 (2, args.n)).reshape(-1) for c in range(10)]
        out = lax.sort((keys, *cols), num_keys=1, is_stable=False)
        return out[1]
    rec("payload_sort_2n", payload_sort)
    rec("key_sort_2n", lambda e: lax.sort(
        (jnp.broadcast_to((ivec + e)[None, :], (2, args.n)).reshape(-1),
         jnp.broadcast_to(jnp.arange(args.n, dtype=jnp.int32)[None, :],
                          (2, args.n)).reshape(-1)),
        num_keys=1, is_stable=False)[1])

    print(json.dumps({"n": args.n, "t": args.t, "k": args.k,
                      "results": results,
                      "device": str(jax.devices()[0])}))


if __name__ == "__main__":
    main()
