"""k-nearest-neighbor mean distances — the `simple-knn` equivalent.

The reference ships a CUDA extension (submodules/simple-knn: Morton-sorted
box-pruned 3-NN, simple_knn.cu:186-222) whose single entry point
`distCUDA2(points)` returns the mean squared distance to each point's 3
nearest neighbors (classic 3DGS scale initialization).  It is installed but
never imported by diffusionGS (SURVEY.md §2.2 note) — implemented here for
capability parity as a blocked exact top-k over pairwise distances, which
XLA maps to MXU matmuls (|a-b|^2 = |a|^2 + |b|^2 - 2ab).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k", "block"))
def knn_mean_sq_dist(points: jnp.ndarray, k: int = 3, block: int = 4096
                     ) -> jnp.ndarray:
    """[N, 3] -> [N] mean squared distance to the k nearest neighbors
    (excluding self) — `distCUDA2` semantics (spatial.cu:14-24)."""
    pts = points.astype(jnp.float32)
    n = pts.shape[0]
    pad = (-n) % block
    ptsp = jnp.pad(pts, ((0, pad), (0, 0)), constant_values=jnp.inf)
    sq = jnp.sum(ptsp * ptsp, axis=-1)

    def one_block(start):
        q = jax.lax.dynamic_slice(ptsp, (start, 0), (block, 3))
        qsq = jax.lax.dynamic_slice(sq, (start,), (block,))
        d2 = (qsq[:, None] + sq[None, :]
              - 2.0 * jnp.matmul(q, ptsp.T,
                                 precision=jax.lax.Precision.HIGHEST))
        d2 = jnp.maximum(d2, 0.0)
        # exclude self-distance
        idx = start + jnp.arange(block)
        cols = jnp.arange(ptsp.shape[0])
        d2 = jnp.where(cols[None, :] == idx[:, None], jnp.inf, d2)
        d2 = jnp.where(jnp.isnan(d2), jnp.inf, d2)
        neg_top, _ = jax.lax.top_k(-d2, k)
        return jnp.mean(-neg_top, axis=-1)

    starts = jnp.arange(0, n + pad, block)
    out = jax.lax.map(one_block, starts).reshape(-1)
    return out[:n]
