"""Pipeline parallelism: GPipe-style microbatched stage execution.

Splits a stacked-layer transformer (params with a leading layer axis, the
way `nn.scan` stores them) across a `pipe` mesh axis: each device holds
`num_layers / S` contiguous layers and activations flow stage-to-stage over
ICI neighbor links (`lax.ppermute`).  Microbatches drawn from the batch
axis keep every stage busy outside the S-1 step fill/drain bubble —
efficiency mb/(mb+S-1).

SPMD formulation (every device runs the same program):

    step t: stage s computes microbatch (t - s) — stage 0 reads microbatch
    t from the input queue, later stages read the activation that arrived
    over the wire; outputs are collected at stage S-1 when t >= S-1; one
    masked psum at the end replicates the assembled output to all stages.

Autodiff: the whole loop is `lax.scan` + `lax.ppermute` + masked
dynamic-slice updates, so `jax.grad` yields the reverse pipeline (grads
ride the ring the opposite way) with the same bubble — no custom backward
needed.  Remat composes per block inside `stage_fn`.

The reference has no pipeline parallelism (DDP only, SURVEY.md §2.3); this
is framework surface beyond parity, validated on the virtual CPU mesh the
same way as tensor and sequence parallelism (tests/test_pipeline.py,
__graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from .mesh import DATA_AXIS

PIPE_AXIS = "pipe"


def pipeline_apply(mesh, stage_fn: Callable, stacked_params, x, c,
                   n_microbatches: int):
    """Run `stage_fn` as an S-stage pipeline over mesh's `pipe` axis.

    stage_fn(stage_params, x_mb, c_mb) -> y_mb applies this stage's layers
    to one microbatch (stage_params: the local [num_layers/S, ...] slice of
    `stacked_params`).  x: [b, ...] activations, c: [b, ...] per-sample
    conditioning; the leading batch axis is additionally sharded over
    `data` when the mesh has that axis, and the LOCAL batch (b / dp) must
    be divisible by n_microbatches.  Returns y with x's shape, replicated
    over `pipe`.
    """
    from jax.sharding import PartitionSpec as P

    axes = mesh.axis_names
    assert PIPE_AXIS in axes, f"mesh {axes} has no '{PIPE_AXIS}' axis"
    s = mesh.shape[PIPE_AXIS]
    mb = n_microbatches
    p_spec = jax.tree.map(lambda _: P(PIPE_AXIS), stacked_params)
    d_spec = P(DATA_AXIS if DATA_AXIS in axes else None)

    fn = functools.partial(_pipeline_body, stage_fn=stage_fn, s=s, mb=mb)
    return jax.shard_map(fn, mesh=mesh,
                         in_specs=(p_spec, d_spec, d_spec),
                         out_specs=d_spec, check_vma=False)(
                             stacked_params, x, c)


def _pipeline_body(params_local, x, c, *, stage_fn, s: int, mb: int):
    b = x.shape[0]
    assert b % mb == 0, (b, mb)
    bm = b // mb
    xs = x.reshape(mb, bm, *x.shape[1:])
    cs = c.reshape(mb, bm, *c.shape[1:])
    stage = lax.axis_index(PIPE_AXIS)
    perm = [(i, (i + 1) % s) for i in range(s)]

    def step(carry, t):
        wire, out = carry
        m = jnp.clip(t - stage, 0, mb - 1)        # microbatch this stage runs
        x_in = jnp.where(stage == 0,
                         lax.dynamic_index_in_dim(xs, m, 0, False), wire)
        c_in = lax.dynamic_index_in_dim(cs, m, 0, False)
        y = stage_fn(params_local, x_in, c_in)
        idx = t - (s - 1)
        valid = (stage == s - 1) & (idx >= 0)     # idx < mb by loop bound
        idx_c = jnp.clip(idx, 0, mb - 1)
        prev = lax.dynamic_index_in_dim(out, idx_c, 0, False)
        out = lax.dynamic_update_index_in_dim(
            out, jnp.where(valid, y, prev), idx_c, 0)
        wire = lax.ppermute(y, PIPE_AXIS, perm)
        return (wire, out), None

    wire0 = jnp.zeros_like(xs[0])
    out0 = jnp.zeros_like(xs)
    (_, out), _ = lax.scan(step, (wire0, out0),
                           jnp.arange(mb + s - 1, dtype=jnp.int32))
    # replicate the assembled output (lives on the last stage) to all
    # stages so downstream per-token ops keep running SPMD
    out = lax.psum(jnp.where(stage == s - 1, out, 0), PIPE_AXIS)
    return out.reshape(b, *x.shape[1:])
