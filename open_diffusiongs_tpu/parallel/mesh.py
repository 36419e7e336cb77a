"""Device meshes and sharding rules.

The reference scales with plain DDP over NCCL (SURVEY.md §2.3:
`ddp_find_unused_parameters_true`, torchrun nproc=8).  The TPU-native
equivalent is a jax.sharding.Mesh with a `data` axis over all chips: batch
sharded on `data`, parameters replicated, gradient all-reduce inserted by
XLA (riding ICI).  A second optional `model` axis is laid out for future
tensor-parallel sharding of the DiT width — unused (size 1) at reference
scale, matching SURVEY.md §2.3's "optional later".

Multi-host: call `jax.distributed.initialize()` before `make_mesh()`; the
mesh spans all processes' devices and per-host data loading feeds the local
shard (`local_batch_slice`).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
PIPE_AXIS = "pipe"
SEQ_AXIS = "seq"
MODEL_AXIS = "model"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              model_parallel: int = 1, seq_parallel: int = 1,
              pipe_parallel: int = 1) -> Mesh:
    """(data, pipe, seq, model) mesh: data-parallel batch over the outer
    axis, optional GPipe pipeline stages over `pipe`, optional sequence
    (ring/context) parallelism over `seq`, optional tensor parallelism
    over the inner `model` axis.  Axis order = communication intensity
    (innermost axes get the shortest ICI hops: TP all-reduces every layer,
    the seq ring every attention, the pipe ring every microbatch).
    Unused axes keep size 1, so every PartitionSpec works against every
    mesh."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    par = model_parallel * seq_parallel * pipe_parallel
    assert n % par == 0, (n, model_parallel, seq_parallel, pipe_parallel)
    arr = np.asarray(devices).reshape(
        n // par, pipe_parallel, seq_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS, SEQ_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis sharded over `data`, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch dict with the batch axis on `data`.

    Single-process: a plain device_put of the global batch.  Multi-process:
    each host passes its LOCAL slice of the global batch (see
    local_batch_slice / PrefetchLoader(process_slice=...)) and the global
    array is assembled across processes."""
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)

    def put(x):
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sh, x, global_shape)

    return jax.tree.map(put, batch)


def dit_tp_rule(path_keys, leaf) -> P:
    """Megatron-style tensor-parallel PartitionSpec for one leaf of the
    scanned DiT (params stacked [L, ...]): attention q/k/v (separate
    column-parallel projections — a fused [3d] axis cannot be head-aligned,
    models/transformer.py::Attention) / MLP fc1 split on the output
    (head/hidden) dim, proj / fc2 on the input dim — XLA inserts the
    all-reduces.  The head-sharded q/k/v outputs feed the shard_map'd
    attention kernel directly (zero collectives around attention).
    Anything unrecognized is replicated.  Applied by path so it also shards
    matching optimizer-moment leaves.  (The reference has no TP, SURVEY.md
    §2.3; this activates the reserved `model` axis.)"""
    j = "/".join(path_keys)
    nd = getattr(leaf, "ndim", 0)
    col = ("attn/q/kernel", "attn/k/kernel", "attn/v/kernel",
           "mlp/fc1/kernel")
    col_b = ("attn/q/bias", "attn/k/bias", "attn/v/bias", "mlp/fc1/bias")
    if any(c in j for c in col) and nd == 3:
        return P(None, None, MODEL_AXIS)
    if any(c in j for c in col_b) and nd == 2:
        return P(None, MODEL_AXIS)
    if ("attn/proj/kernel" in j or "mlp/fc2/kernel" in j) and nd == 3:
        return P(None, MODEL_AXIS, None)
    return P()


def tensor_parallel_state_sharding(mesh: Mesh, state) -> "Any":
    """NamedShardings for a whole TrainState under DiT tensor parallelism:
    every leaf (params, EMA, optimizer moments) is sharded by dit_tp_rule
    based on its tree path."""
    import jax

    def shard(path, leaf):
        keys = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
        return NamedSharding(mesh, dit_tp_rule(keys, leaf))

    return jax.tree_util.tree_map_with_path(shard, state)


def train_state_sharding(mesh: Mesh, state, tp: bool = False,
                         pp: bool = False, zero1: bool = False) -> "Any":
    """NamedShardings for a TrainState under any mix of tensor parallelism
    (dit_tp_rule on the width axes) and pipeline parallelism (the scanned
    DiT stack's leading [num_layers] axis sharded over `pipe` — params,
    EMA, and optimizer moments alike, so each stage's optimizer state
    lives with its layers).

    `zero1` additionally shards every optimizer-moment and EMA leaf over
    the `data` axis (ZeRO stage 1 / optimizer state sharding): params stay
    replicated for the forward, but inside the jitted step XLA partitions
    the AdamW update elementwise-on-shards — the gradient all-reduce
    becomes reduce-scatter (into the moment shards) + all-gather (of the
    param update), the same wire bytes as DDP while each chip holds only
    1/dp of mu/nu/EMA.  Exceeds the reference (plain DDP replicates
    optimizer state per GPU, SURVEY.md §2.3)."""
    import jax

    dp = mesh.shape.get(DATA_AXIS, 1)

    def shard(path, leaf):
        keys = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
        spec = dit_tp_rule(keys, leaf) if tp else P()
        nd = getattr(leaf, "ndim", 0)
        if pp and "layers" in "/".join(keys) and nd >= 1:
            parts = list(spec) + [None] * (nd - len(spec))
            parts[0] = PIPE_AXIS
            while parts and parts[-1] is None:
                parts.pop()
            spec = P(*parts)
        if zero1 and dp > 1 and keys and keys[0] in ("opt_state",
                                                     "ema_params"):
            spec = _zero1_spec(spec, getattr(leaf, "shape", ()), dp)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(shard, state)


def _zero1_spec(spec: P, shape, dp: int) -> P:
    """Shard the first free (un-sharded, dp-divisible) axis over `data`.
    Leaves with no such axis (scalars like the Adam count, odd-sized
    heads) stay as-is — correctness never depends on the split."""
    parts = list(spec) + [None] * (len(shape) - len(spec))
    for i, (s, n) in enumerate(zip(parts, shape)):
        if s is None and n % dp == 0 and n > 0:
            parts[i] = DATA_AXIS
            while parts and parts[-1] is None:
                parts.pop()
            return P(*parts)
    return spec


def local_batch_slice(global_batch: int) -> slice:
    """Per-process slice of the global batch (multi-host data loading)."""
    per = global_batch // jax.process_count()
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def eval_shard_indices(n_total: int, pid: Optional[int] = None,
                       nproc: Optional[int] = None) -> list:
    """Round-robin shard of the eval set for this process.

    The reference shards the val set per rank through Lightning's
    DistributedSampler and merges results with `all_gather_batch`
    (utils/misc.py:136-168); here each process owns indices
    pid, pid+nproc, ... and writes artifacts only for those scenes."""
    pid = jax.process_index() if pid is None else pid
    nproc = jax.process_count() if nproc is None else nproc
    return list(range(pid, n_total, nproc))


def allreduce_metric_sums(values: Sequence[float]) -> np.ndarray:
    """Sum a small vector of metric accumulators across all processes
    (`all_gather_batch` equivalent, utils/misc.py:136-168).  Every process
    must call this the same number of times.  Single-process: identity."""
    arr = np.asarray(values, np.float64)
    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(
        arr.astype(np.float32))                    # [nproc, k]
    return np.asarray(gathered, np.float64).sum(axis=0)
