"""Ring attention: exact full self-attention over a token-sharded sequence.

Sequence (context) parallelism for the DiT: the 512^2 object model attends
over L=16896 tokens, and attention is the only op in the block that couples
tokens — everything else (LayerNorm, adaLN modulate, MLP, q/k/v/proj Dense)
is per-token and shards over a `seq` mesh axis for free.  This module
supplies the coupling op: each device holds an L/sp slice of q/k/v, the k/v
slices rotate around the ring via `lax.ppermute` (riding ICI neighbor
links), and a flash-style running (max, sum, accumulator) makes the result
exact — bit-comparable to single-device attention up to f32 reassociation.

The reference has no sequence parallelism at all (it trains DDP-only,
SURVEY.md §2.3); this exceeds parity the same way the dp x tp mesh does,
and is the natural TPU scaling axis for the token-heavy 512^2 workload.

Shapes follow the DiT's packed layout: local q/k/v are [b, l_loc, h*dh]
with head-major columns (models/transformer.py::Attention).  Under combined
tensor parallelism the channel axis is additionally sharded over `model`,
which just means fewer local heads — the ring math is per-head and does not
care.  Autodiff works through `lax.scan` + `lax.ppermute` (the backward
rotates gradients the opposite way), so the same code serves training.

Two per-step compute paths share the ring algebra:

  * the XLA path (jnp inside shard_map): per ring step it computes
    [l_loc, csize] score tiles per head with f32 accumulation, sub-chunking
    the incoming k/v slice so the tile stays bounded;
  * the **packed-kernel path** (`use_kernel=True`): each ring step runs the
    custom Pallas kernel (ops/attention.py::flash_mha_packed,
    `with_stats=True`) on local q vs the incoming k/v slice and combines
    the per-slice (normalized output, exp2-domain LSE) pairs across steps
    with the flash recurrence — exact, because a slice-local softmax plus
    its LSE is sufficient statistics for the global softmax:
    out = sum_t o_t * 2^(lse_t - LSE),  LSE = log2 sum_t 2^(lse_t).
    Gradients route through the XLA path via custom_vjp (the two paths
    compute the same function up to f32 reassociation), so training under
    remat pays one XLA-ring backward — the same deal the blend kernel made
    in round 2 before its analytic backward existed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_NEG = -1e30


def _pick_chunk(l_loc: int, target: int = 512) -> int:
    """Largest divisor of l_loc that is <= target (>= 64 preferred).

    The local slice length is a multiple of 512/sp for 512-aligned padded
    lengths, so this usually lands on 256-512; a pathological prime l_loc
    falls back to one whole-slice chunk rather than degenerate tiles.
    """
    best = l_loc
    for c in range(min(target, l_loc), 63, -1):
        if l_loc % c == 0:
            return c
    return best


def _flash_update(m, s, o, q4, kk, vv, valid):
    """One flash-accumulation step against a k/v chunk.

    m/s: [b, h, lq] f32 running max / denominator; o: [b, h, lq, dh] f32
    unnormalized accumulator.  q4: [b, lq, h, dh] (pre-scaled);
    kk/vv: [b, c, h, dh]; valid: [c] bool (False = pad key row).
    """
    scores = jnp.einsum("blhd,bchd->bhlc", q4, kk,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(valid[None, None, None, :], scores, _NEG)
    m_new = jnp.maximum(m, scores.max(axis=-1))
    # Masked columns can still yield exp(0)=1 when the whole row is masked
    # (scores == m_new == _NEG), so the validity multiply is load-bearing.
    p = jnp.exp(scores - m_new[..., None]) * valid[None, None, None, :]
    alpha = jnp.exp(m - m_new)
    s_new = s * alpha + p.sum(axis=-1)
    o_new = o * alpha[..., None] + jnp.einsum(
        "bhlc,bchd->bhld", p, vv.astype(jnp.float32),
        preferred_element_type=jnp.float32)
    return m_new, s_new, o_new


def pick_ring_blocks(lq: int) -> tuple[int, int]:
    """(bq, bkv) for the per-slice packed-kernel call: the largest entries
    of the forward sweep's known-good ladder that divide the local slice
    length (Lp/sp is 128-aligned but often not 512-aligned, e.g.
    16896/2 = 8448 = 128*66)."""
    bq = next(b for b in (1536, 1408, 1024, 768, 512, 384, 256, 128)
              if lq % b == 0)
    bkv = next(b for b in (512, 384, 256, 128) if lq % b == 0)
    return bq, bkv


def ring_kernel_eligible(lq: int, hd: int, dh: int, l_real: int,
                         sp: int) -> bool:
    """Static preconditions for the packed-kernel ring path (else the
    caller falls back to the XLA path): 128-aligned slices for the block
    plan, a head group that fills the kernel's 128-column band
    (ops/attention.py::_packed_dims), and at least one real key row in the
    tail shard's slice (all-pad slices would need a degenerate kernel
    variant nothing instantiates)."""
    h = hd // dh
    hps = 128 // dh
    return (lq % 128 == 0 and dh <= 64 and 128 % dh == 0
            and h % hps == 0 and l_real > (sp - 1) * lq)


def _ring_kernel_path(q, k, v, *, dh: int, l_real: int, sp: int,
                      seq_axis: str, interpret: bool):
    """Ring sweep where each step is one packed-kernel call on the local q
    against the incoming k/v slice; per-slice (o_t, lse_t) combine exactly
    via the exp2-domain flash recurrence (module docstring)."""
    from ..ops.attention import flash_mha_packed

    b, lq, hd = q.shape
    h = hd // dh
    my = lax.axis_index(seq_axis)
    perm = [(i, (i + 1) % sp) for i in range(sp)]
    blocks = pick_ring_blocks(lq)
    lsub = l_real - (sp - 1) * lq          # real rows in the tail slice

    def _slice_attn(lr):
        def g(qq, kk, vv):
            return flash_mha_packed(qq, kk, vv, num_heads=h, l_real=lr,
                                    blocks=blocks, with_stats=True,
                                    interpret=interpret)
        return g

    def step_stats(qq, kk, vv, src):
        if lsub == lq:                      # no pad keys anywhere
            return _slice_attn(lq)(qq, kk, vv)
        # only the tail shard's slice carries pad key rows; both branches
        # are static kernel instantiations (masked vs unmasked)
        return lax.cond(src == sp - 1, _slice_attn(lsub), _slice_attn(lq),
                        qq, kk, vv)

    m0 = jnp.full((b, lq, h), _NEG, jnp.float32)
    s0 = jnp.zeros((b, lq, h), jnp.float32)
    o0 = jnp.zeros((b, lq, h, dh), jnp.float32)

    def ring_step(carry, t):
        m, s, oa, kc, vc = carry
        src = (my - t) % sp
        o_t, lse_t = step_stats(q, kc, vc, src)         # [b,lq,hd], [b,lq,h]
        m_new = jnp.maximum(m, lse_t)
        alpha = jnp.exp2(m - m_new)
        w = jnp.exp2(lse_t - m_new)
        s = s * alpha + w
        oa = (oa * alpha[..., None]
              + o_t.astype(jnp.float32).reshape(b, lq, h, dh)
              * w[..., None])
        kc = lax.ppermute(kc, seq_axis, perm)
        vc = lax.ppermute(vc, seq_axis, perm)
        return (m_new, s, oa, kc, vc), None

    (m, s, oa, _, _), _ = lax.scan(
        ring_step, (m0, s0, o0, k, v), jnp.arange(sp, dtype=jnp.int32))
    out = oa / jnp.maximum(s, 1e-30)[..., None]
    return out.reshape(b, lq, hd).astype(q.dtype)


def ring_attention(q, k, v, *, dh: int, l_real: int, sp: int,
                   seq_axis: str, kv_chunk: int = 512,
                   use_kernel: bool = False, interpret: bool = False):
    """Exact full MHA over a ring-sharded token axis (call inside shard_map).

    q/k/v: local [b, l_loc, h*dh] slices (head-major packed columns) of a
    global [b, sp*l_loc, h*dh] sequence; global rows >= l_real are padding
    and are masked as keys (pad q rows return garbage, as in the packed
    kernel — the caller slices them off).  Returns the local output slice,
    same shape/dtype as q.

    `use_kernel=True` runs each ring step through the packed Pallas kernel
    (requires `ring_kernel_eligible`); forward only — gradients fall back
    to the XLA path via custom_vjp (see module docstring).
    """
    if use_kernel:
        lq, hd = q.shape[1], q.shape[2]
        assert ring_kernel_eligible(lq, hd, dh, l_real, sp), \
            (lq, hd, dh, l_real, sp)

        def _xla(qq, kk, vv):
            return ring_attention(qq, kk, vv, dh=dh, l_real=l_real, sp=sp,
                                  seq_axis=seq_axis, kv_chunk=kv_chunk)

        @jax.custom_vjp
        def f(qq, kk, vv):
            return _ring_kernel_path(qq, kk, vv, dh=dh, l_real=l_real,
                                     sp=sp, seq_axis=seq_axis,
                                     interpret=interpret)

        def fwd(qq, kk, vv):
            return f(qq, kk, vv), (qq, kk, vv)

        def bwd(res, g):
            _, vjp = jax.vjp(_xla, *res)
            return vjp(g)

        f.defvjp(fwd, bwd)
        return f(q, k, v)

    b, lq, hd = q.shape
    h = hd // dh
    assert h * dh == hd, (hd, dh)
    csize = _pick_chunk(lq, kv_chunk)
    n_sub = lq // csize
    my = lax.axis_index(seq_axis)
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    scale = dh ** -0.5
    q4 = ((q.reshape(b, lq, h, dh).astype(jnp.float32) * scale)
          .astype(q.dtype))
    m0 = jnp.full((b, h, lq), _NEG, jnp.float32)
    s0 = jnp.zeros((b, h, lq), jnp.float32)
    o0 = jnp.zeros((b, h, lq, dh), jnp.float32)
    offs = jnp.arange(n_sub, dtype=jnp.int32) * csize

    def ring_step(carry, t):
        m, s, o, kc, vc = carry
        src = (my - t) % sp                      # origin shard of this slice
        base = src * lq                          # its global row offset
        k5 = jnp.moveaxis(kc.reshape(b, n_sub, csize, h, dh), 1, 0)
        v5 = jnp.moveaxis(vc.reshape(b, n_sub, csize, h, dh), 1, 0)

        def sub(car, xs):
            mi, si, oi = car
            kk, vv, off = xs
            rows = base + off + jnp.arange(csize, dtype=jnp.int32)
            return _flash_update(mi, si, oi, q4, kk, vv, rows < l_real), None

        (m, s, o), _ = lax.scan(sub, (m, s, o), (k5, v5, offs))
        kc = lax.ppermute(kc, seq_axis, perm)
        vc = lax.ppermute(vc, seq_axis, perm)
        return (m, s, o, kc, vc), None

    (m, s, o, _, _), _ = lax.scan(
        ring_step, (m0, s0, o0, k, v), jnp.arange(sp, dtype=jnp.int32))
    out = o / jnp.maximum(s, 1e-30)[..., None]   # [b, h, lq, dh]
    return jnp.moveaxis(out, 1, 2).reshape(b, lq, hd).astype(q.dtype)


def make_ring_attention(mesh, *, dh: int, l_real: int,
                        kv_chunk: int = 512,
                        use_kernel: str | bool = "auto"):
    """shard_map-wrapped ring attention over `mesh`'s seq axis.

    In/out specs shard the batch on `data` (when present), tokens on `seq`,
    and the head-major channel axis on `model` (when present) — i.e. the
    exact layout the column-parallel q/k/v projections emit under dp x sp
    x tp.  The returned callable takes global [b, Lp, h*dh] arrays.
    """
    from jax.sharding import PartitionSpec as P

    from .mesh import DATA_AXIS, MODEL_AXIS, SEQ_AXIS

    axes = mesh.axis_names
    assert SEQ_AXIS in axes, f"mesh {axes} has no '{SEQ_AXIS}' axis"
    sp = mesh.shape[SEQ_AXIS]
    spec = P(DATA_AXIS if DATA_AXIS in axes else None,
             SEQ_AXIS,
             MODEL_AXIS if MODEL_AXIS in axes else None)
    interpret = jax.default_backend() != "tpu"

    def fn(q, k, v):
        uk = use_kernel
        if uk == "auto":
            # kernel per ring step on real TPU when the local shapes allow;
            # the CPU/virtual-mesh default stays the XLA path (tests opt
            # into the kernel explicitly, running it in interpret mode).
            # On-device validation (tools/validate_ring_kernel.py, v5e):
            # the plan's (1408, 384) blocks compile + match the XLA
            # reference at the flagship slices lq=8448 (7.3 ms) and
            # lq=4224 (4.0 ms); non-128-aligned slices are ineligible and
            # ride XLA
            uk = (not interpret) and ring_kernel_eligible(
                q.shape[1], q.shape[2], dh, l_real, sp)
        return ring_attention(q, k, v, dh=dh, l_real=l_real, sp=sp,
                              seq_axis=SEQ_AXIS, kv_chunk=kv_chunk,
                              use_kernel=uk, interpret=interpret)

    return jax.shard_map(fn, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)
