"""Fused full-attention Pallas kernel, specialized for the DiT workload.

Replaces the stock splash kernel on the inference path (reference: xformers
flash attention, diffusionGS/models/transformers/utils_transformer.py:145-179).
The DiT's attention is *full* (no mask, no causality) over 4k-17k tokens with
16 heads x 64 dim — a shape where the general splash kernel leaves measurable
time on the table.  Specializations:

  * **Softmax row-sum folded into the PV matmul**: V is augmented with a
    *validity column* (1 for real rows, 0 for padding) to [bkv, 128].  An
    n=64 matmul already burns 128 output lanes on the MXU, so the widening
    is free, and the denominator comes out as acc[:, 64] — no VPU row-sum
    pass over the score matrix.
  * **exp2 with pre-scaled q**: q is multiplied by head_scale*log2(e) once
    outside; the inner loop is one subtract + one exp2 per score element.
  * **No per-element masking**: padding is handled entirely by the validity
    column (pad rows contribute nothing to numerator or denominator; their
    scores can only inflate the running max, which the flash recurrence is
    exact under).

Training path: a custom_vjp routes the backward pass through the splash
kernel's fused backward (exact gradients); the forward stays on this kernel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = math.log2(math.e)
_NT = (((1,), (1,)), ((), ()))   # contract last dims: A @ B^T
_NN = (((1,), (0,)), ((), ()))


def _fwd_kernel(q_ref, k_ref, v1_ref, o_ref, m_scr, acc_scr, *, nkv: int):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                 # [bq, d] bf16, pre-scaled
    k = k_ref[0]                                 # [bkv, d] bf16
    qk = lax.dot_general(q, k, _NT, preferred_element_type=jnp.float32)

    m_prev = m_scr[...]                          # [bq, 128]
    m_curr = qk.max(axis=-1)[:, None]            # [bq, 1]
    m_next = jnp.maximum(m_prev, m_curr)         # [bq, 128]
    p = jnp.exp2(qk - jnp.tile(m_next, (1, qk.shape[-1] // 128)))
    alpha = jnp.exp2(m_prev - m_next)            # [bq, 128]
    # PV in f32: the kernel is VPU-bound (v5e sweep: f32 PV 15.64 ms vs
    # bf16 PV 15.87 — the p->bf16 cast costs more than the extra MXU
    # passes), and f32 is more accurate anyway.
    o_curr = lax.dot_general(p, v1_ref[0].astype(jnp.float32), _NN,
                             preferred_element_type=jnp.float32)
    m_scr[...] = m_next
    acc_scr[...] = acc_scr[...] * alpha + o_curr

    @pl.when(j == nkv - 1)
    def _fin():
        acc = acc_scr[...]
        d = o_ref.shape[-1]
        l = jnp.maximum(acc[:, d:d + 1], 1e-30)  # pad q rows: avoid 0/0
        o_ref[0] = (acc[:, :d] / l).astype(o_ref.dtype)


def _mha_padded(q, k, v1, *, bq: int, bkv: int, interpret: bool = False):
    """q/k [h, L, d] bf16 (q pre-scaled by scale*log2e); v1 [h, L, 128]
    = [V*valid | valid | 0...].  L must be a multiple of bq and bkv."""
    h, L, d = q.shape
    assert L % bq == 0 and L % bkv == 0, (
        f"padded length {L} must be a multiple of both blocks ({bq}, {bkv}) "
        f"— a floor division here would silently truncate the KV sweep")
    nq, nkv = L // bq, L // bkv
    kern = functools.partial(_fwd_kernel, nkv=nkv)
    return pl.pallas_call(
        kern,
        grid=(h, nq, nkv),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0)),
            pl.BlockSpec((1, bkv, d), lambda h, i, j: (h, j, 0)),
            pl.BlockSpec((1, bkv, 128), lambda h, i, j: (h, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda h, i, j: (h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((h, L, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v1)


def pick_blocks(l: int) -> tuple[int, int]:
    """Block sizes from the v5e sweep (tools/bench_attn2.py)."""
    if l >= 8192:
        return 1024, 1024
    return 512, 512


# ---------------------------------------------------------------------------
# Packed-layout path: q/k/v stay in the DiT's natural [b, L, h*d] layout
# (head-major columns, exactly what the qkv projection emits), the kernel
# slices each head's 64 columns via the BlockSpec index map.  This removes
# every wrapper pass over HBM: no [b,l,h,d] transposes, no V|ones concat
# (the validity column is assembled once per head into a VMEM scratch on the
# first q-row sweep), no separate q pre-scale (folded into a per-q-block
# scratch copy).  The caller pads the token axis ONCE around the whole DiT
# stack instead of per layer.
# ---------------------------------------------------------------------------


def plan_packed(l: int) -> tuple[int, tuple[int, int]]:
    """(padded length, (bq, bkv)) for a DiT token count l — the caller pads
    the token axis once around the whole stack (models/transformer.py).

    v5e sweep (tools/bench_attn2.py): bq=1536 blocks edge out 512^2 blocks
    by ~3% at equal padding ((1536,512)@16896 15.55 ms vs (1024,1024)@17408
    15.64 at the 512^2 length; (1536,768) 2.16 vs (512,512) 2.22 at 4608),
    but padding waste is quadratic in lp, so the wide blocks are only used
    when the 512-aligned pad already lands on a multiple of 1536 (true for
    both flagship lengths: 16386 -> 16896, 4098 -> 4608; NOT true for e.g.
    scene-eval counts like 3074 -> 3584, which keep (512,512))."""
    lp = -(-l // 512) * 512
    if l > 2048 and lp % 1536 == 0:
        return lp, ((1536, 512) if l >= 8192 else (1536, 768))
    return lp, (512, 512)


def pick_packed_blocks(l: int) -> tuple[int, int]:
    return plan_packed(l)[1]


def _fwd_kernel_packed_smax(q_ref, k_ref, v_ref, o_ref, m_scr, acc_scr,
                            q_scr, v1_scr, *, nkv: int, bkv: int,
                            l_real: int, masked: bool, scale: float,
                            dh: int, hps: int):
    """Packed kernel with a BLOCK-SCALAR flash recurrence: the running max
    is one scalar per (q-block, head) instead of per row.  This removes
    the per-element work of the row-max path (the [bq, 128] m tile
    materialize + per-row rescale) — the VPU inner loop drops to one
    scalar-subtract + one exp2 per score element, plus the unavoidable
    block max reduction.

    Numerics: with a shared scale M, p_ij = 2^(s_ij - M) and the row
    denominator share the same factor, so softmax ratios are exact in
    infinite precision; in f32 a row only degrades if its entire score
    range sits >~126 below the block max (p underflows to 0), which no
    real activation distribution approaches (scores span ~tens).  Pad
    rows keep the exact validity-column algebra.  Parity is asserted at
    2e-2 in bf16 against XLA attention (tests/test_attention.py)."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        for s in range(hps):
            m_scr[0, s] = jnp.float32(-1e30)   # SMEM: scalar stores only
        acc_scr[...] = jnp.zeros_like(acc_scr)
        q_scr[...] = (q_ref[...].astype(jnp.float32)
                      * scale).astype(q_scr.dtype)

    v = v_ref[...]                                  # [bkv, hps*dh]
    k_blk = k_ref[...]
    if masked:
        rows = lax.broadcasted_iota(jnp.int32, (bkv, 1), 0) + j * bkv
        keep = rows < l_real
        v = jnp.where(keep, v, 0)
        k_blk = jnp.where(keep, k_blk, 0)
        valid = jnp.broadcast_to(keep.astype(v.dtype), (bkv, 128 - dh))
    else:
        valid = jnp.ones((bkv, 128 - dh), v.dtype)
    for s in range(hps):
        v1_scr[:, s * 128: s * 128 + dh] = v[:, s * dh:(s + 1) * dh]
        v1_scr[:, s * 128 + dh:(s + 1) * 128] = valid

    for s in range(hps):
        hc = slice(s * dh, (s + 1) * dh)
        qk = lax.dot_general(q_scr[:, hc], k_blk[:, hc], _NT,
                             preferred_element_type=jnp.float32)
        mc = slice(s * 128, (s + 1) * 128)
        m_prev = m_scr[0, s]
        m_next = jnp.maximum(m_prev, jnp.max(qk))   # scalar
        p = jnp.exp2(qk - m_next)
        alpha = jnp.exp2(m_prev - m_next)           # scalar
        o_curr = lax.dot_general(
            p, v1_scr[:, mc].astype(jnp.float32), _NN,
            preferred_element_type=jnp.float32)
        m_scr[0, s] = m_next
        acc_scr[:, mc] = acc_scr[:, mc] * alpha + o_curr

    @pl.when(j == nkv - 1)
    def _fin():
        for s in range(hps):
            acc = acc_scr[:, s * 128:(s + 1) * 128]
            l = jnp.maximum(acc[:, dh:dh + 1], 1e-30)
            o_ref[:, s * dh:(s + 1) * dh] = (acc[:, :dh] / l
                                             ).astype(o_ref.dtype)


def _fwd_kernel_packed(q_ref, k_ref, v_ref, o_ref, m_scr, acc_scr, q_scr,
                       v1_scr, *, nkv: int, bkv: int, l_real: int,
                       masked: bool, scale: float, dh: int, hps: int):
    """One grid step processes `hps` heads (a 128-column group: Pallas TPU
    block last-dims must be 128-divisible, so a single 64-wide head slice
    is not addressable — and the grouping halves grid overhead anyway)."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        # pre-scale q once per q-block sweep (scale * log2e, exp2 domain)
        q_scr[...] = (q_ref[...].astype(jnp.float32)
                      * scale).astype(q_scr.dtype)

    # [V | valid] per head of the group.  Pad rows (global row >= l_real —
    # padding can span multiple kv blocks) are zeroed in both V and the
    # validity columns, so they contribute nothing to numerator or
    # denominator (the [bkv, 128*hps] build is ~8% of the score-element
    # VPU work; an lp-resident scratch would not fit VMEM at 512^2).
    v = v_ref[...]                                  # [bkv, hps*dh]
    k_blk = k_ref[...]
    if masked:
        rows = lax.broadcasted_iota(jnp.int32, (bkv, 1), 0) + j * bkv
        keep = rows < l_real
        v = jnp.where(keep, v, 0)
        # Zero pad K rows too: their scores must stay bounded (exactly 0),
        # not whatever the layer stack left in the pad rows — a huge
        # garbage score would inflate the running max and underflow every
        # REAL key's exp2, zeroing the row despite the exact validity
        # algebra handling the denominator.
        k_blk = jnp.where(keep, k_blk, 0)
        valid = jnp.broadcast_to(keep.astype(v.dtype), (bkv, 128 - dh))
    else:
        valid = jnp.ones((bkv, 128 - dh), v.dtype)
    for s in range(hps):
        v1_scr[:, s * 128: s * 128 + dh] = v[:, s * dh:(s + 1) * dh]
        v1_scr[:, s * 128 + dh:(s + 1) * 128] = valid

    for s in range(hps):
        hc = slice(s * dh, (s + 1) * dh)
        qk = lax.dot_general(q_scr[:, hc], k_blk[:, hc], _NT,
                             preferred_element_type=jnp.float32)
        mc = slice(s * 128, (s + 1) * 128)
        m_prev = m_scr[:, mc]
        m_curr = qk.max(axis=-1)[:, None]
        m_next = jnp.maximum(m_prev, m_curr)
        p = jnp.exp2(qk - jnp.tile(m_next, (1, qk.shape[-1] // 128)))
        alpha = jnp.exp2(m_prev - m_next)
        o_curr = lax.dot_general(
            p, v1_scr[:, mc].astype(jnp.float32), _NN,
            preferred_element_type=jnp.float32)
        m_scr[:, mc] = m_next
        acc_scr[:, mc] = acc_scr[:, mc] * alpha + o_curr

    @pl.when(j == nkv - 1)
    def _fin():
        for s in range(hps):
            acc = acc_scr[:, s * 128:(s + 1) * 128]
            l = jnp.maximum(acc[:, dh:dh + 1], 1e-30)
            o_ref[:, s * dh:(s + 1) * dh] = (acc[:, :dh] / l
                                             ).astype(o_ref.dtype)


def flash_mha_packed(q, k, v, *, num_heads: int, l_real: int,
                     blocks: tuple[int, int] | None = None,
                     group_cols: int | None = None,
                     scalar_max: bool = False,
                     interpret: bool = False):
    """Full MHA on the packed layout.  q/k/v: [b, Lp, h*d_h] with head-major
    columns (column h*d_h + c is head h, channel c) and Lp already padded to
    a block multiple; rows >= l_real are padding.  Returns [b, Lp, h*d_h]
    (pad rows garbage).  Requires d_h <= 64 and 128 % d_h == 0.

    `group_cols` (a multiple of 128) is how many head columns one grid step
    processes — Pallas TPU blocks need 128-divisible last dims, and wider
    groups amortize per-step overhead at short sequence lengths (fewer grid
    steps).  num_heads must be divisible by group_cols // d_h."""
    b, lp, hd = q.shape
    dh = hd // num_heads
    gc = group_cols or pick_group_cols(l_real)
    gc = min(gc, hd)
    if num_heads % (gc // dh) != 0:
        gc = 128                        # narrow fallback always divides
    hps = gc // dh
    assert dh <= 64 and 128 % dh == 0 and gc % 128 == 0, (dh, gc)
    assert num_heads % hps == 0, (num_heads, hps)
    bq, bkv = blocks or pick_packed_blocks(l_real)
    assert lp % bq == 0 and lp % bkv == 0, (lp, bq, bkv)
    nq, nkv = lp // bq, lp // bkv
    groups = num_heads // hps

    body = _fwd_kernel_packed_smax if scalar_max else _fwd_kernel_packed
    kern = functools.partial(
        body, nkv=nkv, bkv=bkv, l_real=l_real,
        masked=lp > l_real, scale=dh ** -0.5 * LOG2E, dh=dh, hps=hps)
    m_scratch = (pltpu.SMEM((1, hps), jnp.float32) if scalar_max
                 else pltpu.VMEM((bq, 128 * hps), jnp.float32))

    def run(qi, ki, vi):
        return pl.pallas_call(
            kern,
            grid=(groups, nq, nkv),
            in_specs=[
                pl.BlockSpec((bq, gc), lambda g, i, j: (i, g)),
                pl.BlockSpec((bkv, gc), lambda g, i, j: (j, g)),
                pl.BlockSpec((bkv, gc), lambda g, i, j: (j, g)),
            ],
            out_specs=pl.BlockSpec((bq, gc), lambda g, i, j: (i, g)),
            out_shape=jax.ShapeDtypeStruct((lp, hd), qi.dtype),
            scratch_shapes=[
                m_scratch,
                pltpu.VMEM((bq, 128 * hps), jnp.float32),
                pltpu.VMEM((bq, gc), qi.dtype),
                pltpu.VMEM((bkv, 128 * hps), vi.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary")),
            interpret=interpret,
        )(qi, ki, vi)

    return jax.vmap(run)(q, k, v)


def pick_group_cols(l: int) -> int:
    """Head columns per grid step.  The v5e sweep (tools/bench_attn3.py)
    says wider groups do NOT pay: at L=4098, gc=256 runs 2.08-2.10 ms vs
    2.03 at gc=128, and gc>=256 with bq=1536 fails to compile (VMEM).
    Keep 128; the knob stays for experimentation."""
    del l
    return 128


def flash_full_mha(q, k, v, *, blocks: tuple[int, int] | None = None,
                   interpret: bool = False):
    """Full (unmasked) multi-head attention.  q/k/v: [b, l, h, d], d <= 64.

    Inference-path forward kernel; no JAX autodiff support (the DiT wraps it
    in a custom_vjp that routes gradients through splash — see
    models/transformer.py::fused_attention).
    """
    b, l, h, d = q.shape
    assert d <= 64, "kernel assumes head_dim <= 64 (DiT uses 64)"
    bq, bkv = blocks or pick_blocks(l)
    blk = math.lcm(bq, bkv)   # lp must divide by BOTH blocks (see _mha_padded)
    lp = -(-l // blk) * blk

    scale = jnp.asarray(d ** -0.5 * LOG2E, q.dtype)
    pad = ((0, 0), (0, lp - l), (0, 0), (0, 0))
    qp = jnp.pad(q * scale, pad).transpose(0, 2, 1, 3)   # [b, h, lp, d]
    kp = jnp.pad(k, pad).transpose(0, 2, 1, 3)
    vp = jnp.pad(v, pad).transpose(0, 2, 1, 3)
    valid = (jnp.arange(lp) < l).astype(v.dtype)[None, :, None]
    v1 = jnp.concatenate(
        [vp * valid[None],
         jnp.broadcast_to(valid[None], (b, h, lp, 1)),
         jnp.zeros((b, h, lp, 128 - d - 1), v.dtype)], axis=-1)

    run = functools.partial(_mha_padded, bq=bq, bkv=bkv, interpret=interpret)
    out = jax.vmap(run)(qp, kp, v1)                       # [b, h, lp, d]
    return out.transpose(0, 2, 1, 3)[:, :l]
