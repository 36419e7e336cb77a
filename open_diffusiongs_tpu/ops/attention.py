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

Training path: the packed forward additionally exports the per-row
log-sum-exp (`with_stats=True`), and `flash_mha_packed_bwd` computes
analytic gradients with a specialized dQ/dKV kernel pair — no splash
fallback, no extra forward (models/transformer.py::_make_packed_attn
wires the custom_vjp).
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


def _fwd_kernel_packed_stats(q_ref, k_ref, v_ref, o_ref, st_ref, m_scr,
                             acc_scr, q_scr, v1_scr, **kw):
    """Stats-exporting variant (training forward): also writes the exp2-
    domain log-sum-exp per row into st_ref column 2*s of each head s —
    the only forward fact the analytic backward kernel needs."""
    _fwd_kernel_packed(q_ref, k_ref, v_ref, o_ref, m_scr, acc_scr, q_scr,
                       v1_scr, st_ref=st_ref, **kw)


def _fwd_kernel_packed(q_ref, k_ref, v_ref, o_ref, m_scr, acc_scr, q_scr,
                       v1_scr, *, nkv: int, bkv: int, l_real: int,
                       masked: bool, scale: float, dh: int, hps: int,
                       st_ref=None):
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
            if st_ref is not None:
                # exp2-domain LSE: p_norm = exp2(s~ - lse).  The m tile is
                # constant across its 128 columns (built by broadcast max),
                # so column 0 carries the row max.
                st_ref[:, 2 * s:2 * s + 1] = (
                    m_scr[:, s * 128:s * 128 + 1] + jnp.log2(l))


_TN = (((0,), (0,)), ((), ()))   # contract first dims: A^T @ B


def _bwd_load_kv(k_ref, v_ref, j, *, bkv: int, l_real: int, masked: bool):
    """K/V block with pad rows zeroed.  Zeroed K bounds recomputed pad
    scores (exp2(qk - lse) stays ~1 instead of overflowing on garbage
    rows); zeroed V makes pad columns contribute exactly nothing to dP
    and hence to dQ."""
    k_blk = k_ref[...]
    v_blk = v_ref[...]
    if masked:
        rows = lax.broadcasted_iota(jnp.int32, (bkv, 1), 0) + j * bkv
        keep = rows < l_real
        k_blk = jnp.where(keep, k_blk, 0)
        v_blk = jnp.where(keep, v_blk, 0)
    return k_blk, v_blk


def _bwd_head_ds(s, qs, k_blk, v_blk, do_blk, st_ref, *, dh: int):
    """Recompute one head's TRANSPOSED [bkv, bq] probability tile Pᵀ and
    softmax gradient dSᵀ = Pᵀ*(dPᵀ - delta) from the forward stats (stT
    rows 2s = exp2-domain lse, 2s+1 = delta = rowsum(dO*O) of head s).

    The transposed orientation is the whole performance story of this
    backward: lse/delta are per-*q-row* facts, and in the [bq, bkv]
    orientation they must lane-broadcast from a 1-wide column — which
    Mosaic lowers catastrophically (measured 685.8 -> 50.6 ms/pair at
    L=16386 when the broadcast is removed, docs/PERF_NOTES.md round 4).
    With q on the LANE axis they enter as [1, bq] rows and broadcast along
    sublanes for free, and every consuming matmul (dQ = dSᵀᵀ·K,
    dV = Pᵀ·dO, dK = dSᵀ·Q) contracts natively off the transposed tiles —
    no transposes anywhere.  Both outputs are cast to the input dtype so
    the matmuls run as single-pass bf16 MXU ops on TPU."""
    hc = slice(s * dh, (s + 1) * dh)
    qk_t = lax.dot_general(k_blk[:, hc], qs[:, hc], _NT,
                           preferred_element_type=jnp.float32)  # [bkv, bq]
    lse = st_ref[2 * s:2 * s + 1, :]                            # [1, bq]
    dlt = st_ref[2 * s + 1:2 * s + 2, :]
    p_t = jnp.exp2(qk_t - lse)
    dp_t = lax.dot_general(v_blk[:, hc], do_blk[:, hc], _NT,
                           preferred_element_type=jnp.float32)  # [bkv, bq]
    ds_t = p_t * (dp_t - dlt)
    return hc, p_t.astype(do_blk.dtype), ds_t.astype(qs.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, st_ref, dq_ref, *,
                   nkv: int, bkv: int, l_real: int, masked: bool,
                   scale: float, dh: int, hps: int):
    """dQ sweep: q block resident, kv blocks stream (inner grid dim).

    Exp2-domain flash backward: with q~ = q*scale*log2e and true logits
    z = ln2*q~·k, dL/dz = P*(dP - delta) = dS as computed, so
    dL/dq = true_scale * dS·K = (scale/log2e) * dS·K."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    k_blk, v_blk = _bwd_load_kv(k_ref, v_ref, j, bkv=bkv, l_real=l_real,
                                masked=masked)
    qs = (q_ref[...].astype(jnp.float32) * scale).astype(q_ref.dtype)
    do_blk = do_ref[...]
    for s in range(hps):
        hc, _, ds_t = _bwd_head_ds(s, qs, k_blk, v_blk, do_blk, st_ref,
                                   dh=dh)
        dq_ref[:, hc] += lax.dot_general(                 # dSᵀᵀ·K: [bq, dh]
            ds_t, k_blk[:, hc], _TN, preferred_element_type=jnp.float32)

    @pl.when(j == nkv - 1)
    def _fin():
        dq_ref[...] = dq_ref[...] * (scale / LOG2E)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, st_ref, dk_ref, dv_ref, *,
                    nq: int, bkv: int, l_real: int, masked: bool,
                    scale: float, dh: int, hps: int):
    """dK/dV sweep: kv blocks resident, q/do/stats blocks stream (inner
    grid dim).  dV = P^T·dO exactly; dK accumulates dS^T·q~ against the
    exp2-pre-scaled q~, so the finalizer multiplies by ln2 = 1/log2e
    (dL/dk = true_scale * dS^T·q = (1/log2e) * dS^T·q~)."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    j = pl.program_id(1)
    k_blk, v_blk = _bwd_load_kv(k_ref, v_ref, j, bkv=bkv, l_real=l_real,
                                masked=masked)
    qs = (q_ref[...].astype(jnp.float32) * scale).astype(q_ref.dtype)
    do_blk = do_ref[...]
    for s in range(hps):
        hc, p_t, ds_t = _bwd_head_ds(s, qs, k_blk, v_blk, do_blk, st_ref,
                                     dh=dh)
        dv_ref[:, hc] += lax.dot_general(                 # Pᵀ·dO: [bkv, dh]
            p_t, do_blk[:, hc], _NN, preferred_element_type=jnp.float32)
        dk_ref[:, hc] += lax.dot_general(                 # dSᵀ·Q: [bkv, dh]
            ds_t, qs[:, hc], _NN, preferred_element_type=jnp.float32)

    @pl.when(i == nq - 1)
    def _fin():
        dk_ref[...] = dk_ref[...] * (1.0 / LOG2E)


def _packed_dims(hd: int, num_heads: int, l_real: int,
                 group_cols: int | None):
    dh = hd // num_heads
    gc = group_cols or pick_group_cols(l_real)
    gc = min(gc, hd)
    if num_heads % (gc // dh) != 0:
        gc = 128                        # narrow fallback always divides
    hps = gc // dh
    assert dh <= 64 and 128 % dh == 0 and gc % 128 == 0, (dh, gc)
    assert num_heads % hps == 0, (num_heads, hps)
    return dh, gc, hps, num_heads // hps


def pick_packed_bwd_blocks(l: int) -> tuple[int, int]:
    """Backward block sizes.  History: the first on-device compile
    (2026-08-18) hit the 16 MiB default VMEM scope at (512, 512) (dKV
    Mosaic stack 35.73 MiB) and fell back to (256, 256) — which measured
    1338 ms/pair at L=16386: ~70k grid steps of ~17 MFLOP each, pure
    per-step overhead (docs/PERF_NOTES.md round-4 sweep).  The fix was
    never the blocks alone: raising the scope to 64 MiB and widening the
    sweep settles the defaults recorded here."""
    del l
    return 512, 512


def pick_packed_bwd_gc(l: int) -> int:
    """Head-group width for the backward kernels.  Wider groups cut grid
    steps linearly (groups = h*dh/gc) — and unlike the forward (whose
    per-step work is already MXU-bound at gc=128), the backward at
    modest blocks keeps some per-step overhead, so gc=256 measured 4.4%
    faster than gc=128 at (512, 512) blocks (48.6 vs 50.8 ms at L=16386,
    round-4 sweep in docs/PERF_NOTES.md).  Needs the 100M VMEM scope."""
    del l
    return 256


def flash_mha_packed_bwd(q, k, v, o, do, lse, *, num_heads: int,
                         l_real: int,
                         blocks: tuple[int, int] | None = None,
                         group_cols: int | None = None,
                         vmem_limit_mb: int | None = None,
                         interpret: bool = False):
    """Analytic (dq, dk, dv) for `flash_mha_packed` — the training-path
    backward (reference analogue: xformers' fused flash backward behind
    utils_transformer.py:145-179; the round-2 repo routed this through the
    generic splash kernel pair plus an extra splash forward).

    q/k/v: the packed [b, Lp, h*d_h] primals; o/lse: the stats-forward's
    outputs (`with_stats=True`); do: the output cotangent (pad rows may
    hold garbage — masked here).  Returns cotangents in the primal dtypes
    with pad rows zeroed, so pad tokens contribute exactly nothing to the
    projection grads.

    Two pallas_calls (dQ with the kv sweep inner; dK/dV with the q sweep
    inner) rather than one fused kernel: a fused kernel needs full-length
    [Lp, gc] f32 dK/dV output windows resident in VMEM — 2 x 8.25 MiB at
    the 512^2 flagship Lp=16896, over the ~16 MiB budget (and Pallas has
    no HBM read-modify-write accumulation).  The recomputed score tiles
    cost 2 extra MXU passes per (i, j, head) — the standard flash-
    attention backward trade; the CUDA reference backward makes the same
    split."""
    b, lp, hd = q.shape
    dh, gc, hps, groups = _packed_dims(
        hd, num_heads, l_real,
        group_cols if group_cols is not None else pick_packed_bwd_gc(l_real))
    bq, bkv = blocks or pick_packed_bwd_blocks(l_real)
    assert lp % bq == 0 and lp % bkv == 0, (lp, bq, bkv)
    nq, nkv = lp // bq, lp // bkv

    valid = (jnp.arange(lp) < l_real)[None, :, None]
    do = jnp.where(valid, do, 0).astype(q.dtype)
    # delta_i = rowsum(dO_i * O_i) per head — with the forward lse, the
    # only per-row facts the backward algebra needs.
    delta = (do.astype(jnp.float32) * o.astype(jnp.float32)
             ).reshape(b, lp, num_heads, dh).sum(-1)
    st = _interleave_stats(lse, delta, groups=groups, hps=hps)
    kw = dict(bkv=bkv, l_real=l_real, masked=lp > l_real,
              scale=dh ** -0.5 * LOG2E, dh=dh, hps=hps)
    dq_kern = functools.partial(_bwd_dq_kernel, nkv=nkv, **kw)
    dkv_kern = functools.partial(_bwd_dkv_kernel, nq=nq, **kw)

    band_h = _stats_band_h(hps)

    def run(qi, ki, vi, doi, sti):
        q_spec = pl.BlockSpec((bq, gc), lambda g, i, j: (i, g))
        kv_spec = pl.BlockSpec((bkv, gc), lambda g, i, j: (j, g))
        st_spec = pl.BlockSpec((band_h, bq), lambda g, i, j: (g, i))
        # Scoped-VMEM budget: the dKV kernel's Mosaic stack is far larger
        # than the naive tile arithmetic (measured 17.21M at (256, 256),
        # 35.73M at (512, 512), both gc=128 — default scope is 16M;
        # physical VMEM is 128M).  Keeping the limit below physical makes
        # an oversized stack fail GRACEFULLY (scoped-allocation error)
        # instead of wedging the remote backend.  100M admits the settled
        # (512, 512)/gc=256 sweep point (compiled + measured 2026-08-19).
        cparams = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=(vmem_limit_mb or 100) * 1024 * 1024)
        dq = pl.pallas_call(
            dq_kern,
            grid=(groups, nq, nkv),
            in_specs=[q_spec, kv_spec, kv_spec, q_spec, st_spec],
            out_specs=q_spec,
            out_shape=jax.ShapeDtypeStruct((lp, hd), jnp.float32),
            compiler_params=cparams,
            interpret=interpret,
        )(qi, ki, vi, doi, sti)
        # dkv grid: kv block index j is the MIDDLE dim (resident output),
        # q sweep i is inner — index maps swap their grid arguments.
        q_spec2 = pl.BlockSpec((bq, gc), lambda g, j, i: (i, g))
        kv_spec2 = pl.BlockSpec((bkv, gc), lambda g, j, i: (j, g))
        st_spec2 = pl.BlockSpec((band_h, bq), lambda g, j, i: (g, i))
        dk, dv = pl.pallas_call(
            dkv_kern,
            grid=(groups, nkv, nq),
            in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, st_spec2],
            out_specs=[kv_spec2, kv_spec2],
            out_shape=[jax.ShapeDtypeStruct((lp, hd), jnp.float32)] * 2,
            compiler_params=cparams,
            interpret=interpret,
        )(qi, ki, vi, doi, sti)
        return dq, dk, dv

    dq, dk, dv = jax.vmap(run)(q, k, v, do, st)
    dq = jnp.where(valid, dq, 0).astype(q.dtype)
    dk = jnp.where(valid, dk, 0).astype(k.dtype)
    dv = jnp.where(valid, dv, 0).astype(v.dtype)
    return dq, dk, dv


def _stats_band_h(hps: int) -> int:
    """Sublane rows per group band of the transposed stats (2 per head,
    padded to the f32 sublane granularity of 8)."""
    return -(-2 * hps // 8) * 8


def _interleave_stats(lse, delta, *, groups: int, hps: int):
    """Interleave per-head lse/delta [b, Lp, h] f32 into the backward
    kernels' TRANSPOSED [b, band_h*groups, Lp] stats layout: within each
    group's band, row 2s = lse and row 2s+1 = delta of in-group head s.
    Token index rides the LANE axis, so the kernels consume each stat as
    a [1, bq] row that broadcasts along sublanes for free (the [bq, 1]
    lane-broadcast this replaces measured 13x slower — see _bwd_head_ds)."""
    b, lp, h = lse.shape
    band_h = _stats_band_h(hps)
    st = jnp.stack([lse.transpose(0, 2, 1).reshape(b, groups, hps, lp),
                    delta.transpose(0, 2, 1).reshape(b, groups, hps, lp)],
                   axis=3)                       # [b, g, hps, 2, Lp]
    st = st.reshape(b, groups, 2 * hps, lp)
    st = jnp.pad(st, ((0, 0), (0, 0), (0, band_h - 2 * hps), (0, 0)))
    return st.reshape(b, band_h * groups, lp)


def flash_mha_packed(q, k, v, *, num_heads: int, l_real: int,
                     blocks: tuple[int, int] | None = None,
                     group_cols: int | None = None,
                     scalar_max: bool = False,
                     with_stats: bool = False,
                     interpret: bool = False):
    """Full MHA on the packed layout.  q/k/v: [b, Lp, h*d_h] with head-major
    columns (column h*d_h + c is head h, channel c) and Lp already padded to
    a block multiple; rows >= l_real are padding.  Returns [b, Lp, h*d_h]
    (pad rows garbage).  Requires d_h <= 64 and 128 % d_h == 0.

    `group_cols` (a multiple of 128) is how many head columns one grid step
    processes — Pallas TPU blocks need 128-divisible last dims, and wider
    groups amortize per-step overhead at short sequence lengths (fewer grid
    steps).  num_heads must be divisible by group_cols // d_h.

    `with_stats=True` (training forward) additionally returns the exp2-
    domain log-sum-exp per row per head, [b, Lp, h] f32 — the forward
    fact `flash_mha_packed_bwd` rebuilds probabilities from."""
    b, lp, hd = q.shape
    dh, gc, hps, groups = _packed_dims(hd, num_heads, l_real, group_cols)
    bq, bkv = blocks or pick_packed_blocks(l_real)
    assert lp % bq == 0 and lp % bkv == 0, (lp, bq, bkv)
    nq, nkv = lp // bq, lp // bkv

    assert not (scalar_max and with_stats), \
        "stats export requires the row-max kernel"
    body = (_fwd_kernel_packed_smax if scalar_max
            else _fwd_kernel_packed_stats if with_stats
            else _fwd_kernel_packed)
    kern = functools.partial(
        body, nkv=nkv, bkv=bkv, l_real=l_real,
        masked=lp > l_real, scale=dh ** -0.5 * LOG2E, dh=dh, hps=hps)
    m_scratch = (pltpu.SMEM((1, hps), jnp.float32) if scalar_max
                 else pltpu.VMEM((bq, 128 * hps), jnp.float32))
    out_specs = [pl.BlockSpec((bq, gc), lambda g, i, j: (i, g))]
    out_shapes = [jax.ShapeDtypeStruct((lp, hd), q.dtype)]
    if with_stats:
        out_specs.append(pl.BlockSpec((bq, 128), lambda g, i, j: (i, g)))
        out_shapes.append(
            jax.ShapeDtypeStruct((lp, 128 * groups), jnp.float32))

    def run(qi, ki, vi):
        return pl.pallas_call(
            kern,
            grid=(groups, nq, nkv),
            in_specs=[
                pl.BlockSpec((bq, gc), lambda g, i, j: (i, g)),
                pl.BlockSpec((bkv, gc), lambda g, i, j: (j, g)),
                pl.BlockSpec((bkv, gc), lambda g, i, j: (j, g)),
            ],
            out_specs=out_specs if with_stats else out_specs[0],
            out_shape=out_shapes if with_stats else out_shapes[0],
            scratch_shapes=[
                m_scratch,
                pltpu.VMEM((bq, 128 * hps), jnp.float32),
                pltpu.VMEM((bq, gc), qi.dtype),
                pltpu.VMEM((bkv, 128 * hps), vi.dtype),
            ],
            # 32M scope: the stats variant's extra f32 output column pushes
            # the (1536, 768) blocks at Lp=4608 to 16.80M, just past the
            # 16M default (measured on-device 2026-08-19, graceful error)
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary", "arbitrary"),
                vmem_limit_bytes=32 * 1024 * 1024),
            interpret=interpret,
        )(qi, ki, vi)

    if not with_stats:
        return jax.vmap(run)(q, k, v)
    o, st = jax.vmap(run)(q, k, v)
    # Compact the stats: only columns 2s of each group's 128-wide band are
    # written (the lse of in-group head s) — extracting [b, Lp, h] here
    # makes the custom_vjp residual 32x smaller than the raw kernel output.
    lse = st.reshape(b, lp, groups, 128)[..., 0:2 * hps:2]
    return o, lse.reshape(b, lp, num_heads)


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
