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
    blk = max(bq, bkv)
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
