"""Pallas tile-blend kernel for the Gaussian rasterizer forward pass.

The XLA chunked-scan blend (rasterize.py::blend_tiles) is HBM-bound: every
depth chunk materializes several [T, kc, ppt] f32 intermediates (cumprod,
weights, selects) that round-trip through HBM — measured 22.5 ms/view at
512^2 vs a few ms of actual VPU work.  This kernel keeps the whole per-tile
pipeline in VMEM: one grid step blends one 16x16 tile, looping over depth
chunks with running transmittance, CUDA-exact skip/early-stop semantics
(forward.cu:261-374), and chunk-level early termination (a chunk is skipped
once every pixel is saturated or the tile's candidate list is exhausted).

Prefix products (transmittance within a chunk, "any violation before me")
use a log2(kc)-step roll tree on the VPU — no transcendentals, and the
f32 multiply reordering stays within the rasterizer parity tolerance.

Training gradients never see this kernel: ops/rasterize.py wraps it in a
custom_vjp whose differentiated path is the existing (checkpointed) XLA
scan, so the deferred-render remat semantics are unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16
PPT = TILE * TILE
EARLY_STOP_T = 1e-4          # forward.cu:348
ALPHA_MIN = 1.0 / 255.0      # forward.cu:345
ALPHA_MAX = 0.99             # forward.cu:344


def _prefix_prod_exc(x: jnp.ndarray) -> jnp.ndarray:
    """Exclusive prefix product along axis 0 of [kc, ppt] via a roll tree."""
    kc = x.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    y = jnp.where(rows >= 1, pltpu.roll(x, 1, axis=0), 1.0)
    s = 1
    while s < kc:
        y = y * jnp.where(rows >= s, pltpu.roll(y, s, axis=0), 1.0)
        s *= 2
    return y


def _prefix_sum_inc(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum along axis 0 of [kc, ppt] (Hillis-Steele roll
    tree, same structure as the product version)."""
    kc = x.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    y = x
    s = 1
    while s < kc:
        y = y + jnp.where(rows >= s, pltpu.roll(y, s, axis=0), 0.0)
        s *= 2
    return y


def _blend_kernel(count_ref, g_ref, o_ref, *, kc: int, nc: int,
                  tiles_x: int):
    t = pl.program_id(0)
    lane = lax.broadcasted_iota(jnp.int32, (1, PPT), 1)
    pxf = ((t % tiles_x) * TILE + (lane % TILE)).astype(jnp.float32)
    pyf = ((t // tiles_x) * TILE + (lane // TILE)).astype(jnp.float32)
    count = count_ref[t]

    def compute(c, carry):
        t_run, dead, acc = carry
        ch = g_ref[0, pl.ds(c * kc, kc), :]             # [kc, 10]
        dx = ch[:, 0:1] - pxf                           # [kc, ppt]
        dy = ch[:, 1:2] - pyf
        power = (-0.5 * (ch[:, 2:3] * dx * dx + ch[:, 4:5] * dy * dy)
                 - ch[:, 3:4] * dx * dy)
        alpha = jnp.minimum(ALPHA_MAX, ch[:, 8:9] * jnp.exp(power))
        skip = (power > 0.0) | (alpha < ALPHA_MIN)      # mask folded in opa
        a = jnp.where(skip, 0.0, alpha)
        cp_exc = _prefix_prod_exc(1.0 - a)
        t_before = t_run * cp_exc                       # [kc, ppt]
        viol = (~skip) & (t_before * (1.0 - alpha) < EARLY_STOP_T)
        violf = viol.astype(jnp.float32)
        earlier = _prefix_prod_exc(1.0 - violf) < 0.5   # any viol before me
        contrib = (~skip) & (~viol) & (~earlier) & (dead < 0.5)
        wgt = jnp.where(contrib, alpha * t_before, 0.0)
        # one MXU contraction gives every weighted attribute column:
        # cols 5:8 = color accumulation, col 9 = depth (forward.cu:330-338)
        acc = acc + lax.dot_general(wgt, ch, (((0,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        # full product over the chunk via the roll tree (Mosaic has no
        # reduce_prod): inclusive prefix = exclusive * x, take the last row
        xsel = jnp.where(contrib, 1.0 - a, 1.0)
        t_run = t_run * (_prefix_prod_exc(xsel) * xsel)[kc - 1:kc, :]
        dead = jnp.maximum(dead, jnp.max(violf, axis=0, keepdims=True))
        return t_run, dead, acc

    def body(c, carry):
        t_run, dead, _ = carry
        alive = (c * kc < count) & (jnp.min(dead) < 0.5)
        return lax.cond(alive, lambda cr: compute(c, cr), lambda cr: cr,
                        carry)

    init = (jnp.ones((1, PPT), jnp.float32),
            jnp.zeros((1, PPT), jnp.float32),
            jnp.zeros((PPT, 10), jnp.float32))
    t_run, _, acc = lax.fori_loop(0, nc, body, init)

    t_col = t_run.reshape(PPT, 1)
    o_ref[0, :, 0:3] = acc[:, 5:8]                      # pre-bg color acc
    o_ref[0, :, 3:4] = t_col                            # final transmittance
    o_ref[0, :, 4:5] = acc[:, 9:10]                     # depth acc
    o_ref[0, :, 5:8] = jnp.zeros((PPT, 3), jnp.float32)


def _blend_bwd_kernel(count_ref, g_ref, fo_ref, ct_ref, o_ref, *, kc: int,
                      nc: int, tiles_x: int):
    """Analytic per-tile backward (the CUDA backward.cu:399-557 equivalent,
    deterministic and atomic-free).  Re-traverses the candidate list in
    FORWARD order, recomputing the exact forward state (t_before, skip/
    viol/dead) and turning the back-to-front suffix sums of the CUDA
    design into one per-pixel running scalar:

        A_i[p]  = sum_c dC[p,c] * color_i[c] + dD[p] * z_i
        Q_i[p]  = sum_{j<=i} w_j[p] * A_j[p]      (running carry)
        e[p]    = sum_c dC*acc_c + dD*acc_d + dTf*t_fin   (from fwd outputs)
        dL/dalpha_i[p] = contrib * (T_i*A_i - (e - Q_i)/(1 - alpha_i))

    since sum_{j>i} w_j A_j = (sum_j w_j A_j) - Q_i and the total equals
    the dC/dD-weighted forward accumulators.  Per-candidate gradients for
    all 10 attribute columns come from lane reductions / one small MXU
    contraction per chunk.  Matches JAX AD of the XLA scan core (minimum-
    clamp gating via og < ALPHA_MAX; boolean conditions carry no gradient).

    fo_ref/ct_ref: [8, PPT] transposed forward outputs / cotangents —
    rows 0:3 = acc_c / dC, row 3 = t_fin / dT_fin, row 4 = acc_d / dD.
    """
    t = pl.program_id(0)
    lane = lax.broadcasted_iota(jnp.int32, (1, PPT), 1)
    pxf = ((t % tiles_x) * TILE + (lane % TILE)).astype(jnp.float32)
    pyf = ((t // tiles_x) * TILE + (lane // TILE)).astype(jnp.float32)
    count = count_ref[t]

    dc_rows = ct_ref[0, 0:3, :]                         # [3, PPT]
    dd_row = ct_ref[0, 4:5, :]                          # [1, PPT]
    e_row = (jnp.sum(ct_ref[0, 0:3, :] * fo_ref[0, 0:3, :],
                     axis=0, keepdims=True)
             + ct_ref[0, 4:5, :] * fo_ref[0, 4:5, :]
             + ct_ref[0, 3:4, :] * fo_ref[0, 3:4, :])   # [1, PPT]

    def compute(c, carry):
        t_run, dead, q_run = carry                      # [1, PPT]
        ch = g_ref[0, pl.ds(c * kc, kc), :]             # [kc, 10]
        dx = ch[:, 0:1] - pxf                           # [kc, PPT]
        dy = ch[:, 1:2] - pyf
        power = (-0.5 * (ch[:, 2:3] * dx * dx + ch[:, 4:5] * dy * dy)
                 - ch[:, 3:4] * dx * dy)
        gexp = jnp.exp(power)
        og = ch[:, 8:9] * gexp
        alpha = jnp.minimum(ALPHA_MAX, og)
        skip = (power > 0.0) | (alpha < ALPHA_MIN)
        a = jnp.where(skip, 0.0, alpha)
        t_before = t_run * _prefix_prod_exc(1.0 - a)
        viol = (~skip) & (t_before * (1.0 - alpha) < EARLY_STOP_T)
        violf = viol.astype(jnp.float32)
        earlier = _prefix_prod_exc(1.0 - violf) < 0.5
        contrib = (~skip) & (~viol) & (~earlier) & (dead < 0.5)
        w = jnp.where(contrib, alpha * t_before, 0.0)   # [kc, PPT]

        A = lax.dot_general(ch[:, 5:8], dc_rows, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        A = A + ch[:, 9:10] * dd_row                    # [kc, PPT]
        q_incl = q_run + _prefix_sum_inc(w * A)
        dalpha = jnp.where(
            contrib,
            t_before * A - (e_row - q_incl) / (1.0 - alpha), 0.0)
        unclamped = og < ALPHA_MAX
        dpow = jnp.where(unclamped, dalpha * alpha, 0.0)
        dop_elem = jnp.where(unclamped, dalpha * gexp, 0.0)

        d_color = lax.dot_general(w, dc_rows, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        rsum = lambda x: jnp.sum(x, axis=1, keepdims=True)    # noqa: E731
        rows = jnp.concatenate([
            rsum(dpow * (-(ch[:, 2:3] * dx + ch[:, 3:4] * dy))),  # d mean_x
            rsum(dpow * (-(ch[:, 4:5] * dy + ch[:, 3:4] * dx))),  # d mean_y
            rsum(dpow * (-0.5 * dx * dx)),                        # d conic_a
            rsum(dpow * (-dx * dy)),                              # d conic_b
            rsum(dpow * (-0.5 * dy * dy)),                        # d conic_c
            d_color,                                              # d rgb
            rsum(dop_elem),                                       # d opacity
            rsum(w * dd_row),                                     # d depth
        ], axis=1)                                       # [kc, 10]
        o_ref[0, pl.ds(c * kc, kc), :] = rows

        xsel = jnp.where(contrib, 1.0 - alpha, 1.0)
        t_run = t_run * (_prefix_prod_exc(xsel) * xsel)[kc - 1:kc, :]
        dead = jnp.maximum(dead, jnp.max(violf, axis=0, keepdims=True))
        return t_run, dead, q_incl[kc - 1:kc, :]

    def body(c, carry):
        t_run, dead, _ = carry
        alive = (c * kc < count) & (jnp.min(dead) < 0.5)

        def live(cr):
            return compute(c, cr)

        def skip_chunk(cr):
            o_ref[0, pl.ds(c * kc, kc), :] = jnp.zeros((kc, 10), jnp.float32)
            return cr

        return lax.cond(alive, live, skip_chunk, carry)

    init = (jnp.ones((1, PPT), jnp.float32),
            jnp.zeros((1, PPT), jnp.float32),
            jnp.zeros((1, PPT), jnp.float32))
    lax.fori_loop(0, nc, body, init)


def blend_bwd_pallas(g: jnp.ndarray, counts: jnp.ndarray, fwd_out: jnp.ndarray,
                     cot: jnp.ndarray, tiles_x: int, *,
                     interpret: bool = False) -> jnp.ndarray:
    """Per-candidate gradient rows for the tile blend.

    g: [T, Kp, 10] as in blend_tiles_pallas (mask folded into opacity).
    fwd_out / cot: [T, 8, PPT] transposed forward outputs and cotangents
    (rows 0:3 acc_c/dC, 3 t_fin/dT_fin, 4 acc_d/dD; rows 5:8 unused).
    Returns dg [T, Kp, 10] — gradients w.r.t. each candidate row's
    attribute columns (zero for masked/padded/skipped entries).
    """
    num_tiles, kp, na = g.shape
    assert na == 10 and kp % 128 == 0, (na, kp)
    kc = 128
    kern = functools.partial(_blend_bwd_kernel, kc=kc, nc=kp // kc,
                             tiles_x=tiles_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec((1, kp, 10), lambda t, c: (t, 0, 0)),
                  pl.BlockSpec((1, 8, PPT), lambda t, c: (t, 0, 0)),
                  pl.BlockSpec((1, 8, PPT), lambda t, c: (t, 0, 0))],
        out_specs=pl.BlockSpec((1, kp, 10), lambda t, c: (t, 0, 0)),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, kp, 10), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(counts.astype(jnp.int32), g, fwd_out, cot)


def blend_tiles_pallas(g: jnp.ndarray, counts: jnp.ndarray,
                       tiles_x: int, *, interpret: bool = False):
    """g: [T, Kp, 10] f32 per-tile depth-sorted candidates, attribute
    columns (x, y, conic_a, conic_b, conic_c, r, g, b, opacity, depth) with
    the bin mask already folded into opacity (masked entries -> 0).  Kp must
    be a multiple of 128.  counts: [T] int32 valid entries per tile.
    Returns (t_fin [T,ppt], acc_color [T,ppt,3], acc_depth [T,ppt]) — the
    same pre-background accumulators as the XLA scan core."""
    num_tiles, kp, na = g.shape
    assert na == 10 and kp % 128 == 0, (na, kp)
    kc = 128
    kern = functools.partial(_blend_kernel, kc=kc, nc=kp // kc,
                             tiles_x=tiles_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,           # counts, read as count_ref[t]
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec((1, kp, 10), lambda t, c: (t, 0, 0))],
        out_specs=pl.BlockSpec((1, PPT, 8), lambda t, c: (t, 0, 0)),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, PPT, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(counts.astype(jnp.int32), g)
    return out[..., 3], out[..., 0:3], out[..., 4]
