"""DiT building blocks (flax.linen), TPU-first.

Functional equivalents of the reference's
`models/transformers/utils_transformer.py`:
  * TimestepEmbedder (denoiser.py:26-72): sinusoidal -> MLP(SiLU).
  * DiTBlock (utils_transformer.py:246-290): adaLN 6-way modulation around
    pre-norm attention + tanh-GELU MLP; LayerNorms have no affine params
    (eps 1e-6); gates multiply the residual branches.
  * modulate (utils_transformer.py:26-27): x * (1 + scale) + shift.

TPU-first choices:
  * the 24-block stack is a single `nn.scan` over one block (one compile,
    weights stacked on a leading layer axis), with `nn.remat` as the
    activation-checkpointing knob (reference: torch.utils.checkpoint per
    block group, denoiser.py:348-354);
  * matmuls run in bf16 (configurable) with f32 LayerNorm/softmax;
  * attention uses jax.nn.dot_product_attention so XLA can pick its fused
    flash path (reference: xformers flash-attn, utils_transformer.py:145-179).

Weight init matches `_init_weights` (utils_transformer.py:30-36): all Linear
kernels ~ N(0, 0.02), biases zero.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

INIT = nn.initializers.normal(stddev=0.02)


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """x: [b, l, d]; shift/scale: [b, d] (utils_transformer.py:26-27)."""
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0
                       ) -> jnp.ndarray:
    """Sinusoidal embedding, cos-first (denoiser.py:44-67). t: [b] -> [b, dim]."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        x = timestep_embedding(t, self.frequency_embedding_size)
        x = nn.Dense(self.hidden_size, kernel_init=INIT,
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     name="mlp_0")(x)
        x = nn.silu(x)
        x = nn.Dense(self.hidden_size, kernel_init=INIT,
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     name="mlp_2")(x)
        return x


def _splash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
                      ) -> jnp.ndarray:
    """Flash attention via the Pallas splash kernel (TPU).

    q/k/v: [b, l, h, d].  Sequences are padded to a 512 multiple with the
    padding masked out through segment ids (pad tokens get segment 0, real
    tokens 1 — cross-segment attention is masked).  ~5x faster than the XLA
    path at the DiT's 4k-16k token lengths (measured on v5e: 1.6ms vs 8.4ms
    per layer at L=4098), because the [L, L] score matrix never leaves VMEM.
    """
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sak, splash_attention_mask as sam)

    b, l, h, d = q.shape
    # Block sweep on v5e (tools/bench_attn.py): at L~16k, 1024^2 fwd blocks
    # run 18.3 ms/layer vs 20.0 at 512^2 (34.5% MFU; d=64 on the 128-deep
    # MXU caps the ceiling at ~50%); at L~4k the extra padding to a 1024
    # multiple loses more than the bigger blocks gain.
    blk = 1024 if l >= 8192 else 512
    lp = -(-l // blk) * blk
    block = sak.BlockSizes(
        block_q=blk, block_kv=blk, block_kv_compute=blk,
        block_q_dkv=512, block_kv_dkv=512, block_kv_dkv_compute=512,
        use_fused_bwd_kernel=True)
    mask = sam.MultiHeadMask([sam.FullMask((lp, lp)) for _ in range(h)])
    kernel = sak.make_splash_mha(mask=mask, head_shards=1, q_seq_shards=1,
                                 block_sizes=block)
    seg = jnp.where(jnp.arange(lp) < l, 1, 0).astype(jnp.int32)
    segids = sak.SegmentIds(q=seg, kv=seg)

    def one(qi, ki, vi):                     # [l, h, d] -> [l, h, d]
        pad = ((0, lp - l), (0, 0), (0, 0))
        out = kernel(jnp.pad(qi, pad).transpose(1, 0, 2),
                     jnp.pad(ki, pad).transpose(1, 0, 2),
                     jnp.pad(vi, pad).transpose(1, 0, 2),
                     segment_ids=segids)
        return out.transpose(1, 0, 2)[:l]

    return jax.vmap(one)(q, k, v)


@jax.custom_vjp
def _flash_fwd_splash_bwd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
                          ) -> jnp.ndarray:
    """Inference forward: the specialized full-attention kernel
    (ops/attention.py, ~20% faster than splash at the DiT's 512^2 shape).
    When differentiated (training), both forward and backward run splash's
    fused kernels — the vjp closure from jax.vjp is a Partial pytree, so it
    rides through as the custom_vjp residual and no extra forward is paid."""
    from ..ops.attention import flash_full_mha
    return flash_full_mha(q, k, v)


def _name_attn_residuals(out, vjp_fn):
    """Tag the attention output and its vjp residuals so the DiT remat
    policy (save_only_these_names("attn_res")) can keep them: backward
    then skips the per-layer splash forward re-run entirely (~15% of the
    256^2 train step) at the cost of storing the residuals (~1 GB at
    256^2 — which is why the policy is gated to L <= 8192)."""
    from jax.ad_checkpoint import checkpoint_name
    out = checkpoint_name(out, "attn_res")
    vjp_fn = jax.tree_util.tree_map(
        lambda a: checkpoint_name(a, "attn_res"), vjp_fn)
    return out, vjp_fn


def _ffsb_fwd(q, k, v):
    scale = q.shape[-1] ** -0.5
    out, vjp_fn = jax.vjp(
        lambda q_, k_, v_: _splash_attention(q_ * scale, k_, v_), q, k, v)
    return _name_attn_residuals(out, vjp_fn)


def _ffsb_bwd(vjp_fn, g):
    return vjp_fn(g)


_flash_fwd_splash_bwd.defvjp(_ffsb_fwd, _ffsb_bwd)


def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    impl: str = "auto") -> jnp.ndarray:
    """q/k/v: [b, l, h, d].  impl: 'auto' | 'flash' | 'splash' | 'xla'."""
    impl = resolve_attn_impl(impl)
    if impl == "flash" and q.shape[-1] > 64:
        impl = "splash"                  # the flash kernel assumes d <= 64
    if impl == "flash":
        return _flash_fwd_splash_bwd(q, k, v)
    if impl == "splash":
        # splash kernel computes q @ k^T without the 1/sqrt(d) scale
        scale = q.shape[-1] ** -0.5
        return _splash_attention(q * scale, k, v)
    return jax.nn.dot_product_attention(q, k, v)


def resolve_attn_impl(impl: str) -> str:
    return ("flash" if jax.default_backend() == "tpu" else "xla") \
        if impl == "auto" else impl


def subset_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     subset_size: Optional[int] = None,
                     impl: str = "auto") -> jnp.ndarray:
    """Asymmetric "subset" attention (SelfAttention.forward with
    subset_attention_size, utils_transformer.py:145-207 / dit.py:138-199 —
    defined by the reference but not called by any shipped config):
    queries [0:s] attend only among keys [0:s]; queries [s:] attend over
    ALL keys.  q/k/v: [b, l, h, d]."""
    if subset_size is None or subset_size >= q.shape[1]:
        return fused_attention(q, k, v, impl)
    s = subset_size
    head = fused_attention(q[:, :s], k[:, :s], v[:, :s], impl)
    rest = fused_attention(q[:, s:], k, v, impl)
    return jnp.concatenate([head, rest], axis=1)


@functools.lru_cache(maxsize=None)
def _make_ring_attn(mesh, dh: int, l_real: int):
    """Sequence-parallel (ring) attention over `mesh`'s seq axis — exact
    full attention with the token axis sharded across devices
    (parallel/ring.py).  Composes with tensor parallelism: the channel
    axis shards over `model` when the mesh has one, so the column-parallel
    q/k/v outputs feed it with zero collectives besides the ring's
    neighbor ppermute."""
    from ..parallel.ring import make_ring_attention
    return make_ring_attention(mesh, dh=dh, l_real=l_real)


@functools.lru_cache(maxsize=None)
def _make_packed_attn(num_heads: int, l_real: int, blocks: tuple[int, int],
                      tp_mesh=None, analytic_bwd: bool = True):
    """custom_vjp over the packed-layout flash kernel: primal forward is the
    packed kernel on [b, Lp, h*d].

    The differentiated path has two routings:

      * default (`analytic_bwd=True`): stats-exporting packed forward +
        the analytic Pallas backward pair (ops/attention.py::
        flash_mha_packed_bwd) — no forward re-run, pad-row grads exactly
        zero, and the remat_save_attn residual set is just (o, lse).
        Default since the round-4 transposed rewrite fixed the backward's
        lane-broadcast pathology (1338 -> 48.6 ms/pair at L=16386,
        docs/PERF_NOTES.md): per trained layer it beats the splash route
        at both flagship lengths (L=4098: 7.56 vs 8.32 ms; L=16386:
        ~66 vs ~77 ms fwd+bwd with the backward re-forward counted), and
        it is the configuration the shipped `remat_save_attn: true`
        configs assume fits v5e-16GB at 512^2.
      * `analytic_bwd=False`: the vjp's forward runs splash (XLA attention
        off-TPU) and the backward is splash's fused backward — the
        round-2/3 proven fallback.

    With `tp_mesh` (a dp x tp jax.sharding.Mesh) the whole thing is wrapped
    in shard_map: batch on the data axis, the head-major channel axis on
    the model axis.  Attention is embarrassingly parallel over heads, so
    each shard runs the kernel (and its backward) on its own num_heads/tp
    heads with ZERO collectives — the q/k/v projections are column-
    parallel (parallel/mesh.py::dit_tp_rule) so their outputs arrive
    already head-sharded, and the row-parallel out-projection supplies the
    layer's single all-reduce.  This replaces the round-2 behavior where
    XLA resolved the un-annotated pallas_call by all-gathering its
    operands (docs/PERF_NOTES.md multi-chip note)."""
    from ..ops.attention import flash_mha_packed, flash_mha_packed_bwd

    inner_heads = num_heads
    if tp_mesh is not None:
        from ..parallel.mesh import MODEL_AXIS
        tp = tp_mesh.shape[MODEL_AXIS]
        assert num_heads % tp == 0, (num_heads, tp)
        inner_heads = num_heads // tp
    interpret = jax.default_backend() != "tpu"

    @jax.custom_vjp
    def f(q, k, v):
        return flash_mha_packed(q, k, v, num_heads=inner_heads,
                                l_real=l_real, blocks=blocks,
                                interpret=interpret)

    def ref_fn(q, k, v):
        b, lp, hd = q.shape
        dh = hd // inner_heads
        q4 = q[:, :l_real].reshape(b, l_real, inner_heads, dh)
        k4 = k[:, :l_real].reshape(b, l_real, inner_heads, dh)
        v4 = v[:, :l_real].reshape(b, l_real, inner_heads, dh)
        if jax.default_backend() == "tpu":
            o4 = _splash_attention(q4 * dh ** -0.5, k4, v4)
        else:
            o4 = jax.nn.dot_product_attention(q4, k4, v4)
        return jnp.pad(o4.reshape(b, l_real, hd),
                       ((0, 0), (0, lp - l_real), (0, 0)))

    if analytic_bwd:
        def fwd(q, k, v):
            o, lse = flash_mha_packed(q, k, v, num_heads=inner_heads,
                                      l_real=l_real, blocks=blocks,
                                      with_stats=True, interpret=interpret)
            # Tag o/lse for the remat_save_attn policy: saving them lets
            # the backward skip the forward-kernel re-run entirely (q/k/v
            # are the cheap projections, recomputed).  lse is [b, Lp, h]
            # f32 — tiny next to the splash-residual set.
            from jax.ad_checkpoint import checkpoint_name
            o = checkpoint_name(o, "attn_res")
            lse = checkpoint_name(lse, "attn_res")
            return o, (q, k, v, o, lse)

        def bwd(res, g):
            q, k, v, o, lse = res
            return flash_mha_packed_bwd(q, k, v, o, g, lse,
                                        num_heads=inner_heads,
                                        l_real=l_real, interpret=interpret)
    else:
        def fwd(q, k, v):
            out, vjp_fn = jax.vjp(ref_fn, q, k, v)
            return _name_attn_residuals(out, vjp_fn)

        def bwd(vjp_fn, g):
            return vjp_fn(g)

    f.defvjp(fwd, bwd)
    if tp_mesh is None:
        return f

    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS, MODEL_AXIS
    spec = P(DATA_AXIS, None, MODEL_AXIS)
    return jax.shard_map(f, mesh=tp_mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)


class RMSNorm(nn.Module):
    """RMSNorm with learned scale (utils_transformer.py:14-23)."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        x32 = x.astype(jnp.float32)
        norm = x32 * jax.lax.rsqrt(
            jnp.mean(x32 * x32, axis=-1, keepdims=True) + self.eps)
        return (norm * w).astype(x.dtype)


class Attention(nn.Module):
    """timm-style multi-head self-attention (qkv bias, out-proj bias).

    The reference fuses q/k/v into one [d, 3d] projection (timm layout);
    here they are three separate Denses so tensor parallelism can shard
    each on its head-major output axis (megatron column-parallel — a
    fused [3d] axis cannot be head-aligned by any PartitionSpec).  The
    checkpoint converter splits the fused torch weight at conversion time
    (tools/convert_reference_ckpt.py), so published weights still convert
    exactly (tests/test_golden_reference.py).

    qk_norm=True adds per-head RMSNorm on q and k — the reference's
    QK_Norm_SelfAttention variant (utils_transformer.py:533-584), unused by
    shipped configs but part of the capability surface."""

    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    qk_norm: bool = False
    # Set by DiTStack when the token axis is pre-padded around the whole
    # stack: the number of REAL rows (x.shape[1] is the padded length) and
    # the packed-kernel block sizes.  Enables the zero-copy packed path.
    packed_l: Optional[int] = None
    packed_blocks: Optional[tuple] = None
    # dp x tp mesh: shard the attention kernel over the model axis via
    # shard_map (heads are embarrassingly parallel) instead of letting XLA
    # all-gather the un-annotated pallas_call's operands.
    tp_mesh: Optional[Any] = None
    # Mesh with a seq axis > 1: ring (sequence-parallel) attention — the
    # token axis stays sharded through the op (parallel/ring.py).  May be
    # the same mesh object as tp_mesh (data x seq x model).
    sp_mesh: Optional[Any] = None
    # Serving-mode W8A8 int8 projections (ops/quant.py) — same param tree
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, l, d = x.shape
        head_dim = d // self.num_heads
        from ..ops.quant import QuantDense
        dense = functools.partial(
            QuantDense if self.quant_int8 else nn.Dense,
            use_bias=True, kernel_init=INIT,
            bias_init=nn.initializers.zeros, dtype=self.dtype)
        q = dense(d, name="q")(x)
        k = dense(d, name="k")(x)
        v = dense(d, name="v")(x)
        impl = resolve_attn_impl(self.attn_impl)
        sp = (1 if self.sp_mesh is None
              else self.sp_mesh.shape.get("seq", 1))
        if sp > 1 and self.packed_l is not None and not self.qk_norm:
            o = _make_ring_attn(self.sp_mesh, head_dim,
                                self.packed_l)(q, k, v)
            return dense(d, name="proj")(o)
        tp = (1 if self.tp_mesh is None
              else self.tp_mesh.shape["model"])
        if (impl == "flash" and self.packed_l is not None
                and not self.qk_norm and head_dim <= 64
                and 128 % head_dim == 0
                and (self.num_heads // tp) % (128 // head_dim) == 0
                and self.num_heads % tp == 0):
            # packed path: q/k/v stay [b, lp, h*d] end to end — no
            # transposes, no per-layer padding (ops/attention.py)
            o = _make_packed_attn(self.num_heads, self.packed_l,
                                  tuple(self.packed_blocks),
                                  tp_mesh=self.tp_mesh)(q, k, v)
        else:
            # If the stack pre-padded the token axis but this block cannot
            # take the packed path (qk_norm, odd head counts), the pad rows
            # must NOT participate as keys — slice to the real rows and pad
            # the output back.
            lr = self.packed_l if self.packed_l is not None else l
            q = q[:, :lr].reshape(b, lr, self.num_heads, head_dim)
            k = k[:, :lr].reshape(b, lr, self.num_heads, head_dim)
            v = v[:, :lr].reshape(b, lr, self.num_heads, head_dim)
            if self.qk_norm:
                q = RMSNorm(head_dim, name="q_norm")(q)
                k = RMSNorm(head_dim, name="k_norm")(k)
            o = fused_attention(q, k, v, impl)
            o = o.reshape(b, lr, d)
            if lr != l:
                o = jnp.pad(o, ((0, 0), (0, l - lr), (0, 0)))
        return dense(d, name="proj")(o)


class Mlp(nn.Module):
    dim: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    # checkpoint_name the fc1 output (PRE-gelu) so a remat policy can keep
    # it: backward then recomputes only the cheap gelu, never the fc1
    # matmul (the largest single matmul in the block).
    save_hidden: bool = False
    quant_int8: bool = False   # serving-mode W8A8 (ops/quant.py)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.quant import QuantDense
        dense = QuantDense if self.quant_int8 else nn.Dense
        hidden = int(self.dim * self.mlp_ratio)
        x = dense(hidden, kernel_init=INIT,
                  bias_init=nn.initializers.zeros, dtype=self.dtype,
                  name="fc1")(x)
        if self.save_hidden:
            from jax.ad_checkpoint import checkpoint_name
            x = checkpoint_name(x, "mlp_res")
        x = nn.gelu(x, approximate=True)   # GELU(approximate="tanh")
        x = dense(self.dim, kernel_init=INIT,
                  bias_init=nn.initializers.zeros, dtype=self.dtype,
                  name="fc2")(x)
        return x


def _norm_noaffine(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm(elementwise_affine=False, eps=1e-6) computed in f32."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class DiTBlock(nn.Module):
    """adaLN DiT block (utils_transformer.py:246-290)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    attn_impl: str = "auto"
    qk_norm: bool = False     # DiTBlock_QK_Norm (utils_transformer.py:590-633)
    packed_l: Optional[int] = None
    packed_blocks: Optional[tuple] = None
    tp_mesh: Optional[Any] = None
    sp_mesh: Optional[Any] = None
    save_mlp_hidden: bool = False
    quant_int8: bool = False   # W8A8 q/k/v/proj/fc1/fc2 (adaLN stays f32:
    # it is O(width^2) per *sample*, not per token — nothing to win)

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        mod = nn.Dense(6 * self.hidden_size, use_bias=True, kernel_init=INIT,
                       bias_init=nn.initializers.zeros, dtype=self.dtype,
                       name="adaLN_modulation_1")(nn.silu(c))
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(mod, 6, axis=-1)
        attn_in = modulate(_norm_noaffine(x), shift_msa, scale_msa)
        x = x + gate_msa[:, None, :] * Attention(
            self.hidden_size, self.num_heads, dtype=self.dtype,
            attn_impl=self.attn_impl, qk_norm=self.qk_norm,
            packed_l=self.packed_l, packed_blocks=self.packed_blocks,
            tp_mesh=self.tp_mesh, sp_mesh=self.sp_mesh,
            quant_int8=self.quant_int8, name="attn")(attn_in)
        mlp_in = modulate(_norm_noaffine(x), shift_mlp, scale_mlp)
        x = x + gate_mlp[:, None, :] * Mlp(
            self.hidden_size, self.mlp_ratio, dtype=self.dtype,
            save_hidden=self.save_mlp_hidden,
            quant_int8=self.quant_int8, name="mlp")(mlp_in)
        return x


class DiTStack(nn.Module):
    """`num_layers` DiT blocks as one nn.scan (params stacked on axis 0)."""

    hidden_size: int
    num_heads: int
    num_layers: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    remat: bool = True
    attn_impl: str = "auto"
    # Under remat, keep the attention vjp residuals as named checkpoints:
    # the backward then skips the per-layer attention forward re-run.
    # With the default splash-routed vjp the residuals are splash's saved
    # set; with analytic_bwd they shrink to (o, lse) — [L, width] bf16 +
    # [Lp, heads] f32 per layer.  Fits v5e-16GB at the flagship configs
    # (on by default in shipped train configs since the analytic blend
    # backward freed HBM; measured −6%).
    remat_save_attn: bool = False
    # Additionally keep the fc1 (pre-gelu) hidden activations: backward
    # recomputes only LN/modulate/gelu, no block matmul re-runs.  Costs
    # [L, 4*width] bf16 per layer (~830 MB at 256^2 b=1).
    remat_save_mlp: bool = False
    # dp x tp mesh for shard_map'd tensor-parallel attention (see Attention)
    tp_mesh: Optional[Any] = None
    # Mesh with a seq axis > 1: sequence (context) parallelism — the token
    # axis is sharded across `seq` through the whole stack (per-token ops
    # shard for free; attention goes through the ring, parallel/ring.py).
    sp_mesh: Optional[Any] = None
    # Mesh with a pipe axis > 1: GPipe pipeline parallelism — the stacked
    # layer axis sharded across `pipe`, activations flow stage-to-stage
    # with microbatching (parallel/pipeline.py).  Param layout (and so
    # checkpoints) is unchanged: the same [num_layers, ...] stack, just
    # sharded on its leading axis.
    pp_mesh: Optional[Any] = None
    pp_microbatches: Optional[int] = None   # default: one per pipe stage
    # Serving-mode W8A8 int8 block projections (ops/quant.py) — inference
    # only: rounding has zero gradient, so train configs keep this off.
    quant_int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        # Pad the token axis ONCE around the whole stack for the packed
        # flash path: attention then runs with zero per-layer layout work,
        # at the cost of pad-row flops in the LN/MLP/Dense ops (e.g.
        # 16386 -> 16896 at 512^2: +3.1%, vs ~15% wrapper overhead saved).
        l = x.shape[1]
        packed_l = packed_blocks = None
        head_dim = self.hidden_size // self.num_heads
        sp = (1 if self.sp_mesh is None
              else self.sp_mesh.shape.get("seq", 1))
        flash_ok = (resolve_attn_impl(self.attn_impl) == "flash"
                    and head_dim <= 64 and 128 % head_dim == 0
                    and self.num_heads % (128 // head_dim) == 0)
        if flash_ok or sp > 1:
            from ..ops.attention import plan_packed
            lp, packed_blocks = plan_packed(l)
            if not flash_ok:
                packed_blocks = None   # ring path only; no Pallas layout
            packed_l, x = l, jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
        if sp > 1:
            assert packed_l is not None and x.shape[1] % sp == 0, (
                f"padded token axis {x.shape[1]} must divide seq={sp}")
            assert self.tp_mesh is None or self.tp_mesh is self.sp_mesh, (
                "tp_mesh and sp_mesh must be the same (data, seq, model) "
                "mesh — build it once with make_mesh()")
            # Keep tokens sharded through the per-token ops (LN, adaLN,
            # MLP, q/k/v/proj) — XLA then runs them on L/sp rows per chip.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS, SEQ_AXIS
            x = jax.lax.with_sharding_constraint(
                x, NamedSharding(self.sp_mesh, P(DATA_AXIS, SEQ_AXIS, None)))

        pp = (1 if self.pp_mesh is None
              else self.pp_mesh.shape.get("pipe", 1))
        if pp > 1 and not self.is_initializing():
            y = self._pipeline_forward(x, c, pp, packed_l, packed_blocks)
            return y if packed_l is None else y[:, :l]

        class _Body(nn.Module):
            hidden_size: int
            num_heads: int
            mlp_ratio: float
            dtype: Dtype
            attn_impl: str
            packed_l: Optional[int]
            packed_blocks: Optional[tuple]
            tp_mesh: Optional[Any]
            sp_mesh: Optional[Any]
            save_mlp_hidden: bool
            quant_int8: bool

            @nn.compact
            def __call__(self, carry, _):
                y = DiTBlock(self.hidden_size, self.num_heads, self.mlp_ratio,
                             dtype=self.dtype, attn_impl=self.attn_impl,
                             packed_l=self.packed_l,
                             packed_blocks=self.packed_blocks,
                             tp_mesh=self.tp_mesh, sp_mesh=self.sp_mesh,
                             save_mlp_hidden=self.save_mlp_hidden,
                             quant_int8=self.quant_int8,
                             name="block")(carry, c)
                return y, None

        body = _Body
        if self.remat:
            names = ()
            if self.remat_save_attn:
                names += ("attn_res",)
            if self.remat_save_mlp:
                names += ("mlp_res",)
            if names:
                body = nn.remat(
                    body, prevent_cse=False,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        *names))
            else:
                body = nn.remat(body, prevent_cse=False)
        scanned = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.num_layers,
        )(self.hidden_size, self.num_heads, self.mlp_ratio, self.dtype,
          self.attn_impl, packed_l, packed_blocks, self.tp_mesh,
          self.sp_mesh if sp > 1 else None,
          self.remat_save_mlp and self.remat, self.quant_int8,
          name="layers")
        x, _ = scanned(x, None)
        return x if packed_l is None else x[:, :l]

    def _pipeline_forward(self, x, c, pp: int, packed_l, packed_blocks):
        """GPipe pipeline over `pp` stages (parallel/pipeline.py).

        Reads the scanned stack's [num_layers, ...] params straight off the
        bound variables (identical checkpoint layout to the nn.scan path)
        and drives one DiTBlock per layer inside the pipeline's stage scan;
        init still runs the plain scan so param creation is unchanged."""
        assert self.tp_mesh is None and (
            self.sp_mesh is None
            or self.sp_mesh.shape.get("seq", 1) == 1), (
            "pipeline parallelism composes with dp only (tp/sp shard_map "
            "nesting not supported)")
        assert self.num_layers % pp == 0, (self.num_layers, pp)
        from ..parallel.pipeline import pipeline_apply

        stacked = self.variables["params"]["layers"]
        block = DiTBlock(self.hidden_size, self.num_heads, self.mlp_ratio,
                         dtype=self.dtype, attn_impl=self.attn_impl,
                         packed_l=packed_l, packed_blocks=packed_blocks,
                         quant_int8=self.quant_int8)
        apply_one = block.apply
        if self.remat:
            apply_one = jax.checkpoint(apply_one, prevent_cse=False)

        def stage_fn(p_stack, x_mb, c_mb):
            def one(h, p):
                return apply_one({"params": p["block"]}, h, c_mb), None
            h, _ = jax.lax.scan(one, x_mb, p_stack)
            return h

        mb = self.pp_microbatches or pp
        return pipeline_apply(self.pp_mesh, stage_fn, stacked, x, c, mb)
