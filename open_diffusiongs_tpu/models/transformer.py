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


class Attention(nn.Module):
    """timm-style multi-head self-attention (qkv bias, out-proj bias)."""

    dim: int
    num_heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, l, d = x.shape
        head_dim = d // self.num_heads
        qkv = nn.Dense(3 * d, use_bias=True, kernel_init=INIT,
                       bias_init=nn.initializers.zeros, dtype=self.dtype,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, l, self.num_heads, head_dim)
        k = k.reshape(b, l, self.num_heads, head_dim)
        v = v.reshape(b, l, self.num_heads, head_dim)
        o = jax.nn.dot_product_attention(q, k, v)
        o = o.reshape(b, l, d)
        return nn.Dense(d, use_bias=True, kernel_init=INIT,
                        bias_init=nn.initializers.zeros, dtype=self.dtype,
                        name="proj")(o)


class Mlp(nn.Module):
    dim: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = int(self.dim * self.mlp_ratio)
        x = nn.Dense(hidden, kernel_init=INIT,
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     name="fc1")(x)
        x = nn.gelu(x, approximate=True)   # GELU(approximate="tanh")
        x = nn.Dense(self.dim, kernel_init=INIT,
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
            name="attn")(attn_in)
        mlp_in = modulate(_norm_noaffine(x), shift_mlp, scale_mlp)
        x = x + gate_mlp[:, None, :] * Mlp(
            self.hidden_size, self.mlp_ratio, dtype=self.dtype,
            name="mlp")(mlp_in)
        return x


class DiTStack(nn.Module):
    """`num_layers` DiT blocks as one nn.scan (params stacked on axis 0)."""

    hidden_size: int
    num_heads: int
    num_layers: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    remat: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        class _Body(nn.Module):
            hidden_size: int
            num_heads: int
            mlp_ratio: float
            dtype: Dtype

            @nn.compact
            def __call__(self, carry, _):
                y = DiTBlock(self.hidden_size, self.num_heads, self.mlp_ratio,
                             dtype=self.dtype, name="block")(carry, c)
                return y, None

        body = _Body
        if self.remat:
            body = nn.remat(body, prevent_cse=False)
        scanned = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.num_layers,
        )(self.hidden_size, self.num_heads, self.mlp_ratio, self.dtype,
          name="layers")
        x, _ = scanned(x, None)
        return x
