"""Int8 (W8A8) dense path for the DiT — opt-in serving-mode quantization.

Why the *dense* layers and not the attention kernel: the v5e MXU's int8
rate (394 TOPS vs 197 bf16 TFLOPs) comes from packing two int8 MACs per
PE along the **contraction** dimension — effective depth 256 instead of
128.  A matmul only speeds up if its contraction dim is deeper than 128:

  * q/k/v/proj (depth = width 1024) and MLP fc1/fc2 (1024 / 4096): the
    pass count halves — a genuine ~2x on the ~3 s of dense time in the
    512^2 asset;
  * the attention kernel's QK^T (depth = head_dim 64) gains NOTHING —
    the int8 pass count equals the bf16 pass count, exactly the
    block-diagonal-packing arithmetic in docs/PERF_NOTES.md ("the array
    stays half-idle either way"); only its PV matmul (depth bkv=512)
    would benefit, bounding any int8 attention kernel at ~15% — not
    worth a Mosaic-risk kernel fork (see PERF_NOTES "int8" note).

Scheme (standard symmetric W8A8, no zero points):
  * weights: per-output-channel absmax/127 scales — computed in-graph
    from the f32 params (O(d^2) per layer, ~L/1 cheaper than the matmul
    it feeds, so no calibration pass or separate checkpoint format);
  * activations: dynamic per-token absmax/127 scales;
  * int8 x int8 -> int32 `dot_general` (XLA emits native MXU int8 ops on
    TPU; nothing Pallas, so no custom-kernel compile risk), dequantized
    by the rank-1 outer product of the two scale vectors.

Inference-only: the rounding is a step function, so gradients through
this path are zero — training configs must keep `quant_int8` off (the
shipped ones do; it is a serving knob).

Accuracy is input-distribution-dependent and must be measured end-to-end:
tests/test_quant.py pins layer-level error; BENCH_INT8=1 bench.py runs
the full sampler both ways and reports the render PSNR delta alongside
the speed.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _quantize_rows(x: jnp.ndarray, axis: int):
    """Symmetric int8 quantization along `axis` (absmax/127 scales).

    Returns (int8 values, f32 scales with `axis` kept as size 1)."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = jnp.maximum(ax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_matmul(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """[..., cin] @ [cin, cout] via int8 MXU ops; returns f32.

    Per-token (last-axis) activation scales, per-output-channel weight
    scales; int32 accumulation is exact (127*127*cin < 2^31 for any
    cin < 133k)."""
    xq, sx = _quantize_rows(x, axis=-1)
    wq, sw = _quantize_rows(kernel, axis=0)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx * sw


class QuantDense(nn.Module):
    """Drop-in nn.Dense replacement running the W8A8 int8 path.

    Identical parameter tree ("kernel" [cin, cout] f32, "bias" [cout]) —
    checkpoints trained with nn.Dense load unchanged; the quantization is
    purely a forward-computation choice."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        y = int8_matmul(x, kernel)
        if self.use_bias:
            y = y + self.param("bias", self.bias_init, (self.features,))
        return y.astype(self.dtype)
