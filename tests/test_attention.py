"""Fused full-attention kernel (ops/attention.py) — CPU interpret-mode
parity vs the XLA reference.  TPU-hardware timing/parity lives in
tests/test_tpu_only.py and tools/bench_attn2.py."""

import jax
import jax.numpy as jnp
import numpy as np


def _ref(q, k, v):
    return jax.nn.dot_product_attention(q, k, v)


def _run(b, l, h, d, blocks, seed=0):
    from open_diffusiongs_tpu.ops.attention import flash_full_mha
    rng = np.random.default_rng(seed)
    q, k, v = (jnp.asarray(rng.normal(size=(b, l, h, d)), jnp.float32)
               for _ in range(3))
    out = flash_full_mha(q, k, v, blocks=blocks, interpret=True)
    ref = _ref(q, k, v)
    return float(np.abs(np.asarray(out) - np.asarray(ref)).max())


def test_padded_length():
    # 700 valid rows padded to 1024: the validity column must kill the pad
    assert _run(2, 700, 3, 64, (512, 512)) < 2e-2


def test_exact_multiple():
    assert _run(1, 1024, 2, 64, (512, 512)) < 2e-2


def test_single_block():
    # l < block: init and finalize happen in the same grid step
    assert _run(1, 100, 2, 64, (512, 512)) < 2e-2


def test_asymmetric_blocks():
    assert _run(1, 1100, 2, 64, (1024, 512)) < 2e-2


def test_large_logits_stable():
    # running-max correctness under score magnitudes that would overflow
    # a max-free exp
    from open_diffusiongs_tpu.ops.attention import flash_full_mha
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(0, 12, (1, 600, 2, 64)), jnp.float32)
    k = jnp.asarray(rng.normal(0, 12, (1, 600, 2, 64)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 600, 2, 64)), jnp.float32)
    out = np.asarray(flash_full_mha(q, k, v, blocks=(512, 512),
                                    interpret=True))
    ref = np.asarray(_ref(q, k, v))
    assert np.isfinite(out).all()
    assert np.abs(out - ref).max() < 2e-2
