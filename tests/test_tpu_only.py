"""TPU-hardware-only checks (skipped on the CPU test mesh): splash-vs-XLA
attention parity. Run manually with: JAX_REQUIRE_TPU=1 pytest tests/test_tpu_only.py"""

import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    os.environ.get("JAX_REQUIRE_TPU") != "1",
    reason="TPU-only test; set JAX_REQUIRE_TPU=1 on a TPU host")


@requires_tpu
def test_splash_matches_xla():
    import jax
    import jax.numpy as jnp
    from open_diffusiongs_tpu.models.transformer import fused_attention
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(2, 1026, 4, 64)), jnp.float32)
               for _ in range(3))
    o_x = np.asarray(jax.jit(
        lambda q, k, v: fused_attention(q, k, v, "xla"))(q, k, v))
    o_s = np.asarray(jax.jit(
        lambda q, k, v: fused_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), "splash"))(q, k, v), np.float32)
    assert np.abs(o_x - o_s).max() < 5e-3


@requires_tpu
def test_flash_kernel_matches_xla():
    import jax
    import jax.numpy as jnp
    from open_diffusiongs_tpu.models.transformer import fused_attention
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(2, 1026, 4, 64)), jnp.float32)
               for _ in range(3))
    o_x = np.asarray(jax.jit(
        lambda q, k, v: fused_attention(q, k, v, "xla"))(q, k, v))
    o_f = np.asarray(jax.jit(
        lambda q, k, v: fused_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), "flash"))(q, k, v), np.float32)
    assert np.abs(o_x - o_f).max() < 2e-2


@requires_tpu
def test_flash_kernel_grads_route_through_splash():
    import jax
    import jax.numpy as jnp
    from open_diffusiongs_tpu.models.transformer import fused_attention
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.normal(size=(1, 520, 2, 64)), jnp.bfloat16)
               for _ in range(3))

    def loss(impl):
        def f(q, k, v):
            return jnp.sum(fused_attention(q, k, v, impl)
                           .astype(jnp.float32) ** 2)
        return jax.jit(jax.grad(f, argnums=(0, 1, 2)))

    g_f = loss("flash")(q, k, v)
    g_s = loss("splash")(q, k, v)
    for a, b in zip(g_f, g_s):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=5e-2, rtol=0.2)
