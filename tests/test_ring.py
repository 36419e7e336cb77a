"""Sequence (context) parallelism: ring attention vs single-device attention.

Runs on the 8-virtual-CPU-device mesh (conftest.py) — the off-hardware
stand-in for real multi-chip, same as the TP tests.  The ring must be exact
(up to f32 reassociation) including pad-key masking, and differentiable
(the backward rotates gradients the opposite way around the ring).
"""

import jax
import jax.numpy as jnp
import numpy as np

from open_diffusiongs_tpu.parallel.mesh import make_mesh
from open_diffusiongs_tpu.parallel.ring import make_ring_attention
import pytest


# interpret-mode Pallas kernels / subprocess / multi-second jits:
# fast sweep is `pytest -m "not slow"` (pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.slow


def _ref(q, k, v, l_real, dh):
    """XLA full attention over the real rows, output padded back."""
    b, lp, hd = q.shape
    h = hd // dh
    q4 = q[:, :l_real].reshape(b, l_real, h, dh)
    k4 = k[:, :l_real].reshape(b, l_real, h, dh)
    v4 = v[:, :l_real].reshape(b, l_real, h, dh)
    o4 = jax.nn.dot_product_attention(q4, k4, v4)
    return jnp.pad(o4.reshape(b, l_real, hd),
                   ((0, 0), (0, lp - l_real), (0, 0)))


def _rand_qkv(rng, b, lp, hd):
    return tuple(jnp.asarray(rng.normal(size=(b, lp, hd)), jnp.float32)
                 for _ in range(3))


def test_ring_matches_xla_attention():
    """dp=2 x sp=4: forward parity, pad keys spanning two shards."""
    mesh = make_mesh(jax.devices()[:8], seq_parallel=4)   # dp=2 x sp=4
    b, lp, h, dh, l_real = 2, 512, 4, 32, 300   # shards of 128; pads in 2&3
    rng = np.random.default_rng(0)
    q, k, v = _rand_qkv(rng, b, lp, h * dh)
    f = make_ring_attention(mesh, dh=dh, l_real=l_real)
    with mesh:
        out = jax.jit(f)(q, k, v)
    ref = _ref(q, k, v, l_real, dh)
    np.testing.assert_allclose(np.asarray(out)[:, :l_real],
                               np.asarray(ref)[:, :l_real],
                               atol=2e-5, rtol=1e-4)


def test_ring_no_padding_sp8():
    """sp=8, l_real == Lp (no pad keys at all)."""
    mesh = make_mesh(jax.devices()[:8], seq_parallel=8)
    b, lp, h, dh = 1, 1024, 2, 64
    rng = np.random.default_rng(1)
    q, k, v = _rand_qkv(rng, b, lp, h * dh)
    f = make_ring_attention(mesh, dh=dh, l_real=lp)
    with mesh:
        out = jax.jit(f)(q, k, v)
    ref = _ref(q, k, v, lp, dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_ring_subchunking_matches():
    """kv_chunk smaller than the local slice: inner scan must be exact."""
    mesh = make_mesh(jax.devices()[:4], seq_parallel=2)   # dp=2 x sp=2
    b, lp, h, dh, l_real = 2, 512, 2, 32, 400
    rng = np.random.default_rng(2)
    q, k, v = _rand_qkv(rng, b, lp, h * dh)
    f = make_ring_attention(mesh, dh=dh, l_real=l_real, kv_chunk=64)
    with mesh:
        out = jax.jit(f)(q, k, v)
    ref = _ref(q, k, v, l_real, dh)
    np.testing.assert_allclose(np.asarray(out)[:, :l_real],
                               np.asarray(ref)[:, :l_real],
                               atol=2e-5, rtol=1e-4)


def test_ring_gradients_match():
    """Gradients through the ring (scan + ppermute) == XLA attention grads."""
    mesh = make_mesh(jax.devices()[:8], seq_parallel=4)
    b, lp, h, dh, l_real = 2, 512, 2, 32, 450
    rng = np.random.default_rng(3)
    q, k, v = _rand_qkv(rng, b, lp, h * dh)
    f = make_ring_attention(mesh, dh=dh, l_real=l_real)

    def loss(fn):
        def inner(q_, k_, v_):
            return jnp.sum(fn(q_, k_, v_)[:, :l_real] ** 2)
        return inner

    with mesh:
        g_ring = jax.jit(jax.grad(loss(f), argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.jit(jax.grad(
        loss(lambda a, bb, c: _ref(a, bb, c, l_real, dh)),
        argnums=(0, 1, 2)))(q, k, v)
    for gr, gx, nm in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gx),
                                   atol=3e-5, rtol=1e-3, err_msg=nm)


def test_ring_with_tensor_parallel_axes():
    """dp=2 x sp=2 x tp=2: the channel (head) axis sharded over `model` on
    top of the token ring — the local-head math must not change anything."""
    mesh = make_mesh(jax.devices()[:8], model_parallel=2, seq_parallel=2)
    b, lp, h, dh, l_real = 2, 256, 4, 32, 200   # 2 heads per model shard
    rng = np.random.default_rng(4)
    q, k, v = _rand_qkv(rng, b, lp, h * dh)
    f = make_ring_attention(mesh, dh=dh, l_real=l_real)
    with mesh:
        out = jax.jit(f)(q, k, v)
    ref = _ref(q, k, v, l_real, dh)
    np.testing.assert_allclose(np.asarray(out)[:, :l_real],
                               np.asarray(ref)[:, :l_real],
                               atol=2e-5, rtol=1e-4)


def test_ring_through_dit_stack():
    """Integration: DiTStack with sp_mesh (ring attention + token-sharding
    constraint + nn.scan + remat) == the plain stack, forward AND grads."""
    from open_diffusiongs_tpu.models import transformer as tr

    mesh = make_mesh(jax.devices()[:8], seq_parallel=4)   # dp=2 x sp=4
    b, l, d, heads, layers = 2, 70, 256, 4, 2
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(b, l, d)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)

    plain = tr.DiTStack(hidden_size=d, num_heads=heads, num_layers=layers,
                        remat=True, attn_impl="xla")
    ring = tr.DiTStack(hidden_size=d, num_heads=heads, num_layers=layers,
                       remat=True, attn_impl="xla", sp_mesh=mesh)
    params = plain.init(jax.random.PRNGKey(0), x, c)

    out_plain = plain.apply(params, x, c)
    with mesh:
        out_ring = jax.jit(ring.apply)(params, x, c)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_plain),
                               atol=2e-4, rtol=1e-3)

    def loss(p, module):
        return jnp.sum(module.apply(p, x, c) ** 2)

    g_plain = jax.grad(loss)(params, plain)
    with mesh:
        g_ring = jax.jit(lambda p: jax.grad(loss)(p, ring))(params)
    for (ka, a), (kb, bb) in zip(
            jax.tree_util.tree_flatten_with_path(g_ring)[0],
            jax.tree_util.tree_flatten_with_path(g_plain)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=2e-4, rtol=1e-2,
            err_msg=str(ka))


def test_ring_denoiser_full_model():
    """The full DGSDenoiser under dp x sp: Gaussians match the unsharded
    model (the token constraint + ring must survive patchify/unpatchify
    and the gaussian/image token concat)."""
    from open_diffusiongs_tpu.models.denoiser import DGSDenoiser

    mesh = make_mesh(jax.devices()[:8], seq_parallel=4)
    kw = dict(width=256, num_layers=2, patch_size=8, dim_heads=64,
              attn_impl="xla", remat=False, dtype=jnp.float32)
    h = w = 16
    b, v = 2, 2
    rng = np.random.default_rng(6)
    imgs = jnp.asarray(rng.uniform(size=(b, v, 3, h, w)), jnp.float32)
    rays = jnp.asarray(rng.normal(size=(b, v, 3, h, w)), jnp.float32)
    rays = rays / jnp.linalg.norm(rays, axis=2, keepdims=True)
    t = jnp.full((b,), 5, jnp.int32)

    m_plain = DGSDenoiser(**kw)
    m_sp = DGSDenoiser(**kw, sp_mesh=mesh)
    params = m_plain.init(jax.random.PRNGKey(0), imgs, rays, rays, t)
    g_plain, _ = jax.jit(m_plain.apply)(params, imgs, rays, rays, t)
    with mesh:
        g_sp, _ = jax.jit(m_sp.apply)(params, imgs, rays, rays, t)
    np.testing.assert_allclose(np.asarray(g_sp.xyz), np.asarray(g_plain.xyz),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(g_sp.opacity),
                               np.asarray(g_plain.opacity),
                               atol=2e-4, rtol=1e-3)


def test_ring_kernel_path_matches():
    """Packed-kernel ring path (per-slice Pallas kernel + exp2-LSE combine,
    interpret mode) == XLA full attention, pad keys in the tail shard."""
    mesh = make_mesh(jax.devices()[:4], seq_parallel=4)
    b, lp, h, dh, l_real = 2, 512, 4, 32, 400   # lq=128; tail lsub=16
    rng = np.random.default_rng(6)
    q, k, v = _rand_qkv(rng, b, lp, h * dh)
    f = make_ring_attention(mesh, dh=dh, l_real=l_real, use_kernel=True)
    with mesh:
        out = jax.jit(f)(q, k, v)
    ref = _ref(q, k, v, l_real, dh)
    np.testing.assert_allclose(np.asarray(out)[:, :l_real],
                               np.asarray(ref)[:, :l_real],
                               atol=2e-5, rtol=1e-4)


def test_ring_kernel_path_no_pad_sp2():
    """Kernel path with l_real == Lp: the no-cond single-instantiation
    branch (lsub == lq)."""
    mesh = make_mesh(jax.devices()[:2], seq_parallel=2)
    b, lp, h, dh = 1, 512, 2, 64                # hps=2, h=2: eligible
    rng = np.random.default_rng(7)
    q, k, v = _rand_qkv(rng, b, lp, h * dh)
    f = make_ring_attention(mesh, dh=dh, l_real=lp, use_kernel=True)
    with mesh:
        out = jax.jit(f)(q, k, v)
    ref = _ref(q, k, v, lp, dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_ring_kernel_path_gradients():
    """Grads of the kernel path (custom_vjp -> XLA-ring backward) == XLA
    attention grads."""
    mesh = make_mesh(jax.devices()[:4], seq_parallel=4)
    b, lp, h, dh, l_real = 1, 512, 4, 32, 450
    rng = np.random.default_rng(8)
    q, k, v = _rand_qkv(rng, b, lp, h * dh)
    f = make_ring_attention(mesh, dh=dh, l_real=l_real, use_kernel=True)

    def loss(fn):
        def inner(q_, k_, v_):
            return jnp.sum(fn(q_, k_, v_)[:, :l_real] ** 2)
        return inner

    with mesh:
        g_ring = jax.jit(jax.grad(loss(f), argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.jit(jax.grad(
        loss(lambda a, bb, c: _ref(a, bb, c, l_real, dh)),
        argnums=(0, 1, 2)))(q, k, v)
    for gr, gx, nm in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gx),
                                   atol=3e-5, rtol=1e-3, err_msg=nm)
