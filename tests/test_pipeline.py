"""Pipeline parallelism: GPipe microbatched stages vs sequential execution.

Runs on the 8-virtual-CPU-device mesh (conftest.py).  The pipeline must be
exact (same layers, same order, microbatching is pure reshuffling) and
differentiable — the backward is the reverse pipeline through the same
scan + ppermute machinery.
"""

import jax
import jax.numpy as jnp
import numpy as np

from open_diffusiongs_tpu.parallel.mesh import make_mesh
from open_diffusiongs_tpu.parallel.pipeline import pipeline_apply
import pytest


# interpret-mode Pallas kernels / subprocess / multi-second jits:
# fast sweep is `pytest -m "not slow"` (pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.slow


def _toy_stage_fn(p_stack, x_mb, c_mb):
    """Apply this stage's layers: h -> tanh(h @ W + c)."""
    def one(h, w):
        return jnp.tanh(h @ w + c_mb), None
    h, _ = jax.lax.scan(one, x_mb, p_stack)
    return h


def _toy_ref(params, x, c):
    h = x
    for i in range(params.shape[0]):
        h = jnp.tanh(h @ params[i] + c)
    return h


def test_pipeline_matches_sequential():
    """4 stages x 2 layers each, 4 microbatches: exact match."""
    mesh = make_mesh(jax.devices()[:8], pipe_parallel=4)   # dp=2 x pp=4
    layers, d, b = 8, 16, 8
    rng = np.random.default_rng(0)
    params = jnp.asarray(rng.normal(0, 0.5, (layers, d, d)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(b, 6, d)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(b, 1, d)), jnp.float32)

    with mesh:
        out = jax.jit(lambda p, xx, cc: pipeline_apply(
            mesh, _toy_stage_fn, p, xx, cc, n_microbatches=4))(params, x, c)
    ref = _toy_ref(params, x, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-5)


def test_pipeline_single_microbatch_and_uneven():
    """mb=1 (pure fill/drain) and mb=2 with pp=2 both stay exact."""
    for pp, mb, n_dev in ((2, 1, 4), (2, 2, 4), (4, 2, 4)):
        mesh = make_mesh(jax.devices()[:n_dev], pipe_parallel=pp)
        layers, d, b = pp * 2, 8, 4
        rng = np.random.default_rng(pp * 10 + mb)
        params = jnp.asarray(rng.normal(0, 0.5, (layers, d, d)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(b, 3, d)), jnp.float32)
        c = jnp.asarray(rng.normal(size=(b, 1, d)), jnp.float32)
        with mesh:
            out = jax.jit(lambda p, xx, cc, m=mesh, nm=mb: pipeline_apply(
                m, _toy_stage_fn, p, xx, cc, n_microbatches=nm))(params, x, c)
        ref = _toy_ref(params, x, c)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6, rtol=1e-5,
                                   err_msg=f"pp={pp} mb={mb}")


def test_pipeline_gradients_match():
    """Param + input grads through the pipeline == sequential grads."""
    mesh = make_mesh(jax.devices()[:4], pipe_parallel=4)
    layers, d, b = 4, 8, 4
    rng = np.random.default_rng(3)
    params = jnp.asarray(rng.normal(0, 0.5, (layers, d, d)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(b, 3, d)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(b, 1, d)), jnp.float32)

    def loss_pipe(p, xx):
        return jnp.sum(pipeline_apply(mesh, _toy_stage_fn, p, xx, c,
                                      n_microbatches=4) ** 2)

    def loss_ref(p, xx):
        return jnp.sum(_toy_ref(p, xx, c) ** 2)

    with mesh:
        gp, gx = jax.jit(jax.grad(loss_pipe, argnums=(0, 1)))(params, x)
    rp, rx = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(params, x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(rp),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               atol=1e-5, rtol=1e-4)


def test_pipeline_through_dit_stack():
    """DiTStack with pp_mesh == plain stack (fwd + grads): the stacked
    nn.scan params sharded over `pipe`, one DiTBlock applied per layer
    inside the stage scan, remat composed per block."""
    from open_diffusiongs_tpu.models import transformer as tr

    mesh = make_mesh(jax.devices()[:8], pipe_parallel=4)   # dp=2 x pp=4
    b, l, d, heads, layers = 8, 70, 256, 4, 4   # local batch 4 = mb
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(b, l, d)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)

    plain = tr.DiTStack(hidden_size=d, num_heads=heads, num_layers=layers,
                        remat=True, attn_impl="xla")
    pipe = tr.DiTStack(hidden_size=d, num_heads=heads, num_layers=layers,
                       remat=True, attn_impl="xla", pp_mesh=mesh,
                       pp_microbatches=4)
    params = plain.init(jax.random.PRNGKey(0), x, c)

    out_plain = plain.apply(params, x, c)
    with mesh:
        out_pipe = jax.jit(pipe.apply)(params, x, c)
    np.testing.assert_allclose(np.asarray(out_pipe), np.asarray(out_plain),
                               atol=2e-5, rtol=1e-4)

    def loss(p, module):
        return jnp.sum(module.apply(p, x, c) ** 2)

    g_plain = jax.grad(loss)(params, plain)
    with mesh:
        g_pipe = jax.jit(lambda p: jax.grad(loss)(p, pipe))(params)
    for (ka, a), (kb, bb) in zip(
            jax.tree_util.tree_flatten_with_path(g_pipe)[0],
            jax.tree_util.tree_flatten_with_path(g_plain)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), atol=2e-5, rtol=1e-3,
            err_msg=str(ka))


def test_pipeline_state_sharding_rule():
    """train_state_sharding puts the scanned layer axis on `pipe` (params,
    EMA, moments) and leaves non-stack leaves replicated."""
    from jax.sharding import PartitionSpec as P

    from open_diffusiongs_tpu.parallel.mesh import train_state_sharding

    mesh = make_mesh(jax.devices()[:4], pipe_parallel=2)
    state = {
        "params": {"transformer": {"layers": {"block": {
            "kernel": jnp.zeros((4, 8, 8))}}},
            "head": {"kernel": jnp.zeros((8, 8))}},
        "count": jnp.zeros((), jnp.int32),
    }
    sh = train_state_sharding(mesh, state, pp=True)
    stack = sh["params"]["transformer"]["layers"]["block"]["kernel"]
    assert stack.spec == P("pipe")
    assert sh["params"]["head"]["kernel"].spec == P()
    assert sh["count"].spec == P()
