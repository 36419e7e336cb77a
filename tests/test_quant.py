"""W8A8 int8 dense path (ops/quant.py) — serving-mode quantization.

Layer-level accuracy bounds, nn.Dense parameter-tree compatibility (the
whole point: checkpoints load unchanged), and the end-to-end denoiser
plumbing of the quant_int8 flag.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from open_diffusiongs_tpu.ops.quant import QuantDense, int8_matmul

# interpret-mode Pallas kernels / subprocess / multi-second jits:
# fast sweep is `pytest -m "not slow"` (pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.slow


def test_int8_matmul_accuracy(rng):
    x = jnp.asarray(rng.normal(0, 1.0, (64, 512)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (512, 256)), jnp.float32)
    got = np.asarray(int8_matmul(x, w))
    want = np.asarray(x @ w)
    # per-token + per-channel symmetric scales: sub-percent relative error
    # on gaussian data at this depth
    rel = np.abs(got - want) / (np.abs(want).mean() + 1e-9)
    assert rel.mean() < 0.015, rel.mean()
    assert rel.max() < 0.12, rel.max()


def test_int8_matmul_outlier_row_isolated(rng):
    """Per-token scales keep one huge-activation row from destroying the
    quantization of every other row."""
    x = np.asarray(rng.normal(0, 1.0, (32, 256)), np.float32)
    x[3] *= 1000.0
    w = jnp.asarray(rng.normal(0, 0.05, (256, 128)), jnp.float32)
    got = np.asarray(int8_matmul(jnp.asarray(x), w))
    want = np.asarray(jnp.asarray(x) @ w)
    other = np.arange(32) != 3
    rel = np.abs(got[other] - want[other]) / (np.abs(want[other]).mean())
    assert rel.mean() < 0.01, rel.mean()


def test_quant_dense_param_tree_matches_dense(rng):
    x = jnp.asarray(rng.normal(0, 1, (4, 96)), jnp.float32)
    dense = nn.Dense(48)
    qdense = QuantDense(48)
    pd = dense.init(jax.random.PRNGKey(0), x)
    pq = qdense.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(pd) == jax.tree_util.tree_structure(pq)
    shapes_d = jax.tree.map(jnp.shape, pd)
    shapes_q = jax.tree.map(jnp.shape, pq)
    assert shapes_d == shapes_q
    # a Dense checkpoint applied through QuantDense: close output
    yd = np.asarray(dense.apply(pd, x))
    yq = np.asarray(qdense.apply(pd, x))
    rel = np.abs(yq - yd) / (np.abs(yd).mean() + 1e-9)
    assert rel.mean() < 0.02, rel.mean()


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_quant_dense_dtype(rng, dtype):
    x = jnp.asarray(rng.normal(0, 1, (4, 64)), dtype)
    m = QuantDense(32, dtype=dtype)
    p = m.init(jax.random.PRNGKey(1), x)
    y = m.apply(p, x)
    assert y.dtype == dtype


def _tiny_denoiser(quant):
    from open_diffusiongs_tpu.models.denoiser import DGSDenoiser
    return DGSDenoiser(width=128, dim_heads=64, patch_size=8,
                       n_gaussians=16, num_layers=2, attn_impl="xla",
                       remat=False, quant_int8=quant)


def test_denoiser_quant_flag_end_to_end(rng):
    imgs = jnp.asarray(rng.uniform(0, 1, (1, 2, 3, 16, 16)), jnp.float32)
    ro = jnp.asarray(rng.normal(0, 1, (1, 2, 3, 16, 16)), jnp.float32)
    rd = ro / jnp.linalg.norm(ro, axis=2, keepdims=True)
    t = jnp.asarray([10])

    mf = _tiny_denoiser(False)
    mq = _tiny_denoiser(True)
    params = mf.init(jax.random.PRNGKey(0), imgs, ro, rd, t)
    # identical param tree: the f32-trained checkpoint drives the int8 path
    pq = mq.init(jax.random.PRNGKey(0), imgs, ro, rd, t)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(pq))

    gf, df = jax.jit(mf.apply)(params, imgs, ro, rd, t)
    gq, dq = jax.jit(mq.apply)(params, imgs, ro, rd, t)
    for a, b, name in ((gf.xyz, gq.xyz, "xyz"), (df, dq, "depth")):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        assert np.isfinite(b).all(), name
        # quantization noise through 2 blocks: correlated, not identical
        cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        assert cos > 0.99, (name, cos)
        assert not np.allclose(a, b), name   # the int8 path actually ran


def test_quant_training_raises(rng):
    imgs = jnp.asarray(rng.uniform(0, 1, (1, 2, 3, 16, 16)), jnp.float32)
    ro = jnp.asarray(rng.normal(0, 1, (1, 2, 3, 16, 16)), jnp.float32)
    rd = ro / jnp.linalg.norm(ro, axis=2, keepdims=True)
    t = jnp.asarray([10])
    m = _tiny_denoiser(True)
    params = m.init(jax.random.PRNGKey(0), imgs, ro, rd, t)
    with pytest.raises(ValueError, match="serving-mode"):
        m.apply(params, imgs, ro, rd, t, training=True)


def test_quant_with_tp_mesh_matches_unsharded(monkeypatch, rng):
    """quant_int8 composes with the shard_map'd TP attention: the int8
    Denses sit outside the shard_map (replicated activations), so a dp x
    tp mesh must reproduce the single-device quantized forward exactly."""
    import functools as ft

    from open_diffusiongs_tpu.models import transformer as tr
    from open_diffusiongs_tpu.ops import attention as at
    from open_diffusiongs_tpu.parallel.mesh import make_mesh

    monkeypatch.setattr(tr, "resolve_attn_impl",
                        lambda impl: "flash" if impl == "auto" else impl)
    monkeypatch.setattr(at, "flash_mha_packed",
                        ft.partial(at.flash_mha_packed, interpret=True))
    tr._make_packed_attn.cache_clear()

    mesh = make_mesh(jax.devices()[:4], model_parallel=2)
    b, l, d, heads, layers = 2, 36, 256, 4, 2   # b divides the dp axis
    x = jnp.asarray(rng.normal(size=(b, l, d)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(b, d)), jnp.float32)

    plain = tr.DiTStack(hidden_size=d, num_heads=heads, num_layers=layers,
                        remat=False, attn_impl="auto", quant_int8=True)
    tp = tr.DiTStack(hidden_size=d, num_heads=heads, num_layers=layers,
                     remat=False, attn_impl="auto", quant_int8=True,
                     tp_mesh=mesh)
    params = plain.init(jax.random.PRNGKey(0), x, c)
    out_plain = plain.apply(params, x, c)
    with mesh:
        out_tp = jax.jit(tp.apply)(params, x, c)
    np.testing.assert_allclose(np.asarray(out_tp), np.asarray(out_plain),
                               atol=2e-4, rtol=1e-3)
    tr._make_packed_attn.cache_clear()
