"""Denoiser (DiT) tests: shapes, pixel alignment, adaLN conditioning,
scene-variant depth head, remat equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from open_diffusiongs_tpu.models.denoiser import DGSDenoiser
from open_diffusiongs_tpu.ops.rays import rays_chw
from utils3d import orbit_cameras

B, V, H, W = 2, 2, 16, 16
P = 8


def _inputs(rng, v=V, h=H, w=W):
    c2ws, fxy = orbit_cameras(v, h=h, w=w)
    c2w = jnp.asarray(np.broadcast_to(c2ws, (B,) + c2ws.shape))
    fxy = jnp.asarray(np.broadcast_to(fxy, (B,) + fxy.shape))
    ray_o, ray_d = rays_chw(c2w, fxy, h, w)
    images = jnp.asarray(rng.uniform(size=(B, v, 3, h, w)).astype(np.float32))
    t = jnp.asarray([5, 100])
    return images, ray_o, ray_d, t


def _model(**kw):
    kwargs = dict(width=64, patch_size=P, n_gaussians=2, dim_heads=32,
                  num_layers=2, remat=False)
    kwargs.update(kw)
    return DGSDenoiser(**kwargs)


@pytest.mark.slow
def test_output_shapes_and_pixel_alignment(rng):
    model = _model()
    images, ray_o, ray_d, t = _inputs(rng)
    params = model.init(jax.random.PRNGKey(0), images, ray_o, ray_d, t)
    g, pix_xyz = model.apply(params, images, ray_o, ray_d, t)
    n = 2 + V * H * W
    assert g.xyz.shape == (B, n, 3)
    assert g.features.shape == (B, n, 1, 3)
    assert g.scaling.shape == (B, n, 3)
    assert g.rotation.shape == (B, n, 4)
    assert g.opacity.shape == (B, n, 1)
    # activation ranges from to_gs (denoiser.py:118-119)
    assert float(jnp.max(g.scaling)) <= -1.2
    # pixel-aligned gaussians sit on their rays: (xyz - ray_o) x ray_d = 0
    ro = np.asarray(ray_o).transpose(0, 1, 3, 4, 2).reshape(B, -1, 3)
    rd = np.asarray(ray_d).transpose(0, 1, 3, 4, 2).reshape(B, -1, 3)
    # token order is (v, hh, ww, ph, pw); rebuild the same order for rays
    def tokorder(x):
        x = x.reshape(B, V, 3, H // P, P, W // P, P)
        return x.transpose(0, 1, 3, 5, 4, 6, 2).reshape(B, -1, 3)
    ro = tokorder(np.asarray(ray_o))
    rd = tokorder(np.asarray(ray_d))
    pix = np.asarray(g.xyz)[:, 2:]
    cross = np.cross(pix - ro, rd)
    assert np.abs(cross).max() < 2e-4


def test_object_depth_range(rng):
    # object head: depth in o_dot_d +- 1.8
    model = _model()
    images, ray_o, ray_d, t = _inputs(rng)
    params = model.init(jax.random.PRNGKey(0), images, ray_o, ray_d, t)
    g, pix_xyz = model.apply(params, images, ray_o, ray_d, t)
    o_dot_d = np.sum(-np.asarray(ray_o) * np.asarray(ray_d), axis=2)
    depth = np.einsum("bvchw,bvchw->bvhw",
                      np.asarray(pix_xyz) - np.asarray(ray_o),
                      np.asarray(ray_d))
    assert np.all(depth > o_dot_d - 1.8 - 1e-4)
    assert np.all(depth < o_dot_d + 1.8 + 1e-4)


def test_scene_variant_depth_range(rng):
    model = _model(ray_pe_type="plk", range_setting_near=0.0,
                   range_setting_far=500.0, clip_xyz=False)
    images, ray_o, ray_d, t = _inputs(rng)
    params = model.init(jax.random.PRNGKey(0), images, ray_o, ray_d, t)
    g, pix_xyz = model.apply(params, images, ray_o, ray_d, t)
    depth = np.einsum("bvchw,bvchw->bvhw",
                      np.asarray(pix_xyz) - np.asarray(ray_o),
                      np.asarray(ray_d))
    assert np.all(depth >= 0.0) and np.all(depth <= 500.0)


def test_training_clip(rng):
    model = _model()
    images, ray_o, ray_d, t = _inputs(rng)
    params = model.init(jax.random.PRNGKey(0), images, ray_o, ray_d, t)
    g, _ = model.apply(params, images, ray_o, ray_d, t, training=True)
    pix = np.asarray(g.xyz)[:, 2:]
    assert pix.min() >= -1.0 - 1e-6 and pix.max() <= 1.0 + 1e-6


def test_timestep_conditioning_changes_output(rng):
    model = _model()
    images, ray_o, ray_d, _ = _inputs(rng)
    params = model.init(jax.random.PRNGKey(0), images, ray_o, ray_d,
                        jnp.asarray([0, 0]))
    g1, _ = model.apply(params, images, ray_o, ray_d, jnp.asarray([0, 0]))
    g2, _ = model.apply(params, images, ray_o, ray_d, jnp.asarray([900, 900]))
    assert np.abs(np.asarray(g1.opacity) - np.asarray(g2.opacity)).max() > 1e-6


def test_remat_matches_norremat(rng):
    images, ray_o, ray_d, t = _inputs(rng)
    m1 = _model(remat=False)
    m2 = _model(remat=True)
    params = m1.init(jax.random.PRNGKey(0), images, ray_o, ray_d, t)
    g1, _ = m1.apply(params, images, ray_o, ray_d, t)
    g2, _ = m2.apply(params, images, ray_o, ray_d, t)
    np.testing.assert_allclose(np.asarray(g1.xyz), np.asarray(g2.xyz),
                               atol=1e-6)


@pytest.mark.slow
def test_remat_save_attn_plumbing_and_grads(rng):
    """remat_save_attn reaches DiTStack through the DGSDenoiser surface
    (bench.py BENCH_SAVE_ATTN / configs) and preserves values + gradients
    vs plain remat (it only changes WHAT backward rematerializes)."""
    images, ray_o, ray_d, t = _inputs(rng)
    m1 = _model(remat=True)
    m2 = _model(remat=True, remat_save_attn=True)
    params = m1.init(jax.random.PRNGKey(0), images, ray_o, ray_d, t)

    def loss(m):
        def f(p):
            g, _ = m.apply(p, images, ray_o, ray_d, t)
            return jnp.sum(g.xyz ** 2)
        return f

    v1, g1 = jax.value_and_grad(loss(m1))(params)
    v2, g2 = jax.value_and_grad(loss(m2))(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.slow
def test_remat_save_mlp_plumbing_and_grads(rng):
    """remat_save_mlp (keep fc1 pre-gelu hidden; PERF_NOTES r3) reaches
    DiTStack through the DGSDenoiser surface and preserves values +
    gradients vs plain remat, alone and combined with save_attn."""
    images, ray_o, ray_d, t = _inputs(rng)
    m1 = _model(remat=True)
    params = m1.init(jax.random.PRNGKey(0), images, ray_o, ray_d, t)

    def loss(m):
        def f(p):
            g, _ = m.apply(p, images, ray_o, ray_d, t)
            return jnp.sum(g.xyz ** 2)
        return f

    v1, g1 = jax.value_and_grad(loss(m1))(params)
    for kw in (dict(remat_save_mlp=True),
               dict(remat_save_attn=True, remat_save_mlp=True)):
        m2 = _model(remat=True, **kw)
        v2, g2 = jax.value_and_grad(loss(m2))(params)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)


def test_param_count_full_size():
    # Full-size object config: sanity-check parameter count ~ 24-layer DiT.
    model = DGSDenoiser(remat=False)
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 1, 3, 64, 64)), jnp.zeros((1, 1, 3, 64, 64)),
            jnp.zeros((1, 1, 3, 64, 64)), jnp.zeros((1,), jnp.int32)))
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(shapes))
    # 24 layers x (qkv 3d^2 + proj d^2 + mlp 8d^2 + adaLN 6d^2) ~= 18d^2 x 24
    assert 400e6 < n_params < 500e6


def test_gs_raw_offsets_shift_population(rng):
    """The trained-stats bench knob (gs_raw_offset_*): additive shifts on
    the raw head outputs move the emitted scaling/opacity means by exactly
    the offset (modulo the -1.2 scaling clamp), identical params either
    way, and zero offsets are a no-op."""
    images, ray_o, ray_d, t = _inputs(rng)
    m0 = _model()
    params = m0.init(jax.random.PRNGKey(0), images, ray_o, ray_d, t)
    g0, _ = m0.apply(params, images, ray_o, ray_d, t)
    mz = _model(gs_raw_offset_scaling=0.0, gs_raw_offset_opacity=0.0)
    gz, _ = mz.apply(params, images, ray_o, ray_d, t)
    np.testing.assert_array_equal(np.asarray(g0.scaling),
                                  np.asarray(gz.scaling))
    m1 = _model(gs_raw_offset_scaling=-2.75, gs_raw_offset_opacity=3.0)
    g1, _ = m1.apply(params, images, ray_o, ray_d, t)
    # scaling: far below the clamp, so an exact shift
    np.testing.assert_allclose(np.asarray(g1.scaling),
                               np.asarray(g0.scaling) - 2.75, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1.opacity),
                               np.asarray(g0.opacity) + 3.0, atol=1e-5)
    # xyz / rotation / features untouched
    np.testing.assert_array_equal(np.asarray(g0.xyz), np.asarray(g1.xyz))
