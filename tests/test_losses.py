"""Loss/metric tests: SSIM properties, LPIPS shape/symmetry, loss assembly."""

import jax
import jax.numpy as jnp
import numpy as np

from open_diffusiongs_tpu.systems import losses as L
import pytest


def test_ssim_identity(rng):
    x = jnp.asarray(rng.uniform(size=(2, 3, 32, 32)).astype(np.float32))
    s = np.asarray(L.ssim(x, x))
    np.testing.assert_allclose(s, 1.0, atol=1e-5)


def test_ssim_decreases_with_noise(rng):
    x = jnp.asarray(rng.uniform(size=(2, 3, 48, 48)).astype(np.float32))
    y1 = x + 0.05 * jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    y2 = x + 0.3 * jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    s1 = float(np.mean(np.asarray(L.ssim(x, y1))))
    s2 = float(np.mean(np.asarray(L.ssim(x, y2))))
    assert 1.0 > s1 > s2


def test_ssim_matches_reference_formula_flat_images():
    # Uniform images: ssim = (2 mu1 mu2 + C1)(2*0 + C2) / ...
    x = jnp.full((1, 3, 24, 24), 0.5)
    y = jnp.full((1, 3, 24, 24), 0.25)
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    expect = ((2 * 0.5 * 0.25 + c1) / (0.25 + 0.0625 + c1)) * (c2 / c2)
    np.testing.assert_allclose(np.asarray(L.ssim(x, y))[0], expect, rtol=1e-5)


@pytest.mark.slow
def test_lpips_basic(rng):
    params = L.lpips_init_params(None)
    assert params["pretrained"] is False
    x = jnp.asarray(rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32))
    d_same = np.asarray(L.lpips(params, x, x))
    d_diff = np.asarray(L.lpips(params, x, y))
    assert d_same.shape == (2,)
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    assert (d_diff > 0).all()


def test_compute_losses_assembly(rng):
    b, v, h, w = 2, 3, 32, 32
    rend = jnp.asarray(rng.uniform(size=(b, v, 3, h, w)).astype(np.float32))
    targ = jnp.asarray(rng.uniform(size=(b, v, 3, h, w)).astype(np.float32))
    ray_o = jnp.asarray(rng.normal(size=(b, v, 3, h, w)).astype(np.float32))
    xyz = jnp.asarray(rng.normal(size=(b, v, 3, h, w)).astype(np.float32))
    gt_xyz = xyz + 0.1
    masks = jnp.ones((b, v, 1, h, w))
    out = L.compute_losses(rend, targ, ray_o, xyz, gt_xyz, masks,
                           lpips_params=None, use_lpips=False)
    assert out.l2.shape == (b,)
    mse = np.mean((np.asarray(rend) - np.asarray(targ)) ** 2, axis=(1, 2, 3, 4))
    np.testing.assert_allclose(np.asarray(out.l2), mse, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.psnr), -10 * np.log10(mse),
                               rtol=1e-4)
    # masked xyz loss: sum(diff^2 * mask)/sum(mask) with diff=0.1 everywhere
    np.testing.assert_allclose(float(out.xyz),
                               (0.1 ** 2) * 3 * b * v * h * w / (b * v * h * w),
                               rtol=1e-3)
    assert np.isfinite(np.asarray(out.pointsdist)).all()


def test_perfect_render_loss_zero(rng):
    b, v, h, w = 1, 2, 32, 32
    img = jnp.asarray(rng.uniform(size=(b, v, 3, h, w)).astype(np.float32))
    ray_o = jnp.ones((b, v, 3, h, w))
    out = L.compute_losses(img, img, ray_o, use_lpips=False)
    assert float(out.l2[0]) < 1e-10
    np.testing.assert_allclose(np.asarray(out.ssim), 0.0, atol=1e-5)


def test_metrics(rng):
    x = jnp.asarray(rng.uniform(size=(4, 3, 32, 32)).astype(np.float32))
    noise = 0.1 * jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    m = L.compute_metrics(x, jnp.clip(x + noise, 0, 1))
    assert m["psnr"].shape == (4,)
    assert (np.asarray(m["psnr"]) > 10).all()
    assert (np.asarray(m["ssim"]) < 1.0).all()


def _ssim_direct(x, y, use_sample_covariance):
    """Independent brute-force skimage-semantics SSIM: per-window weighted
    moments computed directly (no convolutions), per channel, averaged —
    the oracle for L.ssim(use_sample_covariance=...)."""
    win = 11
    coords = np.arange(win) - win // 2
    g = np.exp(-(coords ** 2) / (2 * 1.5 ** 2))
    g = g / g.sum()
    w2d = np.outer(g, g)                       # [11, 11], sums to 1
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    cov_norm = (win * win) / (win * win - 1.0) if use_sample_covariance else 1.0
    n, c, h, w = x.shape
    out = np.zeros(n)
    for ni in range(n):
        vals = []
        for ci in range(c):
            for i in range(h - win + 1):
                for j in range(w - win + 1):
                    px = x[ni, ci, i:i + win, j:j + win]
                    py = y[ni, ci, i:i + win, j:j + win]
                    ux = (w2d * px).sum()
                    uy = (w2d * py).sum()
                    vx = cov_norm * ((w2d * px * px).sum() - ux * ux)
                    vy = cov_norm * ((w2d * py * py).sum() - uy * uy)
                    vxy = cov_norm * ((w2d * px * py).sum() - ux * uy)
                    vals.append(((2 * ux * uy + c1) * (2 * vxy + c2))
                                / ((ux * ux + uy * uy + c1) * (vx + vy + c2)))
        out[ni] = np.mean(vals)
    return out


def test_ssim_skimage_sample_covariance_semantics(rng):
    """Eval SSIM must use skimage sample-covariance normalization
    (reference losses.py:429-460); training SSIM keeps pytorch_msssim
    population covariance (:294).  Both verified against a direct
    per-window oracle."""
    # smooth, low-variance images: windowed variance ~ C2, where the
    # sample-covariance factor N/(N-1) actually moves the 3rd decimal
    # (like real photographs; on white noise the effect vanishes)
    i, j = np.meshgrid(np.arange(14), np.arange(14), indexing="ij")
    base = 0.5 + 0.1 * np.sin(i / 4.0) * np.cos(j / 5.0)
    x = np.stack([np.stack([base] * 3)] * 2).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.03, x.shape), 0, 1).astype(np.float32)
    for sample_cov in (False, True):
        got = np.asarray(L.ssim(jnp.asarray(x), jnp.asarray(y),
                                     use_sample_covariance=sample_cov))
        want = _ssim_direct(x, y, sample_cov)
        np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-6)
    # the two normalizations genuinely differ on such pairs
    a = np.asarray(L.ssim(jnp.asarray(x), jnp.asarray(y)))
    b = np.asarray(L.ssim(jnp.asarray(x), jnp.asarray(y),
                          use_sample_covariance=True))
    assert np.max(np.abs(a - b)) > 1e-4, (a, b)


def test_compute_metrics_uses_sample_covariance(rng):
    x = rng.uniform(size=(1, 3, 16, 16)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.2, x.shape), 0, 1).astype(np.float32)
    m = L.compute_metrics(jnp.asarray(x), jnp.asarray(y))
    want = L.ssim(jnp.asarray(x), jnp.asarray(y),
                       use_sample_covariance=True)
    np.testing.assert_allclose(np.asarray(m["ssim"]), np.asarray(want),
                               rtol=1e-6)
