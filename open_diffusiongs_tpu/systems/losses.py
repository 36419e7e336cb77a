"""Losses & metrics, pure JAX.

Equivalent of the reference `utils/losses.py`:
  * LossComputer.forward (:261-369): per-batch-element MSE (+PSNR), LPIPS on
    bilinear-256 inputs, SSIM (pytorch_msssim, win 11 sigma 1.5, 1-ssim as
    loss), points-distance regularizer pulling |x - ray_o| toward a
    mean/std-normalized target (std 0.5 around |ray_o|), masked xyz MSE.
  * MetricComputer (:373-473): PSNR / SSIM / LPIPS eval metrics.

SSIM is implemented exactly like pytorch_msssim (separable gaussian window,
valid convolution, K1=0.01/K2=0.03).  LPIPS replicates the lpips-VGG16
architecture (5 feature stages, unit-normalize, 1x1 linear heads, spatial
mean, sum); pretrained weights are loaded from an NPZ produced by
`tools/convert_lpips_weights.py` — without it the heads fall back to a
deterministic random init (flagged), which keeps the loss functional for
training (the reference configs keep lambda_lpips at 0 for the first 150
steps anyway, configs/diffusionGS_rel.yaml:52).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# SSIM (pytorch_msssim-compatible)
# ---------------------------------------------------------------------------

def _gaussian_window(win_size: int, sigma: float) -> np.ndarray:
    coords = np.arange(win_size, dtype=np.float64) - win_size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _filter2d_separable(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Depthwise separable valid conv. x: [n, c, h, w]; win: [k]."""
    c = x.shape[1]
    k = win.shape[0]
    wh = jnp.broadcast_to(win.reshape(1, 1, k, 1), (c, 1, k, 1))
    ww = jnp.broadcast_to(win.reshape(1, 1, 1, k), (c, 1, 1, k))
    dn = jax.lax.conv_dimension_numbers(x.shape, (c, 1, k, 1),
                                        ("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, wh, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    dn = jax.lax.conv_dimension_numbers(x.shape, (c, 1, 1, k),
                                        ("NCHW", "OIHW", "NCHW"))
    return jax.lax.conv_general_dilated(x, ww, (1, 1), "VALID",
                                        dimension_numbers=dn,
                                        feature_group_count=c)


def ssim(x: jnp.ndarray, y: jnp.ndarray, win_size: int = 11,
         sigma: float = 1.5, data_range: float = 1.0,
         use_sample_covariance: bool = False) -> jnp.ndarray:
    """Per-image SSIM. x, y: [n, c, h, w] -> [n].

    use_sample_covariance=False reproduces pytorch_msssim (the reference's
    TRAINING loss, losses.py:294); =True reproduces skimage
    structural_similarity(win_size=11, gaussian_weights=True) — the
    reference's EVAL metric (losses.py:429-460): covariances scaled by
    N/(N-1) with N = win_size**2; skimage's reflect-pad gaussian_filter +
    crop-to-pad equals this valid convolution exactly."""
    win = jnp.asarray(_gaussian_window(win_size, sigma))
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    mu1 = _filter2d_separable(x, win)
    mu2 = _filter2d_separable(y, win)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0) if use_sample_covariance else 1.0
    sigma1_sq = cov_norm * (_filter2d_separable(x * x, win) - mu1_sq)
    sigma2_sq = cov_norm * (_filter2d_separable(y * y, win) - mu2_sq)
    sigma12 = cov_norm * (_filter2d_separable(x * y, win) - mu12)
    cs = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu12 + c1) / (mu1_sq + mu2_sq + c1)) * cs
    return jnp.mean(ssim_map, axis=(1, 2, 3))


# ---------------------------------------------------------------------------
# LPIPS (VGG16 backbone + linear heads)
# ---------------------------------------------------------------------------

# VGG16 conv plan: (out_channels, n_convs) per stage; feature taps after the
# last ReLU of each stage (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3).
_VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
# lpips.ScalingLayer constants
_LPIPS_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


def lpips_init_params(npz_path: Optional[str] = None, seed: int = 0
                      ) -> Dict[str, Any]:
    """Build LPIPS parameters.

    npz keys: `vgg/{stage}_{conv}/kernel|bias` ([kh, kw, cin, cout] / [cout])
    and `lin/{stage}/kernel` ([cin]).  Falls back to deterministic random
    weights with `pretrained=False` marker when no NPZ is given.
    """
    params: Dict[str, Any] = {"pretrained": npz_path is not None}
    data = dict(np.load(npz_path)) if npz_path else None
    rng = np.random.default_rng(seed)
    cin = 3
    for si, (cout, n_convs) in enumerate(_VGG_STAGES):
        for ci in range(n_convs):
            key = f"vgg/{si}_{ci}"
            if data is not None:
                k, b = data[key + "/kernel"], data[key + "/bias"]
            else:
                k = (rng.normal(0, np.sqrt(2.0 / (9 * cin)),
                                (3, 3, cin, cout))).astype(np.float32)
                b = np.zeros((cout,), np.float32)
            params[key] = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
            cin = cout
        if data is not None:
            lin = data[f"lin/{si}/kernel"]
        else:
            lin = np.abs(rng.normal(0, 0.01, (cout,))).astype(np.float32)
        params[f"lin/{si}"] = jnp.asarray(lin)
    return params


def _vgg_features(params: Dict[str, Any], x: jnp.ndarray) -> Sequence[jnp.ndarray]:
    """x: [n, 3, h, w] in [-1, 1] -> 5 feature maps (NCHW)."""
    x = (x - jnp.asarray(_LPIPS_SHIFT).reshape(1, 3, 1, 1)) \
        / jnp.asarray(_LPIPS_SCALE).reshape(1, 3, 1, 1)
    feats = []
    for si, (cout, n_convs) in enumerate(_VGG_STAGES):
        for ci in range(n_convs):
            p = params[f"vgg/{si}_{ci}"]
            dn = jax.lax.conv_dimension_numbers(
                x.shape, p["kernel"].shape, ("NCHW", "HWIO", "NCHW"))
            x = jax.lax.conv_general_dilated(
                x, p["kernel"], (1, 1), "SAME", dimension_numbers=dn)
            x = jax.nn.relu(x + p["bias"].reshape(1, -1, 1, 1))
        feats.append(x)
        if si < len(_VGG_STAGES) - 1:
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
    return feats


def lpips(params: Dict[str, Any], x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Perceptual distance. x, y: [n, 3, h, w] in [-1, 1] -> [n]."""
    fx = _vgg_features(params, x)
    fy = _vgg_features(params, y)
    total = 0.0
    for si, (a, b) in enumerate(zip(fx, fy)):
        # lpips.normalize_tensor: x / (||x||_c + eps)  (eps OUTSIDE the
        # sqrt — matches the package exactly, see test_lpips_golden)
        a = a / (jnp.sqrt(jnp.sum(a * a, axis=1, keepdims=True)) + 1e-10)
        b = b / (jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True)) + 1e-10)
        d = (a - b) ** 2
        w = params[f"lin/{si}"].reshape(1, -1, 1, 1)
        total = total + jnp.mean(jnp.sum(d * w, axis=1), axis=(1, 2))
    return total


def resize_bilinear_256(x: jnp.ndarray) -> jnp.ndarray:
    """F.interpolate(size=[256,256], mode='bilinear') equivalent (NCHW)."""
    n, c = x.shape[:2]
    return jax.image.resize(x, (n, c, 256, 256), method="bilinear")


# ---------------------------------------------------------------------------
# LossComputer / MetricComputer equivalents
# ---------------------------------------------------------------------------

def psnr(mse: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log10(mse)


class LossOutputs(NamedTuple):
    l2: jnp.ndarray          # [b]
    psnr: jnp.ndarray        # [b]
    lpips: jnp.ndarray       # [] (mean, as in reference :309)
    ssim: jnp.ndarray        # [b] (1 - ssim)
    pointsdist: jnp.ndarray  # [b]
    xyz: jnp.ndarray         # [] (mask-normalized sum)


def compute_losses(rendering: jnp.ndarray, target: jnp.ndarray,
                   ray_o: jnp.ndarray,
                   img_aligned_xyz: Optional[jnp.ndarray] = None,
                   gt_img_aligned_xyz: Optional[jnp.ndarray] = None,
                   masks: Optional[jnp.ndarray] = None,
                   lpips_params: Optional[Dict[str, Any]] = None,
                   use_lpips: bool = True,
                   lpips_resize: bool = True) -> LossOutputs:
    """LossComputer.forward (losses.py:261-369).

    rendering/target: [b, v, 3, h, w] in [0, 1]; ray_o: [b, v, 3, h, w];
    img_aligned_xyz/gt: [b, v, 3, h, w]; masks: [b, v, 1, h, w].
    """
    b, v, _, h, w = rendering.shape
    rend = rendering.reshape(b * v, 3, h, w).astype(jnp.float32)
    targ = target.reshape(b * v, 3, h, w).astype(jnp.float32)

    per_el = (rend - targ) ** 2
    l2 = per_el.reshape(b, -1).mean(axis=1)

    if img_aligned_xyz is not None and gt_img_aligned_xyz is not None:
        m = masks if masks is not None else jnp.ones_like(img_aligned_xyz[:, :, :1])
        num = jnp.sum(((img_aligned_xyz - gt_img_aligned_xyz) * m) ** 2)
        xyz = num / jnp.maximum(jnp.sum(m), 1.0)
    else:
        xyz = jnp.zeros(())

    if use_lpips and lpips_params is not None:
        r = resize_bilinear_256(rend) if lpips_resize else rend
        t_ = resize_bilinear_256(targ) if lpips_resize else targ
        lp = lpips(lpips_params, r * 2.0 - 1.0, t_ * 2.0 - 1.0).mean()
    else:
        lp = jnp.zeros(())

    ssim_loss = (1.0 - ssim(rend, targ)).reshape(b, v).mean(axis=1)

    # points-distance regularizer (losses.py:323-364)
    if img_aligned_xyz is not None:
        trgt_mean = jnp.linalg.norm(ray_o, axis=2, keepdims=True)
        dist = jnp.linalg.norm(img_aligned_xyz - ray_o, axis=2, keepdims=True)
        dd = jax.lax.stop_gradient(dist)
        d_mean = dd.mean(axis=(2, 3, 4), keepdims=True)
        d_std = dd.std(axis=(2, 3, 4), keepdims=True)
        trgt = (dd - d_mean) / (d_std + 1e-8) * 0.5 + trgt_mean
        pd = ((dist - trgt) ** 2).reshape(b, -1).mean(axis=1)
    else:
        pd = jnp.zeros((b,))

    return LossOutputs(l2=l2, psnr=psnr(l2), lpips=lp, ssim=ssim_loss,
                       pointsdist=pd, xyz=xyz)


def compute_metrics(target: jnp.ndarray, rendering: jnp.ndarray,
                    lpips_params: Optional[Dict[str, Any]] = None):
    """MetricComputer.forward (losses.py:467-473): [., 3, h, w] pairs ->
    dict(psnr [n], ssim [n], lpips [n])."""
    rend = rendering.reshape(-1, *rendering.shape[-3:]).astype(jnp.float32)
    targ = target.reshape(-1, *target.shape[-3:]).astype(jnp.float32)
    rend_c = jnp.clip(rend, 0, 1)
    targ_c = jnp.clip(targ, 0, 1)
    mse = ((rend_c - targ_c) ** 2).reshape(rend.shape[0], -1).mean(axis=1)
    # eval SSIM uses skimage sample-covariance semantics (losses.py:429-460);
    # the training loss keeps pytorch_msssim semantics (losses.py:294)
    out = {"psnr": psnr(mse),
           "ssim": ssim(targ_c, rend_c, use_sample_covariance=True)}
    if lpips_params is not None:
        out["lpips"] = lpips(lpips_params,
                             resize_bilinear_256(rend) * 2.0 - 1.0,
                             resize_bilinear_256(targ) * 2.0 - 1.0)
    return out
