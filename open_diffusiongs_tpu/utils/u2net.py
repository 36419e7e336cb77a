"""U²-Net salient-object matting — the learned rembg path, TPU-native.

The reference removes photo backgrounds with ``rembg.remove`` (reference
pipline_obj.py:256-261), which runs the U²-Net salient-object detector
(Qin et al., "U²-Net: Going Deeper with Nested U-Structure for Salient
Object Detection", Pattern Recognition 2020) through onnxruntime.  This
module implements the published architecture from the paper spec as pure
functional JAX — nested RSU (ReSidual U) blocks of dilated conv+BN+ReLU
stages around max-pool/bilinear pyramids — in NHWC layout so XLA maps the
convs straight onto the MXU.

Weights: the shipped u2net.pth checkpoints need network egress, so (as
with LPIPS, systems/losses.py) the framework runs from a converted NPZ
when one is provided and falls back to the classical GrabCut matting
(utils/matting.py) otherwise.  ``tools/convert_u2net_weights.py`` maps a
torch state_dict to the NPZ layout; the conversion + forward semantics
are pinned against reference execution by tests/test_u2net_golden.py with
deterministic synthetic weights, so matting parity is falsifiable the
moment a real NPZ is produced offline.

Two published configurations are supported: ``U2NET_FULL`` (the 176 MB
``u2net`` checkpoint rembg defaults to) and ``U2NETP`` (the 4.7 MB
``u2netp`` lite variant).  ``u2net_alpha`` reproduces rembg's session
semantics: resize to 320x320, divide by the image max, ImageNet
normalize, forward, min-max rescale d0, resize back.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Architecture spec
# ---------------------------------------------------------------------------
#
# A RSU-L(in, mid, out) block is an L-level U-structure:
#   rebnconvin: REBNCONV(in -> out, dilation 1) at full resolution;
#   encoder rebnconv1..L-1 (out->mid, then mid->mid) with 2x2 ceil-mode
#   max-pools between them; rebnconv{L}: mid->mid at dilation 2 (no pool);
#   decoder rebnconv{L-1}d..1d on concat(skip, up) (2*mid -> mid, last one
#   2*mid -> out) with bilinear upsampling between levels;
#   output = rebnconv1d(..) + rebnconvin(..)  (the residual).
# RSU-4F is the dilated variant: no pooling, encoder dilations 1,2,4,8 and
# decoder dilations 4,2,1 at constant resolution.


@dataclass(frozen=True)
class RSUSpec:
    name: str      # torch module name, e.g. "stage1"
    height: int    # L; 0 marks the RSU-4F dilated variant
    in_ch: int
    mid_ch: int
    out_ch: int


@dataclass(frozen=True)
class U2NetSpec:
    """Encoder stages 1-6, decoder stages 5d-1d, side-output channels."""
    stages: tuple  # 11 RSUSpec: stage1..stage6, stage5d..stage1d
    out_ch: int = 1

    @property
    def side_channels(self) -> tuple:
        # side1..side6 read stage1d..stage5d outputs + stage6's
        dec = {s.name: s.out_ch for s in self.stages}
        return tuple(dec[n] for n in
                     ("stage1d", "stage2d", "stage3d", "stage4d",
                      "stage5d", "stage6"))


U2NET_FULL = U2NetSpec(stages=(
    RSUSpec("stage1", 7, 3, 32, 64),
    RSUSpec("stage2", 6, 64, 32, 128),
    RSUSpec("stage3", 5, 128, 64, 256),
    RSUSpec("stage4", 4, 256, 128, 512),
    RSUSpec("stage5", 0, 512, 256, 512),
    RSUSpec("stage6", 0, 512, 256, 512),
    RSUSpec("stage5d", 0, 1024, 256, 512),
    RSUSpec("stage4d", 4, 1024, 128, 256),
    RSUSpec("stage3d", 5, 512, 64, 128),
    RSUSpec("stage2d", 6, 256, 32, 64),
    RSUSpec("stage1d", 7, 128, 16, 64),
))

U2NETP = U2NetSpec(stages=(
    RSUSpec("stage1", 7, 3, 16, 64),
    RSUSpec("stage2", 6, 64, 16, 64),
    RSUSpec("stage3", 5, 64, 16, 64),
    RSUSpec("stage4", 4, 64, 16, 64),
    RSUSpec("stage5", 0, 64, 16, 64),
    RSUSpec("stage6", 0, 64, 16, 64),
    RSUSpec("stage5d", 0, 128, 16, 64),
    RSUSpec("stage4d", 4, 128, 16, 64),
    RSUSpec("stage3d", 5, 128, 16, 64),
    RSUSpec("stage2d", 6, 128, 16, 64),
    RSUSpec("stage1d", 7, 128, 16, 64),
))

SPECS = {"u2net": U2NET_FULL, "u2netp": U2NETP}

_BN_EPS = 1e-5


def _rebnconv_names(spec: RSUSpec):
    """REBNCONV sub-module names + (cin, cout, dilation) for one RSU."""
    n, m, o, h = spec.name, spec.mid_ch, spec.out_ch, spec.height
    out = [("rebnconvin", spec.in_ch, o, 1)]
    if h == 0:  # RSU-4F
        dil = (1, 2, 4, 8)
        cin = o
        for i, d in enumerate(dil, 1):
            out.append((f"rebnconv{i}", cin, m, d))
            cin = m
        for i, d in zip((3, 2), (4, 2)):
            out.append((f"rebnconv{i}d", 2 * m, m, d))
        out.append(("rebnconv1d", 2 * m, o, 1))
        return out
    cin = o
    for i in range(1, h):
        out.append((f"rebnconv{i}", cin, m, 1))
        cin = m
    out.append((f"rebnconv{h}", m, m, 2))
    for i in range(h - 1, 1, -1):
        out.append((f"rebnconv{i}d", 2 * m, m, 1))
    out.append(("rebnconv1d", 2 * m, o, 1))
    return out


def param_shapes(spec: U2NetSpec) -> dict:
    """NPZ key -> shape for every parameter (kernels in HWIO layout)."""
    shapes = {}

    def conv(path, cin, cout, k):
        shapes[f"{path}.kernel"] = (k, k, cin, cout)
        shapes[f"{path}.bias"] = (cout,)

    def bn(path, c):
        for f in ("scale", "bias", "mean", "var"):
            shapes[f"{path}.{f}"] = (c,)

    for st in spec.stages:
        for name, cin, cout, _ in _rebnconv_names(st):
            conv(f"{st.name}.{name}.conv_s1", cin, cout, 3)
            bn(f"{st.name}.{name}.bn_s1", cout)
    for i, c in enumerate(spec.side_channels, 1):
        conv(f"side{i}", c, spec.out_ch, 3)
    conv("outconv", 6 * spec.out_ch, spec.out_ch, 1)
    return shapes


# ---------------------------------------------------------------------------
# Forward (pure functional, NHWC)
# ---------------------------------------------------------------------------


def _rebnconv(params, path, x, dilation):
    w = params[f"{path}.conv_s1.kernel"]
    b = params[f"{path}.conv_s1.bias"]
    d = dilation
    pad = d * (w.shape[0] // 2)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(pad, pad), (pad, pad)],
        rhs_dilation=(d, d), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + b
    g = params[f"{path}.bn_s1.scale"]
    be = params[f"{path}.bn_s1.bias"]
    mu = params[f"{path}.bn_s1.mean"]
    var = params[f"{path}.bn_s1.var"]
    y = (y - mu) * (g * jax.lax.rsqrt(var + _BN_EPS)) + be
    return jax.nn.relu(y)


def _maxpool2_ceil(x):
    """2x2 stride-2 max-pool with torch ceil_mode=True semantics."""
    _, h, w, _ = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=-jnp.inf)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def _upsample_like(src, tar):
    """Bilinear resize of src to tar's spatial dims (align_corners=False —
    jax.image half-pixel centers match torch F.interpolate's default)."""
    b, _, _, c = src.shape
    return jax.image.resize(src, (b, tar.shape[1], tar.shape[2], c),
                            method="bilinear")


def _rsu(params, spec: RSUSpec, x):
    p = functools.partial(_rebnconv, params)
    n, h = spec.name, spec.height
    hxin = p(f"{n}.rebnconvin", x, 1)
    if h == 0:  # RSU-4F: constant resolution, dilation pyramid
        hx1 = p(f"{n}.rebnconv1", hxin, 1)
        hx2 = p(f"{n}.rebnconv2", hx1, 2)
        hx3 = p(f"{n}.rebnconv3", hx2, 4)
        hx4 = p(f"{n}.rebnconv4", hx3, 8)
        hx3d = p(f"{n}.rebnconv3d", jnp.concatenate([hx4, hx3], -1), 4)
        hx2d = p(f"{n}.rebnconv2d", jnp.concatenate([hx3d, hx2], -1), 2)
        hx1d = p(f"{n}.rebnconv1d", jnp.concatenate([hx2d, hx1], -1), 1)
        return hx1d + hxin
    enc = []
    hx = hxin
    for i in range(1, h):
        hx = p(f"{n}.rebnconv{i}", hx, 1)
        enc.append(hx)
        if i < h - 1:
            hx = _maxpool2_ceil(hx)
    hx = p(f"{n}.rebnconv{h}", hx, 2)          # bottom, dilated, no pool
    for i in range(h - 1, 0, -1):
        skip = enc[i - 1]
        hx = p(f"{n}.rebnconv{i}d", jnp.concatenate([hx, skip], -1),
               1)
        if i > 1:
            hx = _upsample_like(hx, enc[i - 2])
    return hx + hxin


def _side(params, idx, x):
    w = params[f"side{idx}.kernel"]
    b = params[f"side{idx}.bias"]
    pad = w.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


def u2net_forward(params: dict, x: jnp.ndarray,
                  spec: U2NetSpec = U2NET_FULL):
    """x: [b, h, w, 3] normalized input -> tuple of 7 sigmoid maps
    (d0 fused, d1..d6 side outputs), each [b, h, w, out_ch].

    Mirrors the published U2NET.forward graph: 6 encoder stages with
    inter-stage pools, bilinear-up decoder over concat skips, 6 side
    heads upsampled to full resolution, 1x1 fusion conv."""
    st = {s.name: s for s in spec.stages}
    hx1 = _rsu(params, st["stage1"], x)
    hx2 = _rsu(params, st["stage2"], _maxpool2_ceil(hx1))
    hx3 = _rsu(params, st["stage3"], _maxpool2_ceil(hx2))
    hx4 = _rsu(params, st["stage4"], _maxpool2_ceil(hx3))
    hx5 = _rsu(params, st["stage5"], _maxpool2_ceil(hx4))
    hx6 = _rsu(params, st["stage6"], _maxpool2_ceil(hx5))
    hx6up = _upsample_like(hx6, hx5)

    hx5d = _rsu(params, st["stage5d"], jnp.concatenate([hx6up, hx5], -1))
    hx4d = _rsu(params, st["stage4d"],
                jnp.concatenate([_upsample_like(hx5d, hx4), hx4], -1))
    hx3d = _rsu(params, st["stage3d"],
                jnp.concatenate([_upsample_like(hx4d, hx3), hx3], -1))
    hx2d = _rsu(params, st["stage2d"],
                jnp.concatenate([_upsample_like(hx3d, hx2), hx2], -1))
    hx1d = _rsu(params, st["stage1d"],
                jnp.concatenate([_upsample_like(hx2d, hx1), hx1], -1))

    d1 = _side(params, 1, hx1d)
    d2 = _upsample_like(_side(params, 2, hx2d), d1)
    d3 = _upsample_like(_side(params, 3, hx3d), d1)
    d4 = _upsample_like(_side(params, 4, hx4d), d1)
    d5 = _upsample_like(_side(params, 5, hx5d), d1)
    d6 = _upsample_like(_side(params, 6, hx6), d1)
    d0 = _side_out(params, jnp.concatenate([d1, d2, d3, d4, d5, d6], -1))
    return tuple(jax.nn.sigmoid(d) for d in (d0, d1, d2, d3, d4, d5, d6))


def _side_out(params, x):
    return jax.lax.conv_general_dilated(
        x, params["outconv.kernel"], (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + params["outconv.bias"]


# ---------------------------------------------------------------------------
# Weights IO
# ---------------------------------------------------------------------------


def load_params(path: str, spec: U2NetSpec = U2NET_FULL) -> dict:
    """Load a converted NPZ (tools/convert_u2net_weights.py) and validate
    every expected key/shape is present."""
    with np.load(path) as z:
        params = {k: np.asarray(z[k], np.float32) for k in z.files}
    want = param_shapes(spec)
    missing = sorted(set(want) - set(params))
    if missing:
        raise ValueError(f"u2net NPZ missing {len(missing)} keys, "
                         f"first: {missing[:4]}")
    for k, s in want.items():
        if tuple(params[k].shape) != tuple(s):
            raise ValueError(f"u2net NPZ key {k}: shape {params[k].shape}"
                             f" != expected {s}")
    return params


def default_weights_path() -> str:
    return os.environ.get(
        "U2NET_NPZ",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "open_diffusiongs_tpu", "u2net.npz"))


_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


@functools.partial(jax.jit, static_argnames=("spec_name",))
def _forward_d0(params, x, spec_name: str):
    return u2net_forward(params, x, SPECS[spec_name])[0]


def u2net_alpha(params: dict, rgb: np.ndarray, *,
                spec: U2NetSpec = U2NET_FULL,
                size: int = 320) -> np.ndarray:
    """[h, w, 3] uint8 -> float32 alpha in [0, 1], rembg session semantics.

    rembg's U2netSession: LANCZOS-resize to 320x320, scale by the image
    max, ImageNet mean/std normalize, run the net, min-max rescale the
    fused d0 map, LANCZOS-resize back to the input size."""
    from PIL import Image

    h0, w0 = rgb.shape[:2]
    im = Image.fromarray(rgb).convert("RGB").resize((size, size),
                                                    Image.LANCZOS)
    x = np.asarray(im, np.float32)
    x = x / max(float(x.max()), 1e-6)
    x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
    spec_name = "u2net" if spec is U2NET_FULL else "u2netp"
    d0 = np.asarray(_forward_d0(params, x[None], spec_name))[0, :, :, 0]
    d0 = (d0 - d0.min()) / max(float(d0.max() - d0.min()), 1e-8)
    out = Image.fromarray((d0 * 255).astype(np.uint8)).resize(
        (w0, h0), Image.LANCZOS)
    return np.asarray(out, np.float32) / 255.0


def synth_params(spec: U2NetSpec, seed: int = 2025) -> dict:
    """Deterministic synthetic parameters in the NPZ layout (He-init
    kernels, randomized BN stats) — shared by the golden generator and
    tests/test_u2net_golden.py so the fixture stores no weights."""
    rng = np.random.default_rng(seed)
    out = {}
    for k, shape in param_shapes(spec).items():
        if k.endswith(".kernel"):
            kh, kw, cin, _ = shape
            out[k] = rng.normal(
                0, np.sqrt(2.0 / (kh * kw * cin)), shape).astype(np.float32)
        elif k.endswith(".scale") or k.endswith(".var"):
            out[k] = rng.uniform(0.5, 1.5, shape).astype(np.float32)
        else:  # conv bias / bn bias / bn mean
            out[k] = rng.normal(0, 0.1, shape).astype(np.float32)
    return out
