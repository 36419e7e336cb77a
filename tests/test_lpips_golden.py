"""LPIPS converter + forward parity against reference-spec torch execution.

tests/golden/reference_lpips.npz was produced by tools/make_lpips_golden.py:
a torch net built to the lpips-package spec (the module the reference uses
for its training loss and the published LPIPS=0.257 target,
diffusionGS/utils/losses.py:277-300) run on a fixed image pair with
synthetic weights drawn deterministically from np.random.default_rng(2024).

This test regenerates the identical torch-layout arrays from the same seed,
maps them through tools/convert_lpips_weights.convert_arrays (the exact
code path real lpips weights will take), loads them via
losses.lpips_init_params, and asserts systems.losses.lpips reproduces the
recorded per-stage and total values — pinning the converter layout
(kernel transpose, head clamp/squeeze) and the forward semantics
(ScalingLayer, stage taps, unit-normalization, spatial-mean heads).
"""

import os
import sys
import tempfile

import jax.numpy as jnp
import numpy as np
import pytest

from open_diffusiongs_tpu.systems import losses

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden", "reference_lpips.npz")

VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


def _weights(seed: int = 2024):
    """Identical to tools/make_lpips_golden.synth_weights — keep in sync."""
    rng = np.random.default_rng(seed)
    conv_w, conv_b, lin_w = [], [], []
    cin = 3
    for cout, n_convs in VGG_STAGES:
        ws, bs = [], []
        for _ in range(n_convs):
            ws.append(rng.normal(0, np.sqrt(2.0 / (9 * cin)),
                                 (cout, cin, 3, 3)).astype(np.float32))
            bs.append(rng.normal(0, 0.05, (cout,)).astype(np.float32))
            cin = cout
        conv_w.append(ws)
        conv_b.append(bs)
        lin_w.append(np.abs(rng.normal(0, 0.05, (1, cout, 1, 1))
                            ).astype(np.float32))
    return conv_w, conv_b, lin_w


@pytest.fixture(scope="module")
def converted_npz(tmp_path_factory):
    from convert_lpips_weights import convert_arrays
    fx = dict(np.load(GOLDEN))
    out = convert_arrays(*_weights())
    path = str(tmp_path_factory.mktemp("lpips") / "lpips_vgg.npz")
    np.savez(path, **out)
    return path, fx


def test_converted_lpips_reproduces_reference(converted_npz):
    path, fx = converted_npz
    params = losses.lpips_init_params(npz_path=path)
    assert params["pretrained"] is True
    val = losses.lpips(params, jnp.asarray(fx["x"]), jnp.asarray(fx["y"]))
    np.testing.assert_allclose(np.asarray(val), fx["lpips"],
                               rtol=2e-4, atol=1e-6)


def test_converter_layout_shapes(converted_npz):
    path, _ = converted_npz
    data = dict(np.load(path))
    # spot-check the transpose: stage 0 conv 0 is [3, 3, 3, 64] HWIO
    assert data["vgg/0_0/kernel"].shape == (3, 3, 3, 64)
    assert data["vgg/4_2/kernel"].shape == (3, 3, 512, 512)
    for si, (cout, _) in enumerate(VGG_STAGES):
        lin = data[f"lin/{si}/kernel"]
        assert lin.shape == (cout,)
        assert (lin >= 0).all()
    # the transpose round-trips: HWIO kernel back to torch layout equals
    # the regenerated source array
    conv_w, _, _ = _weights()
    np.testing.assert_array_equal(
        data["vgg/1_1/kernel"].transpose(3, 2, 0, 1), conv_w[1][1])
