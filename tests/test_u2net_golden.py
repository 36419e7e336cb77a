"""U²-Net converter + forward parity against reference-spec torch execution.

tests/golden/reference_u2net.npz was produced by tools/make_u2net_golden.py:
a torch net written explicitly to the published U²-Net architecture (the
model rembg runs for the reference's background removal,
pipline_obj.py:256-261) executed in eval mode on fixed inputs with
synthetic weights drawn deterministically by utils/u2net.synth_params.

This test regenerates the identical arrays from the same seed, maps them
torch-layout -> NPZ through tools/convert_u2net_weights.convert_state_dict
(the exact code path a real u2net.pth will take), and asserts the jax
forward reproduces all seven recorded sigmoid maps — pinning the converter
layout (kernel transpose, BN renames) and the forward semantics (dilated
conv padding, ceil-mode pooling, align_corners=False bilinear upsampling,
RSU residuals, side-head fusion).  The 88² input drives odd spatial dims
through the RSU interiors, exercising the ceil-mode path.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from open_diffusiongs_tpu.utils import u2net  # noqa: E402

# interpret-mode Pallas kernels / subprocess / multi-second jits:
# fast sweep is `pytest -m "not slow"` (pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.slow

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "golden", "reference_u2net.npz")


def _torch_layout_sd(params):
    """NPZ layout -> torch-naming numpy state dict (what a checkpoint
    holds); mirrors tools/make_u2net_golden.npz_to_torch_sd without torch."""
    sd = {}
    for k, v in params.items():
        if ".bn_s1." in k:
            mod, field = k.rsplit(".", 1)
            name = {"scale": "weight", "bias": "bias",
                    "mean": "running_mean", "var": "running_var"}[field]
            sd[f"{mod}.{name}"] = v
            if field == "var":
                sd[f"{mod}.num_batches_tracked"] = np.asarray(7)
        elif k.endswith(".kernel"):
            sd[k[:-len(".kernel")] + ".weight"] = np.transpose(
                v, (3, 2, 0, 1)).copy()
        else:
            sd[k] = v
    return sd


@pytest.fixture(scope="module")
def converted_params():
    from convert_u2net_weights import convert_state_dict
    ref = u2net.synth_params(u2net.U2NETP, seed=2025)
    out = convert_state_dict(_torch_layout_sd(ref))
    # the converter must invert the torch layout exactly
    assert set(out) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(out[k], ref[k], err_msg=k)
    return out


@pytest.mark.parametrize("spec_name,size", [
    ("u2netp", 160),
    ("u2netp", 88),    # odd interior dims: exercises ceil-mode pooling
    ("u2net", 64),     # FULL config: per-stage channel widths all differ
])
def test_forward_matches_reference_execution(converted_params, spec_name,
                                             size):
    from convert_u2net_weights import convert_state_dict
    fx = np.load(GOLDEN)
    spec = u2net.SPECS[spec_name]
    if spec_name == "u2netp":
        params = converted_params
    else:
        params = convert_state_dict(_torch_layout_sd(
            u2net.synth_params(spec, seed=2025)))
    x = fx[f"{spec_name}_{size}/x"]                  # [1, 3, h, w] torch
    ds = u2net.u2net_forward(params, np.transpose(x, (0, 2, 3, 1)),
                             spec=spec)
    assert len(ds) == 7
    for i, d in enumerate(ds):
        want = np.transpose(fx[f"{spec_name}_{size}/d{i}"], (0, 2, 3, 1))
        err = np.abs(np.asarray(d) - want)
        # f32 accumulation over ~50 conv+BN layers: tight on average,
        # loose-ish pointwise (measured max 6.8e-4 on this fixture)
        assert float(err.max()) < 1.5e-3, f"d{i} {spec_name}@{size}: " \
            f"{err.max()}"
        assert float(err.mean()) < 1e-5, f"d{i} {spec_name}@{size}: " \
            f"{err.mean()}"


def test_param_shapes_full_and_lite():
    n_full = sum(int(np.prod(s))
                 for s in u2net.param_shapes(u2net.U2NET_FULL).values())
    n_lite = sum(int(np.prod(s))
                 for s in u2net.param_shapes(u2net.U2NETP).values())
    # published sizes: u2net 44.0M params, u2netp 1.13M params
    assert 42e6 < n_full < 46e6, n_full
    assert 1.0e6 < n_lite < 1.3e6, n_lite


def test_load_params_validates(tmp_path):
    params = u2net.synth_params(u2net.U2NETP, seed=1)
    path = str(tmp_path / "u2netp.npz")
    np.savez(path, **params)
    loaded = u2net.load_params(path, u2net.U2NETP)
    assert set(loaded) == set(params)
    bad = dict(params)
    bad.pop("outconv.kernel")
    np.savez(str(tmp_path / "bad.npz"), **bad)
    with pytest.raises(ValueError, match="missing"):
        u2net.load_params(str(tmp_path / "bad.npz"), u2net.U2NETP)


def test_u2net_alpha_end_to_end(converted_params):
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 255, (70, 90, 3), dtype=np.uint8)
    alpha = u2net.u2net_alpha(converted_params, rgb, spec=u2net.U2NETP,
                              size=96)
    assert alpha.shape == (70, 90)
    assert alpha.dtype == np.float32
    assert float(alpha.min()) >= 0.0 and float(alpha.max()) <= 1.0
    # min-max rescale guarantees the full range is hit at the 96² scale
    assert float(np.ptp(alpha)) > 0.5
