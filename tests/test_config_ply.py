"""Config system + PLY I/O tests."""

import os

import numpy as np
import pytest

from open_diffusiongs_tpu.ops.gaussians import NumpyGaussians
from open_diffusiongs_tpu.utils.config import (C_max, from_dotlist,
                                               load_config, merge, resolve)
from open_diffusiongs_tpu.utils.ply import (load_gaussians_ply,
                                            save_gaussians_ply)

YAML = """
exp_root_dir: "{root}"
name: "exp1"
tag: "${{rmspace:${{system.shape_model_type}}+lr${{system.optimizer_lr}},_}}"
seed: 0
use_timestamp: false
data_type: "Objaverse-datamodule"
data:
  batch_size: 4
  training_res: [256, 256]
system_type: "diffusion-gs-system"
system:
  shape_model_type: "diffusion-gs-model"
  optimizer_lr: 1.e-5
  loss:
    lambda_lpips: [150, 0., 0.5, 151]
trainer:
  precision: 16-mixed
"""


def test_load_config_resolvers(tmp_path):
    path = tmp_path / "cfg.yaml"
    path.write_text(YAML.format(root=tmp_path / "outputs"))
    cfg = load_config(str(path), cli_args=["data.batch_size=8", "seed=3"])
    assert cfg.seed == 3
    assert cfg.data["batch_size"] == 8
    assert cfg.data["training_res"] == [256, 256]
    # resolver chain: rmspace over interpolated values
    assert cfg.tag == "diffusion-gs-model+lr1e-05"
    assert cfg.trial_dir.endswith(os.path.join("exp1", cfg.trial_name))
    assert os.path.isdir(cfg.trial_dir)


def test_resolve_arithmetic():
    out = resolve({"a": 4, "b": "${mul:${a},3}", "c": "${idiv:${a},2}",
                   "d": "${add:1,2}"})
    assert out["b"] == 12 and out["c"] == 2 and out["d"] == 3


def test_merge_and_dotlist():
    base = {"a": {"x": 1, "y": 2}, "b": 3}
    over = from_dotlist(["a.x=10", "c.d=true"])
    out = merge(base, over)
    assert out == {"a": {"x": 10, "y": 2}, "b": 3, "c": {"d": True}}


def test_cmax():
    assert C_max(0.5) == 0.5
    assert C_max([150, 0.0, 1.0, 151]) == 1.0
    assert C_max([0.0, 2.0, 151]) == 2.0


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("name: x\ntag: t\nuse_timestamp: false\nbogus_key: 1\n")
    with pytest.raises(ValueError, match="bogus_key"):
        load_config(str(p))


def _random_np_gaussians(rng, n=50, sh_degree=0):
    shs = (sh_degree + 1) ** 2
    return NumpyGaussians(
        xyz=rng.normal(size=(n, 3)).astype(np.float32),
        features=rng.normal(size=(n, shs, 3)).astype(np.float32),
        scaling=rng.normal(-3, 1, (n, 3)).astype(np.float32),
        rotation=rng.normal(size=(n, 4)).astype(np.float32),
        opacity=rng.normal(size=(n, 1)).astype(np.float32),
    )


@pytest.mark.parametrize("sh_degree", [0, 1])
def test_ply_roundtrip(tmp_path, rng, sh_degree):
    g = _random_np_gaussians(rng, sh_degree=sh_degree)
    path = str(tmp_path / "g.ply")
    save_gaussians_ply(g, path)
    g2 = load_gaussians_ply(path, sh_degree=sh_degree)
    np.testing.assert_allclose(g2.xyz, g.xyz, rtol=1e-6)
    np.testing.assert_allclose(g2.features, g.features, rtol=1e-6)
    np.testing.assert_allclose(g2.scaling, g.scaling, rtol=1e-6)
    np.testing.assert_allclose(g2.rotation, g.rotation, rtol=1e-6)
    np.testing.assert_allclose(g2.opacity, g.opacity, rtol=1e-6)


def test_ply_header_layout(tmp_path, rng):
    g = _random_np_gaussians(rng)
    path = str(tmp_path / "g.ply")
    save_gaussians_ply(g, path)
    head = open(path, "rb").read(2500).decode("ascii", "ignore")
    assert "format binary_little_endian 1.0" in head
    for prop in ["property float x", "property uchar red",
                 "property float f_dc_0", "property float f_rest_44",
                 "property float opacity", "property float scale_2",
                 "property float rot_3"]:
        assert prop in head, prop


def test_filters_roundtrip(rng):
    g = _random_np_gaussians(rng, n=100)
    pruned = g.prune(opacity_thres=0.5)
    assert pruned.xyz.shape[0] < 100
    cropped = g.crop((-0.5, 0.5, -0.5, 0.5, -0.5, 0.5))
    assert (np.abs(cropped.xyz) <= 0.5 + 1e-6).all()
    both = g.apply_all_filters(opacity_thres=0.02,
                               crop_bbx=(-0.91, 0.91) * 3)
    assert both.xyz.shape[0] <= g.xyz.shape[0]
