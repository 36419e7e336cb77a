"""tools/make_synthetic_re10k.py end-to-end: the generated tree must load
through RE10KDataset with the reference conventions intact (the scene
convergence run's data path, docs/CONVERGENCE.md).  Reference conventions:
data/base_scene.py:41-72 (full_list of per-scene JSONs), :122-156 (pose
normalization to mean camera + scale 1.35)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_generator_tree_loads(tmp_path):
    out = tmp_path / "synth"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/make_synthetic_re10k.py"),
         "--cpu", "--out", str(out), "--scenes", "1", "--frames", "5",
         "--res", "64", "--wall-step", "0.5", "--lobes", "4"],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr

    full_list = out / "full_list.txt"
    meta = json.loads(
        open(full_list.read_text().splitlines()[0].strip()).read())
    assert meta["scene_name"] == "synthscene000"
    assert len(meta["frames"]) == 5
    # w2c really is world->camera: invertible, orthonormal rotation
    w2c = np.asarray(meta["frames"][0]["w2c"])
    R = w2c[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import open_diffusiongs_tpu as pkg
    pkg._register_builtins()
    from open_diffusiongs_tpu.data.re10k import RE10KConfig, RE10KDataset
    cfg = RE10KConfig(local_dir=str(full_list), training_res=[64, 64],
                      sel_views=3, sel_views_train=1, batch_size=1)
    ds = RE10KDataset(cfg, split="train", seed=0)
    s = ds[0]
    assert s["rgbs"].shape == (4, 3, 64, 64)
    assert s["rgbs_input"].shape == (4, 3, 64, 64)
    # frames carry real structure, not a flat background
    assert float(s["rgbs"].std()) > 0.05
    # pose normalization: translations scaled to max |t| = 1/1.35
    assert abs(float(np.abs(s["c2ws"][:, :3, 3]).max()) - 1 / 1.35) < 1e-3
