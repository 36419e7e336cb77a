"""Cheap surface guards: launcher scripts parse, demo-image generator
works, packaging metadata stays valid."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_launcher_scripts_parse():
    sdir = os.path.join(REPO, "scripts")
    names = sorted(os.listdir(sdir))
    # the full reference launcher set (scripts/ in the reference repo)
    for want in ("train_obj_stage1.sh", "train_obj_stage2.sh",
                 "train_scene_stage1.sh", "train_scene_stage2.sh",
                 "eval.sh", "eval_512.sh", "debug.sh", "debug_eval.sh",
                 "run.sh", "cal_metrics.sh"):
        assert want in names, want
    for n in names:
        if n.endswith(".sh"):
            r = subprocess.run(["bash", "-n", os.path.join(sdir, n)],
                               capture_output=True, text=True)
            assert r.returncode == 0, (n, r.stderr)


def test_make_test_cases(tmp_path):
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "extra_files",
                                      "make_test_cases.py"),
         "--out", str(tmp_path), "--res", "64"],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    import numpy as np
    from PIL import Image
    for n in ("sphere", "torus", "capsule"):
        a = np.asarray(Image.open(tmp_path / f"{n}.png"))
        assert a.shape == (64, 64, 3)
        fg = (a < 240).any(-1).mean()
        assert 0.1 < fg < 0.7, (n, fg)       # subject present, border clear
        border = np.concatenate([a[0], a[-1], a[:, 0], a[:, -1]])
        assert border.min() > 240, n         # studio convention


def test_pyproject_parses():
    import tomllib
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    assert meta["project"]["name"] == "open-diffusiongs-tpu"
    assert any(d.startswith("jax") for d in meta["project"]["dependencies"])
