"""Full weight-parity flow: synthetic torch-style ckpt -> converter ->
make_pretrained_dir -> DiffusionGSPipeline.from_pretrained -> generation."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

# interpret-mode Pallas kernels / subprocess / multi-second jits:
# fast sweep is `pytest -m "not slow"` (pyproject [tool.pytest.ini_options])
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CFG = """
exp_root_dir: "{out}"
name: "pre"
tag: "t"
use_timestamp: false
seed: 0
data_type: "Objaverse-datamodule"
data:
  training_res: [16, 16]
  gen_views: 2
system_type: "diffusion-gs-system"
system:
  num_inference_steps: 2
  use_lpips: false
  shape_model_type: "diffusion-gs-model"
  shape_model:
    width: 64
    in_channels: 9
    patch_size: 8
    n_gaussians: 2
    dim_heads: 32
    num_layers: 2
  noise_scheduler:
    num_train_timesteps: 50
  raster:
    max_tiles_per_gaussian: 16
    max_per_tile: 1056
    blend_chunk: 32
"""


def test_pretrained_roundtrip(tmp_path, rng):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from convert_reference_ckpt import convert_state_dict

    d, layers, p = 64, 2, 8

    def t(shape):
        return rng.normal(0, 0.02, size=shape).astype(np.float32)

    sd = {
        "t_embedder.mlp.0.weight": t((d, 256)),
        "t_embedder.mlp.0.bias": t((d,)),
        "t_embedder.mlp.2.weight": t((d, d)),
        "t_embedder.mlp.2.bias": t((d,)),
        "image_tokenizer.1.weight": t((d, 9 * p * p)),
        "gaussians_pos_embedding": t((2, d)),
        "transformer_input_layernorm.weight": np.ones((d,), np.float32),
        "upsampler.layernorm.weight": np.ones((d,), np.float32),
        "upsampler.linear.weight": t((14, d)),
        "upsampler.adaLN_modulation.1.weight": t((2 * d, d)),
        "upsampler.adaLN_modulation.1.bias": t((2 * d,)),
        "image_token_decoder.layernorm.weight": np.ones((d,), np.float32),
        "image_token_decoder.linear.weight": t((p * p * 14, d)),
        "image_token_decoder.adaLN_modulation.1.weight": t((2 * d, d)),
        "image_token_decoder.adaLN_modulation.1.bias": t((2 * d,)),
    }
    for i in range(layers):
        for k, shape in [("attn.qkv.weight", (3 * d, d)),
                         ("attn.qkv.bias", (3 * d,)),
                         ("attn.proj.weight", (d, d)),
                         ("attn.proj.bias", (d,)),
                         ("mlp.fc1.weight", (4 * d, d)),
                         ("mlp.fc1.bias", (4 * d,)),
                         ("mlp.fc2.weight", (d, 4 * d)),
                         ("mlp.fc2.bias", (d,)),
                         ("adaLN_modulation.1.weight", (6 * d, d)),
                         ("adaLN_modulation.1.bias", (6 * d,))]:
            sd[f"transformer.{i}.{k}"] = t(shape)
    npz = tmp_path / "w.npz"
    np.savez(npz, **convert_state_dict(sd))

    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(CFG.format(out=tmp_path / "outputs"))
    out_dir = tmp_path / "pretrained"

    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_tests"
    r = subprocess.run(
        [sys.executable, "tools/make_pretrained_dir.py", "--config",
         str(cfg_path), "--weights", str(npz), "--out", str(out_dir),
         "--platform", "cpu"], cwd=REPO, env=env, capture_output=True,
        text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out_dir / "config.yaml").exists()

    # load through the pipeline and generate
    import jax
    import jax.numpy as jnp
    from open_diffusiongs_tpu.pipeline import DiffusionGSPipeline
    pipe = DiffusionGSPipeline.from_pretrained(str(out_dir), bf16=False)
    # pipeline params must equal the converted weights (via EMA copy)
    leaf = np.asarray(
        pipe.params["params"]["transformer"]["layers"]["block"]["attn"]
        ["q"]["kernel"][1])
    np.testing.assert_allclose(
        leaf, np.split(sd["transformer.1.attn.qkv.weight"], 3, axis=0)[0].T,
        rtol=1e-6)
    img = (rng.uniform(0, 255, (20, 20, 4))).astype(np.uint8)
    img[..., 3] = 255
    from PIL import Image
    out = pipe(Image.fromarray(img, "RGBA"), resolution=16, n_views=2,
               opacity_thres=-1.0, crop_bbx=None, matting="border")
    assert out.renders.shape[0] == 2
    assert np.isfinite(out.renders).all()

    # serving-knob overrides apply on top of the saved config without
    # touching the parameter tree (same checkpoint loads)
    pipe_q = DiffusionGSPipeline.from_pretrained(
        str(out_dir), bf16=False,
        overrides=["system.shape_model.quant_int8=true"])
    assert pipe_q.system.model.quant_int8 is True
    np.testing.assert_array_equal(
        np.asarray(pipe_q.params["params"]["transformer"]["layers"]["block"]
                   ["attn"]["q"]["kernel"][1]), leaf)

