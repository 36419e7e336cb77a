"""Converter / aux-scheduler / knn / process_data tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_knn_matches_bruteforce(rng):
    from open_diffusiongs_tpu.ops.knn import knn_mean_sq_dist
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    got = np.asarray(knn_mean_sq_dist(jnp.asarray(pts), k=3, block=128))
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    expect = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-5)


def test_ddim_scheduler_roundtrip(rng):
    from open_diffusiongs_tpu.diffusion.ddim import DDIMScheduler
    s = DDIMScheduler(num_train_timesteps=100, prediction_type="sample")
    s.set_timesteps(10)
    assert len(s.timesteps) == 10
    x0 = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
    t = jnp.asarray([50, 90])
    xt = s.add_noise(x0, noise, t)
    acp = np.asarray(s.alphas_cumprod)
    expect = (np.sqrt(acp[[50, 90]])[:, None] * np.asarray(x0)
              + np.sqrt(1 - acp[[50, 90]])[:, None] * np.asarray(noise))
    np.testing.assert_allclose(np.asarray(xt), expect, rtol=1e-5)
    # deterministic sampling with perfect x0 predictor converges to x0
    x = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
    for t_i in np.asarray(s.timesteps):
        x, pred = s.step(jnp.clip(x0, -1, 1), int(t_i), x)
    np.testing.assert_allclose(np.asarray(x), np.clip(np.asarray(x0), -1, 1),
                               atol=1e-4)


def test_rf_scheduler(rng):
    from open_diffusiongs_tpu.diffusion.rf import (
        FlowMatchEulerDiscreteScheduler, sample_logit_normal)
    s = FlowMatchEulerDiscreteScheduler(num_train_timesteps=1000)
    s.set_timesteps(8)
    assert len(s.sigmas) == 9
    x0 = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))
    eps = jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32))
    # Euler steps with exact velocity (eps - x0) recover x0 from pure noise
    x = eps
    for i in range(8):
        x = s.step(eps - x0, i, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-5)
    t = sample_logit_normal(jax.random.PRNGKey(0), (1000,))
    t = np.asarray(t)
    assert (t > 0).all() and (t < 1).all()
    assert 0.3 < t.mean() < 0.7


@pytest.mark.slow
def test_ckpt_converter_roundtrip(rng):
    """Synthetic reference-shaped state_dict -> flax params; check the
    attention weights land where matmul semantics agree."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from convert_reference_ckpt import (convert_state_dict,
                                        load_converted_params, strip_prefix)
    from open_diffusiongs_tpu.models.denoiser import DGSDenoiser

    d, layers, p = 64, 2, 8
    gs_ch = 14

    def t(shape):
        return rng.normal(size=shape).astype(np.float32)

    sd = {
        "t_embedder.mlp.0.weight": t((d, 256)),
        "t_embedder.mlp.0.bias": t((d,)),
        "t_embedder.mlp.2.weight": t((d, d)),
        "t_embedder.mlp.2.bias": t((d,)),
        "image_tokenizer.1.weight": t((d, 9 * p * p)),
        "gaussians_pos_embedding": t((2, d)),
        "transformer_input_layernorm.weight": t((d,)),
        "upsampler.layernorm.weight": t((d,)),
        "upsampler.linear.weight": t((gs_ch, d)),
        "upsampler.adaLN_modulation.1.weight": t((2 * d, d)),
        "upsampler.adaLN_modulation.1.bias": t((2 * d,)),
        "image_token_decoder.layernorm.weight": t((d,)),
        "image_token_decoder.linear.weight": t((p * p * gs_ch, d)),
        "image_token_decoder.adaLN_modulation.1.weight": t((2 * d, d)),
        "image_token_decoder.adaLN_modulation.1.bias": t((2 * d,)),
    }
    for i in range(layers):
        sd.update({
            f"transformer.{i}.attn.qkv.weight": t((3 * d, d)),
            f"transformer.{i}.attn.qkv.bias": t((3 * d,)),
            f"transformer.{i}.attn.proj.weight": t((d, d)),
            f"transformer.{i}.attn.proj.bias": t((d,)),
            f"transformer.{i}.mlp.fc1.weight": t((4 * d, d)),
            f"transformer.{i}.mlp.fc1.bias": t((4 * d,)),
            f"transformer.{i}.mlp.fc2.weight": t((d, 4 * d)),
            f"transformer.{i}.mlp.fc2.bias": t((d,)),
            f"transformer.{i}.adaLN_modulation.1.weight": t((6 * d, d)),
            f"transformer.{i}.adaLN_modulation.1.bias": t((6 * d,)),
        })
    prefixed = {"shape_model." + k: v for k, v in sd.items()}
    prefixed["shape_model.loss_computer.junk"] = t((1,))
    stripped = strip_prefix(prefixed, "shape_model.")
    assert "loss_computer.junk" not in stripped
    converted = convert_state_dict(stripped)

    npz = "/tmp/test_converted.npz"
    np.savez(npz, **converted)

    model = DGSDenoiser(width=d, patch_size=p, dim_heads=32,
                        num_layers=layers, remat=False)
    imgs = jnp.asarray(rng.uniform(size=(1, 2, 3, 16, 16)), jnp.float32)
    rays = jnp.asarray(rng.normal(size=(1, 2, 3, 16, 16)), jnp.float32)
    rays = rays / jnp.linalg.norm(rays, axis=2, keepdims=True)
    params = model.init(jax.random.PRNGKey(0), imgs, rays, rays,
                        jnp.asarray([3]))
    loaded = load_converted_params(npz, params)
    # kernels transposed correctly: flax kernel [in, out] == torch weight.T
    attn = loaded["params"]["transformer"]["layers"]["block"]["attn"]
    fused = sd["transformer.1.attn.qkv.weight"]      # [3d, d], q | k | v rows
    for j, proj in enumerate("qkv"):
        got = np.asarray(attn[proj]["kernel"][1])
        np.testing.assert_allclose(
            got, np.split(fused, 3, axis=0)[j].T, rtol=1e-6)
    # loaded params run
    g, _ = model.apply(loaded, imgs, rays, rays, jnp.asarray([3]))
    assert np.isfinite(np.asarray(g.xyz)).all()


def test_process_data_roundtrip(tmp_path, rng):
    """Synthetic pixelSplat .torch chunk -> PNGs + metadata + full list,
    loadable by RE10KDataset."""
    torch = pytest.importorskip("torch")
    import io as _io
    from PIL import Image
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from process_data import generate_full_list, process_torch_file

    scenes = []
    for s in range(2):
        imgs = []
        cams = []
        for i in range(6):
            arr = (rng.uniform(0, 255, (36, 64, 3))).astype(np.uint8)
            buf = _io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            imgs.append(torch.frombuffer(
                bytearray(buf.getvalue()), dtype=torch.uint8).clone())
            w2c = np.eye(4)[:3].reshape(-1)
            cam = np.concatenate([[0.8, 0.9, 0.5, 0.5, 0, 0], w2c])
            cams.append(cam)
        scenes.append({"key": f"scene{s}", "images": imgs,
                       "cameras": torch.tensor(np.stack(cams),
                                               dtype=torch.float64)})
    chunk_path = tmp_path / "000.torch"
    torch.save(scenes, str(chunk_path))

    out_dir = tmp_path / "out"
    assert process_torch_file(str(chunk_path), str(out_dir))
    meta = json.load(open(out_dir / "metadata" / "scene0.json"))
    assert meta["scene_name"] == "scene0"
    assert len(meta["frames"]) == 6
    f0 = meta["frames"][0]
    np.testing.assert_allclose(f0["fxfycxcy"],
                               [0.8 * 64, 0.9 * 36, 0.5 * 64, 0.5 * 36])
    assert os.path.exists(f0["image_path"])
    full = generate_full_list(str(out_dir / "metadata"), str(out_dir))
    lines = open(full).read().splitlines()
    assert len(lines) == 2

    # feed into RE10KDataset
    from open_diffusiongs_tpu.data.re10k import RE10KConfig, RE10KDataset
    cfg = RE10KConfig(local_dir=full, training_res=[16, 16], sel_views=2,
                      sel_views_train=2, patch_size=8)
    ds = RE10KDataset(cfg, "train")
    s = ds[0]
    assert s["rgbs"].shape == (4, 3, 16, 16)
    assert s["rgbs_input"].shape == (3, 3, 16, 16)
