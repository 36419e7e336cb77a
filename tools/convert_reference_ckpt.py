"""Convert a reference PyTorch checkpoint to this framework's param tree.

Maps the reference DGSDenoiser state_dict (denoiser.py /
denoiser_scene.py module names; checkpoints store them under `shape_model.`
for Lightning ckpts, pipline_obj.py:69-71, or `denoiser.` for stage-1 dumps,
denoiser.py:256-282) onto the flax tree produced by
open_diffusiongs_tpu.models.denoiser.DGSDenoiser:

  torch name                              flax path (kernel transposed)
  t_embedder.mlp.{0,2}.{weight,bias}  ->  t_embedder/mlp_{0,2}
  image_tokenizer.1.weight            ->  image_tokenizer/kernel
  gaussians_pos_embedding             ->  gaussians_pos_embedding
  transformer_input_layernorm.weight  ->  transformer_input_layernorm/scale
  transformer.{i}.attn.qkv.*          ->  transformer/layers/block/attn/
                                          {q,k,v}/* (fused thirds split;
                                          stacked on a leading layer axis)
  transformer.{i}.attn.proj.*         ->  transformer/layers/block/attn/proj
  transformer.{i}.mlp.fc{1,2}.*       ->  .../mlp/fc{1,2}
  transformer.{i}.adaLN_modulation.1.* -> .../adaLN_modulation_1
  upsampler|image_token_decoder.{layernorm.weight, linear.weight,
      adaLN_modulation.1.*}           ->  matching heads

Usage:
  python tools/convert_reference_ckpt.py --ckpt obj_ckpt_512.ckpt \
      --out shape_model_params.npz [--prefix shape_model.]

The output NPZ stores '/'-joined flax paths; load with
`load_converted_params` below (also used by the pipeline).
"""

from __future__ import annotations

import argparse
import re
from typing import Any, Dict

import numpy as np

_STATIC_MAP = {
    "t_embedder.mlp.0.weight": ("t_embedder/mlp_0/kernel", True),
    "t_embedder.mlp.0.bias": ("t_embedder/mlp_0/bias", False),
    "t_embedder.mlp.2.weight": ("t_embedder/mlp_2/kernel", True),
    "t_embedder.mlp.2.bias": ("t_embedder/mlp_2/bias", False),
    "image_tokenizer.1.weight": ("image_tokenizer/kernel", True),
    "gaussians_pos_embedding": ("gaussians_pos_embedding", False),
    "transformer_input_layernorm.weight":
        ("transformer_input_layernorm/scale", False),
    "upsampler.layernorm.weight": ("upsampler/layernorm/scale", False),
    "upsampler.linear.weight": ("upsampler/linear/kernel", True),
    "upsampler.adaLN_modulation.1.weight":
        ("upsampler/adaLN_modulation_1/kernel", True),
    "upsampler.adaLN_modulation.1.bias":
        ("upsampler/adaLN_modulation_1/bias", False),
    "image_token_decoder.layernorm.weight":
        ("image_token_decoder/layernorm/scale", False),
    "image_token_decoder.linear.weight":
        ("image_token_decoder/linear/kernel", True),
    "image_token_decoder.adaLN_modulation.1.weight":
        ("image_token_decoder/adaLN_modulation_1/kernel", True),
    "image_token_decoder.adaLN_modulation.1.bias":
        ("image_token_decoder/adaLN_modulation_1/bias", False),
}

_LAYER_RE = re.compile(r"^transformer\.(\d+)\.(.+)$")
# the torch fused qkv ([3d, d] weight / [3d] bias, q|k|v thirds) is split
# into the three separate column-parallel projections our Attention uses
# (models/transformer.py) — handled specially in convert_state_dict
_QKV_SPLIT = {"attn.qkv.weight": ("kernel", True),
              "attn.qkv.bias": ("bias", False)}
_LAYER_MAP = {
    "attn.proj.weight": ("attn/proj/kernel", True),
    "attn.proj.bias": ("attn/proj/bias", False),
    "mlp.fc1.weight": ("mlp/fc1/kernel", True),
    "mlp.fc1.bias": ("mlp/fc1/bias", False),
    "mlp.fc2.weight": ("mlp/fc2/kernel", True),
    "mlp.fc2.bias": ("mlp/fc2/bias", False),
    "adaLN_modulation.1.weight": ("adaLN_modulation_1/kernel", True),
    "adaLN_modulation.1.bias": ("adaLN_modulation_1/bias", False),
}


def convert_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """torch-name -> '/'-joined flax-path dict (transformer stacked)."""
    out: Dict[str, np.ndarray] = {}
    layer_buf: Dict[str, Dict[int, np.ndarray]] = {}
    for name, w in sd.items():
        w = np.asarray(w, np.float32)
        if name in _STATIC_MAP:
            path, transpose = _STATIC_MAP[name]
            if name == "gaussians_pos_embedding" and w.ndim == 3:
                w = w[0]  # scene variant stores [1, n, width] (denoiser_scene.py:227)
            out[path] = w.T if transpose else w
            continue
        m = _LAYER_RE.match(name)
        if m:
            i = int(m.group(1))
            sub = m.group(2)
            if sub in _QKV_SPLIT:
                leaf, transpose = _QKV_SPLIT[sub]
                thirds = np.split(w, 3, axis=0)    # torch rows: q | k | v
                for proj, ww in zip("qkv", thirds):
                    path = f"attn/{proj}/{leaf}"
                    layer_buf.setdefault(path, {})[i] = (
                        ww.T if transpose else ww)
                continue
            if sub not in _LAYER_MAP:
                raise KeyError(f"unknown transformer sub-key {sub!r}")
            path, transpose = _LAYER_MAP[sub]
            layer_buf.setdefault(path, {})[i] = w.T if transpose else w
            continue
        raise KeyError(f"unmapped reference key {name!r}")
    for path, by_layer in layer_buf.items():
        n = max(by_layer) + 1
        assert sorted(by_layer) == list(range(n)), f"missing layers for {path}"
        out[f"transformer/layers/block/{path}"] = np.stack(
            [by_layer[i] for i in range(n)])
    return out


def strip_prefix(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """Select + strip a prefix (shape_model. / denoiser.) like the reference
    loaders (pipline_obj.py:69-71, denoiser.py:263-267)."""
    out = {k[len(prefix):]: v for k, v in sd.items()
           if k.startswith(prefix) and "loss_computer" not in k}
    return out if out else dict(sd)


def load_converted_params(npz_path: str, params_like):
    """NPZ of '/'-joined paths -> params pytree shaped like `params_like`."""
    import jax

    data = dict(np.load(npz_path))

    def fill(path, leaf):
        key = "/".join(str(k.key) for k in path if str(k.key) != "params")
        if key not in data:
            raise KeyError(f"converted ckpt missing {key}")
        src = data[key]
        assert src.shape == leaf.shape, (key, src.shape, leaf.shape)
        return src.astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(fill, params_like)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--prefix", default="shape_model.")
    args = p.parse_args()
    try:
        import torch
        ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    except ImportError:
        # torch-free: published .ckpt files are torch.save ZIP archives —
        # the bundled reader handles them (utils/torch_load.py)
        from open_diffusiongs_tpu.utils.torch_load import torch_load
        ckpt = torch_load(args.ckpt)
    sd = ckpt.get("state_dict", ckpt.get("model", ckpt))
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    sd = strip_prefix(sd, args.prefix)
    out = convert_state_dict(sd)
    np.savez_compressed(args.out, **out)
    print(f"converted {len(sd)} tensors -> {args.out} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
