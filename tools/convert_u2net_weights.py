"""Convert a U²-Net torch checkpoint (u2net.pth / u2netp.pth — the nets
rembg runs for the reference's background removal, pipline_obj.py:256-261)
to the NPZ layout used by open_diffusiongs_tpu.utils.u2net.

Run where the checkpoint is available (this zero-egress image cannot
download it; the framework falls back to GrabCut matting until the NPZ is
provided):

  python tools/convert_u2net_weights.py --ckpt u2net.pth --out u2net.npz
  python tools/convert_u2net_weights.py --ckpt u2netp.pth --spec u2netp \
      --out u2netp.npz

NPZ keys mirror the torch module paths with kernels transposed to HWIO
([kh, kw, cin, cout]) and BatchNorm fields renamed
weight/bias/running_mean/running_var -> scale/bias/mean/var.

The array-level mapping (`convert_state_dict`) is pinned against reference
execution by tests/test_u2net_golden.py, so the layout is falsifiable
before any real checkpoint exists.
"""

from __future__ import annotations

import argparse

import numpy as np

_BN_RENAME = {"weight": "scale", "bias": "bias",
              "running_mean": "mean", "running_var": "var"}


def convert_state_dict(sd: dict) -> dict:
    """Map a torch-naming state dict (numpy or tensor values) to the NPZ
    layout.  Unknown keys (num_batches_tracked) are dropped."""
    out = {}
    for k, v in sd.items():
        v = np.asarray(getattr(v, "numpy", lambda: v)(), np.float32) \
            if hasattr(v, "numpy") else np.asarray(v, np.float32)
        parts = k.split(".")
        if parts[-1] == "num_batches_tracked":
            continue
        mod, field = ".".join(parts[:-1]), parts[-1]
        if ".bn_s1" in k:
            out[f"{mod}.{_BN_RENAME[field]}"] = v
        elif field == "weight":            # conv kernels (conv_s1/side/out)
            assert v.ndim == 4, f"unexpected weight rank for {k}"
            out[f"{mod + '.kernel' if mod else 'kernel'}"] = \
                np.transpose(v, (2, 3, 1, 0))
        elif field == "bias":
            out[f"{mod}.bias" if mod else "bias"] = v
        else:
            raise ValueError(f"unrecognized u2net state-dict key: {k}")
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--spec", default="u2net", choices=("u2net", "u2netp"))
    args = p.parse_args()

    try:
        import torch
        sd = torch.load(args.ckpt, map_location="cpu", weights_only=True)
    except ImportError:
        from open_diffusiongs_tpu.utils.torch_load import torch_load
        sd = torch_load(args.ckpt)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params = convert_state_dict(sd)

    from open_diffusiongs_tpu.utils.u2net import SPECS, param_shapes
    want = param_shapes(SPECS[args.spec])
    missing = sorted(set(want) - set(params))
    extra = sorted(set(params) - set(want))
    if missing or extra:
        raise SystemExit(f"layout mismatch: missing={missing[:4]} "
                         f"extra={extra[:4]}")
    for k, s in want.items():
        assert tuple(params[k].shape) == tuple(s), \
            f"{k}: {params[k].shape} != {s}"
    np.savez_compressed(args.out, **params)
    print(f"wrote {args.out}: {len(params)} arrays")


if __name__ == "__main__":
    main()
