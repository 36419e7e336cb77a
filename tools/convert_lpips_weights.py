"""Convert lpips-package VGG16 weights to the NPZ layout used by
open_diffusiongs_tpu.systems.losses.lpips_init_params.

Run where `lpips` + `torchvision` are installed (this zero-egress image has
neither; the framework falls back to a flagged random init until the NPZ is
provided):

  python tools/convert_lpips_weights.py --out lpips_vgg.npz

NPZ keys: vgg/{stage}_{conv}/kernel ([kh, kw, cin, cout]) + /bias, and
lin/{stage}/kernel ([cin] non-negative 1x1 head weights).

The array-level mapping (`convert_arrays`) is pinned against reference
execution by tests/test_lpips_golden.py, so the layout becomes falsifiable
the moment real weights are produced offline.
"""

from __future__ import annotations

import argparse

import numpy as np

# VGG16 feature-layer indices per stage (torchvision.models.vgg16.features)
_STAGE_CONV_IDXS = [(0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28)]


def convert_arrays(conv_weights, conv_biases, lin_weights) -> dict:
    """Map torch-layout LPIPS arrays to the losses.py NPZ layout.

    conv_weights/conv_biases: per stage, a list of conv arrays in torch
    layout ([cout, cin, kh, kw] / [cout]); lin_weights: per stage, the
    NetLinLayer 1x1 conv weight ([1, cin, 1, 1]).
    """
    out = {}
    for si, (ws, bs) in enumerate(zip(conv_weights, conv_biases)):
        for ci, (w, b) in enumerate(zip(ws, bs)):
            out[f"vgg/{si}_{ci}/kernel"] = np.transpose(
                np.asarray(w), (2, 3, 1, 0))
            out[f"vgg/{si}_{ci}/bias"] = np.asarray(b)
    for si, w in enumerate(lin_weights):
        # shipped lpips checkpoints keep the heads non-negative (the paper
        # clamps during training); clamp defensively on conversion
        out[f"lin/{si}/kernel"] = np.maximum(
            np.asarray(w)[0, :, 0, 0], 0.0)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    args = p.parse_args()
    import lpips as lpips_pkg  # noqa: deferred heavy import

    model = lpips_pkg.LPIPS(net="vgg")
    vgg = model.net
    slices = [vgg.slice1, vgg.slice2, vgg.slice3, vgg.slice4, vgg.slice5]
    conv_w, conv_b = [], []
    for sl in slices:
        convs = [m for m in sl if m.__class__.__name__ == "Conv2d"]
        conv_w.append([c.weight.detach().numpy() for c in convs])
        conv_b.append([c.bias.detach().numpy() for c in convs])
    lin_w = [lin.model[-1].weight.detach().numpy() for lin in model.lins]
    out = convert_arrays(conv_w, conv_b, lin_w)
    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
