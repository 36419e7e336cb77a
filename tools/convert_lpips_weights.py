"""Convert lpips-package VGG16 weights to the NPZ layout used by
open_diffusiongs_tpu.systems.losses.lpips_init_params.

Run where `lpips` + `torchvision` are installed (this zero-egress image has
neither; the framework falls back to a flagged random init until the NPZ is
provided):

  python tools/convert_lpips_weights.py --out lpips_vgg.npz

NPZ keys: vgg/{stage}_{conv}/kernel ([kh, kw, cin, cout]) + /bias, and
lin/{stage}/kernel ([cin] non-negative 1x1 head weights).
"""

from __future__ import annotations

import argparse

import numpy as np

# VGG16 feature-layer indices per stage (torchvision.models.vgg16.features)
_STAGE_CONV_IDXS = [(0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    args = p.parse_args()
    import lpips as lpips_pkg  # noqa: deferred heavy import

    model = lpips_pkg.LPIPS(net="vgg")
    feats = model.net.slice1  # ensure built
    vgg = model.net
    slices = [vgg.slice1, vgg.slice2, vgg.slice3, vgg.slice4, vgg.slice5]
    out = {}
    for si, sl in enumerate(slices):
        convs = [m for m in sl if m.__class__.__name__ == "Conv2d"]
        for ci, conv in enumerate(convs):
            w = conv.weight.detach().numpy()      # [cout, cin, kh, kw]
            b = conv.bias.detach().numpy()
            out[f"vgg/{si}_{ci}/kernel"] = w.transpose(2, 3, 1, 0)
            out[f"vgg/{si}_{ci}/bias"] = b
    for si, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1, cin, 1, 1]
        out[f"lin/{si}/kernel"] = np.maximum(w[0, :, 0, 0], 0.0)
    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
