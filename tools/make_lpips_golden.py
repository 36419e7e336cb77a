"""Generate the LPIPS converter/forward golden (synthetic weights).

The reference computes its training loss and published LPIPS=0.257 eval
target with the lpips package's VGG16 net (diffusionGS/utils/losses.py:
277-300).  Real lpips weights need egress; this fixture pins the
*conversion path and forward semantics* instead, so the parity target
becomes falsifiable the moment a real `lpips_vgg.npz` is produced offline:

  * weights are drawn DETERMINISTICALLY from np.random.default_rng(2024)
    in torch layout ([cout, cin, 3, 3] convs, [1, cin, 1, 1] non-negative
    heads) — the test regenerates the identical arrays from the same seed,
    so the fixture stores only the images and outputs (a full random VGG16
    state would be a ~59 MB incompressible blob);
  * a torch net built to the lpips-package spec (ScalingLayer constants,
    vgg16 slice structure with maxpools between stages, normalize_tensor
    with eps=1e-10, unit-weight spatial-mean heads, per-stage sum) runs a
    fixed image pair through those weights;
  * the fixture records the per-stage distances and the final LPIPS value.

tests/test_lpips_golden.py feeds the same arrays through
tools/convert_lpips_weights.convert_arrays + losses.lpips_init_params and
asserts systems.losses.lpips reproduces the recorded value.

Usage: python tools/make_lpips_golden.py  (needs CPU torch)
"""

from __future__ import annotations

import argparse
import os

import numpy as np

VGG_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


def synth_weights(seed: int = 2024):
    """Deterministic torch-layout weights, regenerated identically by the
    test (keep in sync with tests/test_lpips_golden.py::_weights)."""
    rng = np.random.default_rng(seed)
    conv_w, conv_b, lin_w = [], [], []
    cin = 3
    for cout, n_convs in VGG_STAGES:
        ws, bs = [], []
        for _ in range(n_convs):
            ws.append(rng.normal(0, np.sqrt(2.0 / (9 * cin)),
                                 (cout, cin, 3, 3)).astype(np.float32))
            bs.append(rng.normal(0, 0.05, (cout,)).astype(np.float32))
            cin = cout
        conv_w.append(ws)
        conv_b.append(bs)
        lin_w.append(np.abs(rng.normal(0, 0.05, (1, cout, 1, 1))
                            ).astype(np.float32))
    return conv_w, conv_b, lin_w


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/golden/reference_lpips.npz")
    args = ap.parse_args()
    import torch
    import torch.nn.functional as F

    conv_w, conv_b, lin_w = synth_weights()
    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.15, x.shape), -1, 1).astype(np.float32)

    def features(img):
        # lpips.ScalingLayer then vgg16 slices; taps after the last ReLU
        # of each stage, maxpool between stages
        t = (torch.from_numpy(img)
             - torch.from_numpy(SHIFT).view(1, 3, 1, 1)) \
            / torch.from_numpy(SCALE).view(1, 3, 1, 1)
        feats = []
        for si, (ws, bs) in enumerate(zip(conv_w, conv_b)):
            if si > 0:
                t = F.max_pool2d(t, 2, 2)
            for w, b in zip(ws, bs):
                t = F.relu(F.conv2d(t, torch.from_numpy(w),
                                    torch.from_numpy(b), padding=1))
            feats.append(t)
        return feats

    with torch.no_grad():
        fx, fy = features(x), features(y)
        total = torch.zeros(x.shape[0])
        stage_vals = []
        for si, (a, b) in enumerate(zip(fx, fy)):
            # lpips.normalize_tensor: in / (sqrt(sum(in^2, dim=1)) + 1e-10)
            a = a / (a.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            b = b / (b.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
            d = (a - b).pow(2)
            w = torch.from_numpy(lin_w[si])
            val = F.conv2d(d, w).mean(dim=(1, 2, 3))    # spatial average
            stage_vals.append(val.numpy())
            total = total + val
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.savez_compressed(args.out, x=x, y=y,
                        stage_vals=np.stack(stage_vals),
                        lpips=total.numpy())
    print(f"wrote {args.out}: lpips={total.numpy()}")


if __name__ == "__main__":
    main()
