"""Generate the U²-Net converter/forward golden (synthetic weights).

The reference's background removal runs rembg's U²-Net (pipline_obj.py:
256-261).  Real u2net checkpoints need egress; this fixture pins the
*conversion path and forward semantics* instead (same recipe as
tools/make_lpips_golden.py):

  * weights are drawn DETERMINISTICALLY by utils/u2net.synth_params and
    mapped to torch layout here — the test regenerates the identical
    arrays from the same seed, so the fixture stores only the input and
    the outputs;
  * a torch net written explicitly to the published architecture
    (Qin et al. 2020: REBNCONV = 3x3 dilated conv + BN + ReLU; RSU-7/6/
    5/4 pooling U-blocks; RSU-4F dilation blocks; six side heads + 1x1
    fusion) runs a fixed image through those weights in eval mode — the
    module attribute names follow the published checkpoint key format so
    `load_state_dict(strict=True)` doubles as a naming check;
  * the fixture records all seven sigmoid maps at two input sizes (an
    even 160² and an odd-pool-path 96²... 96 is even at every pool; use
    88² whose RSU7 interior hits odd dims, exercising ceil_mode).

tests/test_u2net_golden.py feeds the same arrays through
tools/convert_u2net_weights.convert_state_dict + utils.u2net and asserts
the jax forward reproduces the recorded maps.

Usage: python tools/make_u2net_golden.py  (needs CPU torch)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from open_diffusiongs_tpu.utils.u2net import (  # noqa: E402
    SPECS, synth_params)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "reference_u2net.npz")


class REBNCONV(nn.Module):
    def __init__(self, in_ch, out_ch, dirate=1):
        super().__init__()
        self.conv_s1 = nn.Conv2d(in_ch, out_ch, 3, padding=dirate,
                                 dilation=dirate)
        self.bn_s1 = nn.BatchNorm2d(out_ch)
        self.relu_s1 = nn.ReLU(inplace=True)

    def forward(self, x):
        return self.relu_s1(self.bn_s1(self.conv_s1(x)))


def _up(src, tar):
    return F.interpolate(src, size=tar.shape[2:], mode="bilinear",
                         align_corners=False)


class RSU(nn.Module):
    """RSU-L pooling block, explicit per the paper's Fig. 2."""

    def __init__(self, height, in_ch, mid_ch, out_ch):
        super().__init__()
        self.height = height
        self.rebnconvin = REBNCONV(in_ch, out_ch)
        cin = out_ch
        for i in range(1, height):
            setattr(self, f"rebnconv{i}", REBNCONV(cin, mid_ch))
            cin = mid_ch
        setattr(self, f"rebnconv{height}", REBNCONV(mid_ch, mid_ch, dirate=2))
        for i in range(height - 1, 1, -1):
            setattr(self, f"rebnconv{i}d", REBNCONV(mid_ch * 2, mid_ch))
        self.rebnconv1d = REBNCONV(mid_ch * 2, out_ch)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        enc = []
        hx = hxin
        for i in range(1, self.height):
            hx = getattr(self, f"rebnconv{i}")(hx)
            enc.append(hx)
            if i < self.height - 1:
                hx = F.max_pool2d(hx, 2, stride=2, ceil_mode=True)
        hx = getattr(self, f"rebnconv{self.height}")(hx)
        for i in range(self.height - 1, 0, -1):
            hx = getattr(self, f"rebnconv{i}d")(
                torch.cat((hx, enc[i - 1]), 1))
            if i > 1:
                hx = _up(hx, enc[i - 2])
        return hx + hxin


class RSU4F(nn.Module):
    def __init__(self, in_ch, mid_ch, out_ch):
        super().__init__()
        self.rebnconvin = REBNCONV(in_ch, out_ch)
        self.rebnconv1 = REBNCONV(out_ch, mid_ch, dirate=1)
        self.rebnconv2 = REBNCONV(mid_ch, mid_ch, dirate=2)
        self.rebnconv3 = REBNCONV(mid_ch, mid_ch, dirate=4)
        self.rebnconv4 = REBNCONV(mid_ch, mid_ch, dirate=8)
        self.rebnconv3d = REBNCONV(mid_ch * 2, mid_ch, dirate=4)
        self.rebnconv2d = REBNCONV(mid_ch * 2, mid_ch, dirate=2)
        self.rebnconv1d = REBNCONV(mid_ch * 2, out_ch, dirate=1)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        hx1 = self.rebnconv1(hxin)
        hx2 = self.rebnconv2(hx1)
        hx3 = self.rebnconv3(hx2)
        hx4 = self.rebnconv4(hx3)
        hx3d = self.rebnconv3d(torch.cat((hx4, hx3), 1))
        hx2d = self.rebnconv2d(torch.cat((hx3d, hx2), 1))
        hx1d = self.rebnconv1d(torch.cat((hx2d, hx1), 1))
        return hx1d + hxin


class U2NET(nn.Module):
    def __init__(self, spec):
        super().__init__()
        for st in spec.stages:
            blk = (RSU4F(st.in_ch, st.mid_ch, st.out_ch) if st.height == 0
                   else RSU(st.height, st.in_ch, st.mid_ch, st.out_ch))
            setattr(self, st.name, blk)
        for i, c in enumerate(spec.side_channels, 1):
            setattr(self, f"side{i}", nn.Conv2d(c, spec.out_ch, 3, padding=1))
        self.outconv = nn.Conv2d(6 * spec.out_ch, spec.out_ch, 1)

    def forward(self, x):
        hx1 = self.stage1(x)
        hx2 = self.stage2(F.max_pool2d(hx1, 2, 2, ceil_mode=True))
        hx3 = self.stage3(F.max_pool2d(hx2, 2, 2, ceil_mode=True))
        hx4 = self.stage4(F.max_pool2d(hx3, 2, 2, ceil_mode=True))
        hx5 = self.stage5(F.max_pool2d(hx4, 2, 2, ceil_mode=True))
        hx6 = self.stage6(F.max_pool2d(hx5, 2, 2, ceil_mode=True))
        hx5d = self.stage5d(torch.cat((_up(hx6, hx5), hx5), 1))
        hx4d = self.stage4d(torch.cat((_up(hx5d, hx4), hx4), 1))
        hx3d = self.stage3d(torch.cat((_up(hx4d, hx3), hx3), 1))
        hx2d = self.stage2d(torch.cat((_up(hx3d, hx2), hx2), 1))
        hx1d = self.stage1d(torch.cat((_up(hx2d, hx1), hx1), 1))
        d1 = self.side1(hx1d)
        d2 = _up(self.side2(hx2d), d1)
        d3 = _up(self.side3(hx3d), d1)
        d4 = _up(self.side4(hx4d), d1)
        d5 = _up(self.side5(hx5d), d1)
        d6 = _up(self.side6(hx6), d1)
        d0 = self.outconv(torch.cat((d1, d2, d3, d4, d5, d6), 1))
        return [torch.sigmoid(d) for d in (d0, d1, d2, d3, d4, d5, d6)]


def npz_to_torch_sd(params: dict) -> dict:
    """NPZ layout -> torch state_dict naming/layout (the inverse of
    tools/convert_u2net_weights.convert_state_dict)."""
    sd = {}
    for k, v in params.items():
        if ".bn_s1." in k:
            mod, field = k.rsplit(".", 1)
            name = {"scale": "weight", "bias": "bias",
                    "mean": "running_mean", "var": "running_var"}[field]
            sd[f"{mod}.{name}"] = torch.from_numpy(v)
        elif k.endswith(".kernel"):
            sd[k[:-len(".kernel")] + ".weight"] = torch.from_numpy(
                np.transpose(v, (3, 2, 0, 1)).copy())
        else:
            sd[k] = torch.from_numpy(v)
    return sd


def main():
    torch.manual_seed(0)
    fx = {}
    # u2netp at two sizes (88 drives odd dims through ceil-mode pools);
    # the FULL config once at 64 — its per-stage channel widths differ
    # (the lite variant's uniform 64ch would mask mis-wired RSU channels)
    for spec_name, sizes in (("u2netp", (160, 88)), ("u2net", (64,))):
        spec = SPECS[spec_name]
        params = synth_params(spec, seed=2025)
        model = U2NET(spec)
        missing, unexpected = model.load_state_dict(
            npz_to_torch_sd(params), strict=False)
        unexpected = [k for k in unexpected]
        missing = [k for k in missing if not k.endswith("num_batches_tracked")]
        assert not missing and not unexpected, (missing[:4], unexpected[:4])
        model.eval()
        for size in sizes:
            rng = np.random.default_rng(7 + size)
            x = rng.uniform(-2.2, 2.6, (1, 3, size, size)).astype(np.float32)
            with torch.no_grad():
                ds = model(torch.from_numpy(x))
            fx[f"{spec_name}_{size}/x"] = x
            for i, d in enumerate(ds):
                fx[f"{spec_name}_{size}/d{i}"] = d.numpy()
            print(spec_name, size, "d0 mean", float(ds[0].mean()))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **fx)
    print(f"wrote {OUT} ({os.path.getsize(OUT) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
