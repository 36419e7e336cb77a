"""Generate license-free synthetic demo images for run.py.

The reference ships 7 artwork PNGs in extra_files/test_cases/ (not
redistributable).  This renders simple lambert-shaded primitives —
sphere, torus, capsule — over a white background at 512x512, matching
the studio-photo convention the object pipeline assumes (subject clear
of the frame border, near-white backdrop).

Usage: python extra_files/make_test_cases.py [--out extra_files/test_cases]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _shade(mask, normal, base, light=(0.4, -0.5, 0.75)):
    l = np.asarray(light) / np.linalg.norm(light)
    lam = np.clip((normal * l).sum(-1), 0.0, 1.0)
    spec = np.clip((normal * l).sum(-1), 0.0, 1.0) ** 24
    col = (0.25 + 0.65 * lam)[..., None] * np.asarray(base) + 0.25 * spec[..., None]
    img = np.ones(mask.shape + (3,))
    img[mask] = np.clip(col[mask], 0, 1)
    return img


def sphere(res):
    y, x = np.mgrid[-1:1:res * 1j, -1:1:res * 1j]
    r2 = x * x + y * y
    mask = r2 < 0.55
    z = np.sqrt(np.clip(0.55 - r2, 0, None))
    n = np.stack([x, -y, z], -1)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    return _shade(mask, n, (0.85, 0.30, 0.25))


def torus(res, R=0.52, a=0.22):
    y, x = np.mgrid[-1:1:res * 1j, -1:1:res * 1j]
    rho = np.sqrt(x * x + y * y)
    d2 = a * a - (rho - R) ** 2
    mask = d2 > 0
    z = np.sqrt(np.clip(d2, 0, None))
    with np.errstate(invalid="ignore", divide="ignore"):
        cx, cy = np.where(rho > 1e-9, x / rho, 0) * R, np.where(
            rho > 1e-9, y / rho, 0) * R
    n = np.stack([x - cx, -(y - cy), z], -1)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    return _shade(mask, n, (0.25, 0.45, 0.85))


def capsule(res, a=0.45, r2=0.18):
    y, x = np.mgrid[-1:1:res * 1j, -1:1:res * 1j]
    cx = np.clip(x, -a, a)
    d2 = r2 - (x - cx) ** 2 - y * y
    mask = d2 > 0
    z = np.sqrt(np.clip(d2, 0, None))
    n = np.stack([x - cx, -y, z], -1)
    n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    return _shade(mask, n, (0.35, 0.75, 0.35))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "test_cases"))
    ap.add_argument("--res", type=int, default=512)
    args = ap.parse_args()
    from PIL import Image

    os.makedirs(args.out, exist_ok=True)
    for name, fn in (("sphere", sphere), ("torus", torus),
                     ("capsule", capsule)):
        img = (fn(args.res) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(args.out, f"{name}.png"))
        print(f"wrote {args.out}/{name}.png")


if __name__ == "__main__":
    main()
