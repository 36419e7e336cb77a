"""PLY I/O for 3D Gaussians — pure NumPy (no plyfile dependency).

Matches the reference GaussianModel.save_ply/load_ply layout
(gs_core.py:578-783): binary little-endian, properties
x,y,z (f4), red,green,blue (u1 preview colors), f_dc_0..2, f_rest_* (padded
to SH degree 3 when `enable_gs_viewer` for SuperSplat-style viewers),
opacity, scale_0..2, rot_0..3 — all raw (pre-activation) values.
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import numpy as np

from ..ops.gaussians import NumpyGaussians

SH_C0 = 0.28209479177387814


def _build_dtype(n_f_dc: int, n_f_rest: int) -> np.dtype:
    fields: List[Tuple[str, str]] = [("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                                     ("red", "u1"), ("green", "u1"),
                                     ("blue", "u1")]
    fields += [(f"f_dc_{i}", "<f4") for i in range(n_f_dc)]
    fields += [(f"f_rest_{i}", "<f4") for i in range(n_f_rest)]
    fields += [("opacity", "<f4")]
    fields += [(f"scale_{i}", "<f4") for i in range(3)]
    fields += [(f"rot_{i}", "<f4") for i in range(4)]
    return np.dtype(fields)


def save_gaussians_ply(g: NumpyGaussians, path: str,
                       enable_gs_viewer: bool = True) -> None:
    """Write raw Gaussians to a 3DGS-convention PLY (gs_core.py:636-712)."""
    if os.path.dirname(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
    n = g.xyz.shape[0]
    sh_degree = int(round(g.features.shape[1] ** 0.5)) - 1
    # f_dc layout: [n, 3] channel-major like the reference transpose(1, 2)
    f_dc = g.features[:, 0, :].astype(np.float32)           # [n, 3]
    rgb = np.clip((SH_C0 * f_dc + 0.5) * 255.0, 0, 255).astype(np.uint8)

    if sh_degree > 0:
        # [n, SH-1, 3] -> transpose to [n, 3, SH-1] -> flat (channel-major)
        f_rest = g.features[:, 1:, :].transpose(0, 2, 1).reshape(n, -1)
    else:
        f_rest = np.zeros((n, 0), np.float32)
    if enable_gs_viewer:
        want = 3 * ((3 + 1) ** 2 - 1)                        # pad to degree 3
        if f_rest.shape[1] < want:
            pad = np.zeros((n, want), np.float32)
            pad[:, :f_rest.shape[1]] = f_rest
            f_rest = pad

    dtype = _build_dtype(3, f_rest.shape[1])
    el = np.empty(n, dtype=dtype)
    el["x"], el["y"], el["z"] = g.xyz[:, 0], g.xyz[:, 1], g.xyz[:, 2]
    el["red"], el["green"], el["blue"] = rgb[:, 0], rgb[:, 1], rgb[:, 2]
    for i in range(3):
        el[f"f_dc_{i}"] = f_dc[:, i]
    for i in range(f_rest.shape[1]):
        el[f"f_rest_{i}"] = f_rest[:, i]
    el["opacity"] = g.opacity[:, 0]
    for i in range(3):
        el[f"scale_{i}"] = g.scaling[:, i]
    for i in range(4):
        el[f"rot_{i}"] = g.rotation[:, i]

    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}"]
    type_map = {"<f4": "float", "u1": "uchar"}
    for name, (dt, _) in dtype.fields.items():
        header.append(f"property {type_map[dt.str.lstrip('|')]} {name}")
    header.append("end_header")
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(el.tobytes())


def load_gaussians_ply(path: str, sh_degree: int = 0) -> NumpyGaussians:
    """Read a 3DGS PLY (binary little-endian) back into raw Gaussians
    (gs_core.py:716-783)."""
    with open(path, "rb") as f:
        header_lines = []
        while True:
            line = f.readline().decode("ascii").strip()
            header_lines.append(line)
            if line == "end_header":
                break
        n = 0
        props: List[Tuple[str, str]] = []
        tmap = {"float": "<f4", "uchar": "u1", "double": "<f8",
                "int": "<i4", "uint": "<u4", "short": "<i2",
                "ushort": "<u2", "char": "i1"}
        for line in header_lines:
            parts = line.split()
            if parts[:2] == ["element", "vertex"]:
                n = int(parts[2])
            elif parts[0] == "property" and len(parts) == 3:
                props.append((parts[2], tmap[parts[1]]))
        dtype = np.dtype([(name, t) for name, t in props])
        data = np.frombuffer(f.read(n * dtype.itemsize), dtype=dtype, count=n)

    names = {name for name, _ in props}
    xyz = np.stack([data["x"], data["y"], data["z"]], axis=1).astype(np.float32)
    f_dc = np.stack([data[f"f_dc_{i}"] for i in range(3)], axis=1)
    n_rest_avail = sum(1 for nm in names if nm.startswith("f_rest_"))
    shs = (sh_degree + 1) ** 2
    features = np.zeros((n, shs, 3), np.float32)
    features[:, 0, :] = f_dc
    if sh_degree > 0:
        want = 3 * (shs - 1)
        assert n_rest_avail >= want, (n_rest_avail, want)
        rest = np.stack([data[f"f_rest_{i}"] for i in range(want)], axis=1)
        features[:, 1:, :] = rest.reshape(n, 3, shs - 1).transpose(0, 2, 1)
    scaling = np.stack([data[f"scale_{i}"] for i in range(3)], axis=1)
    rotation = np.stack([data[f"rot_{i}"] for i in range(4)], axis=1)
    opacity = np.asarray(data["opacity"])[:, None]
    return NumpyGaussians(xyz=xyz, features=features,
                          scaling=scaling.astype(np.float32),
                          rotation=rotation.astype(np.float32),
                          opacity=opacity.astype(np.float32))
