"""Visualization helpers (reference utils/visualizers/color_util.py spirit):
colormaps for depth/error maps without matplotlib."""

from __future__ import annotations

import numpy as np

# compact viridis-ish control points (t, r, g, b)
_VIRIDIS = np.asarray([
    [0.0, 0.267, 0.005, 0.329],
    [0.25, 0.229, 0.322, 0.546],
    [0.5, 0.128, 0.567, 0.551],
    [0.75, 0.369, 0.789, 0.383],
    [1.0, 0.993, 0.906, 0.144],
])

_TURBO = np.asarray([
    [0.0, 0.190, 0.072, 0.232],
    [0.25, 0.275, 0.408, 0.882],
    [0.5, 0.150, 0.900, 0.500],
    [0.75, 0.970, 0.730, 0.180],
    [1.0, 0.480, 0.016, 0.011],
])


def _apply(points: np.ndarray, t: np.ndarray) -> np.ndarray:
    t = np.clip(t, 0.0, 1.0)
    out = np.empty(t.shape + (3,), np.float32)
    for c in range(3):
        out[..., c] = np.interp(t, points[:, 0], points[:, c + 1])
    return out


def colormap(values: np.ndarray, vmin=None, vmax=None,
             cmap: str = "viridis") -> np.ndarray:
    """[...]-shaped scalars -> [..., 3] float colors in [0, 1]."""
    vmin = float(values.min()) if vmin is None else vmin
    vmax = float(values.max()) if vmax is None else vmax
    t = (values - vmin) / max(vmax - vmin, 1e-12)
    return _apply(_VIRIDIS if cmap == "viridis" else _TURBO, t)


def depth_to_rgb(depth: np.ndarray, near=None, far=None) -> np.ndarray:
    """Depth map [h, w] -> uint8 [h, w, 3] turbo visualization."""
    rgb = colormap(depth, near, far, cmap="turbo")
    return (rgb * 255).astype(np.uint8)
