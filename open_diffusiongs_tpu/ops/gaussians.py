"""Gaussian parameter container (pytree) + activations and filters.

TPU-native equivalent of the reference `GaussianModel` (gs_core.py:321-869).
Instead of a mutable attribute bag, Gaussians are an immutable NamedTuple
pytree holding *raw* (pre-activation) parameters, so they flow through jit /
vmap / shard_map.  Activations match gs_core.py:330-334:
  scaling  -> exp
  rotation -> L2 normalize
  opacity  -> sigmoid

Filters (prune / crop / nearfar, gs_core.py:394-475) are host-side NumPy ops
used only at export time, so they may use boolean masks freely.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np


class Gaussians(NamedTuple):
    """Raw (pre-activation) per-Gaussian parameters.

    xyz:      [..., N, 3] world positions (no activation).
    features: [..., N, (sh_degree+1)^2, 3] SH coefficients (no activation).
    scaling:  [..., N, 3] log-scale (exp() at render time).
    rotation: [..., N, 4] unnormalized quaternion (w, x, y, z).
    opacity:  [..., N, 1] logit-opacity (sigmoid() at render time).
    """

    xyz: jnp.ndarray
    features: jnp.ndarray
    scaling: jnp.ndarray
    rotation: jnp.ndarray
    opacity: jnp.ndarray

    @property
    def sh_degree(self) -> int:
        return int(round(self.features.shape[-2] ** 0.5)) - 1

    @property
    def num(self) -> int:
        return self.xyz.shape[-2]

    def activate(self) -> "ActivatedGaussians":
        """Apply the render-time activations (gs_core.py:330-334)."""
        rot = self.rotation
        rot = rot / jnp.clip(jnp.linalg.norm(rot, axis=-1, keepdims=True), 1e-12)
        return ActivatedGaussians(
            xyz=self.xyz.astype(jnp.float32),
            features=self.features.astype(jnp.float32),
            scaling=jnp.exp(self.scaling.astype(jnp.float32)),
            rotation=rot.astype(jnp.float32),
            opacity=jnp.squeeze(
                jnp.asarray(1.0, jnp.float32)
                / (1.0 + jnp.exp(-self.opacity.astype(jnp.float32))), -1),
        )


class ActivatedGaussians(NamedTuple):
    """Post-activation parameters fed to the rasterizer.

    opacity is squeezed to [..., N]."""

    xyz: jnp.ndarray
    features: jnp.ndarray
    scaling: jnp.ndarray
    rotation: jnp.ndarray
    opacity: jnp.ndarray

    @property
    def sh_degree(self) -> int:
        return int(round(self.features.shape[-2] ** 0.5)) - 1


# ---------------------------------------------------------------------------
# Host-side (NumPy) filtering for export — ref gs_core.py:394-475.
# ---------------------------------------------------------------------------

class NumpyGaussians(NamedTuple):
    """Host-side raw Gaussians for filtering / PLY export."""

    xyz: np.ndarray
    features: np.ndarray
    scaling: np.ndarray
    rotation: np.ndarray
    opacity: np.ndarray

    @staticmethod
    def from_device(g: Gaussians) -> "NumpyGaussians":
        return NumpyGaussians(*(np.asarray(x) for x in g))

    def filter(self, mask: np.ndarray) -> "NumpyGaussians":
        return NumpyGaussians(*(x[mask] for x in self))

    def opacity_activated(self) -> np.ndarray:
        return 1.0 / (1.0 + np.exp(-self.opacity[..., 0]))

    def prune(self, opacity_thres: float = 0.05) -> "NumpyGaussians":
        """Drop low-opacity Gaussians (ref gs_core.py:420-424)."""
        return self.filter(self.opacity_activated() > opacity_thres)

    def crop(self, bbx: Tuple[float, ...] = (-1, 1, -1, 1, -1, 1)) -> "NumpyGaussians":
        """Keep Gaussians inside an axis-aligned box (ref gs_core.py:405-418)."""
        x0, x1, y0, y1, z0, z1 = bbx
        p = self.xyz
        keep = ((p[:, 0] >= x0) & (p[:, 0] <= x1)
                & (p[:, 1] >= y0) & (p[:, 1] <= y1)
                & (p[:, 2] >= z0) & (p[:, 2] <= z1))
        return self.filter(keep)

    def prune_by_nearfar(self, cam_origins: np.ndarray,
                         nearfar_percent=(0.01, 0.99)) -> "NumpyGaussians":
        """Drop points outside per-camera distance quantiles (ref gs_core.py:426-461)."""
        dists = np.linalg.norm(self.xyz[:, None, :] - cam_origins[None], axis=-1)
        lo = np.quantile(dists, nearfar_percent[0], axis=0, keepdims=True)
        hi = np.quantile(dists, nearfar_percent[1], axis=0, keepdims=True)
        reject = ((dists < lo) | (dists > hi)).any(axis=1)
        return self.filter(~reject)

    def apply_all_filters(self, opacity_thres: float = 0.05,
                          crop_bbx=(-1, 1, -1, 1, -1, 1),
                          cam_origins: Optional[np.ndarray] = None,
                          nearfar_percent=(0.005, 1.0)) -> "NumpyGaussians":
        """Standard export filter chain (ref gs_core.py:463-475)."""
        out = self.prune(opacity_thres)
        if crop_bbx is not None:
            out = out.crop(crop_bbx)
        if cam_origins is not None:
            out = out.prune_by_nearfar(cam_origins, nearfar_percent)
        return out
