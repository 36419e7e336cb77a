"""Mesh extraction: jitted 3D Gaussian density field + native iso-surface.

Replicates the reference mesh-export pipeline (gs_core.py:786-869):
  1. recenter/scale Gaussians to ~[-1, 1] (1.8 / bbox),
  2. evaluate occupancy = sum_i opacity_i * exp(-0.5 d^T Sigma_i^{-1} d)
     on a dense grid, blockwise with per-block Gaussian masking,
  3. iso-surface at `density_thresh` (reference: PyMCubes marching cubes;
     here: native C++ marching tetrahedra, native/mesher.cpp, auto-built),
  4. clean_mesh (merge close vertices, duplicate/degenerate faces, small
     components — pymeshlab clean_mesh equivalent, utils/mesh_utils.py:88-146;
     isotropic remeshing + non-manifold repair are not replicated),
  5. quadric edge-collapse decimation to the triangle budget
     (meshing_decimation_quadric_edge_collapse equivalent,
     utils/mesh_utils.py:44-85).

The density evaluation runs on-device (jit, static block capacity); the
geometry stage is host-side C++ via ctypes.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .gaussians import NumpyGaussians
from .gs_math import build_cov3d

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmesher.so")


@functools.lru_cache(None)
def _lib() -> ctypes.CDLL:
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.mesh_marching_tets.restype = ctypes.c_int
    lib.mesh_marching_tets.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int64)]
    lib.mesh_largest_component.restype = ctypes.c_int
    lib.mesh_decimate_cluster.restype = ctypes.c_int
    lib.mesh_decimate_quadric.restype = ctypes.c_int
    lib.mesh_clean.restype = ctypes.c_int
    lib.mesh_repair_nonmanifold.restype = ctypes.c_int
    lib.mesh_remesh_isotropic.restype = ctypes.c_int
    lib.mesh_free.restype = None
    lib.mesh_free.argtypes = [ctypes.c_void_p]
    return lib


def _unpack_out(vp, nv, tp, nt):
    verts = np.ctypeslib.as_array(vp, (nv.value, 3)).copy() \
        if nv.value else np.zeros((0, 3), np.float32)
    tris = np.ctypeslib.as_array(tp, (nt.value, 3)).copy() \
        if nt.value else np.zeros((0, 3), np.int32)
    _lib().mesh_free(ctypes.cast(vp, ctypes.c_void_p))
    _lib().mesh_free(ctypes.cast(tp, ctypes.c_void_p))
    return verts, tris


def marching_tets(grid: np.ndarray, iso: float) -> Tuple[np.ndarray, np.ndarray]:
    """grid: [nx, ny, nz] float32 -> (verts [V, 3] in grid coords,
    tris [F, 3] int32)."""
    grid = np.ascontiguousarray(grid, np.float32)
    nx, ny, nz = grid.shape
    vp = ctypes.POINTER(ctypes.c_float)()
    tp = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    rc = _lib().mesh_marching_tets(
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz, ctypes.c_float(iso),
        ctypes.byref(vp), ctypes.byref(nv), ctypes.byref(tp), ctypes.byref(nt))
    assert rc == 0, "marching tets failed"
    verts = np.ctypeslib.as_array(vp, (nv.value, 3)).copy() \
        if nv.value else np.zeros((0, 3), np.float32)
    tris = np.ctypeslib.as_array(tp, (nt.value, 3)).copy() \
        if nt.value else np.zeros((0, 3), np.int32)
    _lib().mesh_free(ctypes.cast(vp, ctypes.c_void_p))
    _lib().mesh_free(ctypes.cast(tp, ctypes.c_void_p))
    return verts, tris


def largest_component(verts: np.ndarray, tris: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray]:
    if len(tris) == 0:
        return verts, tris
    keep = np.zeros((len(tris),), np.uint8)
    rc = _lib().mesh_largest_component(
        np.ascontiguousarray(verts, np.float32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(verts)),
        np.ascontiguousarray(tris, np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(tris)),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    assert rc == 0
    tris = tris[keep.astype(bool)]
    used = np.unique(tris)
    remap = np.full(len(verts), -1, np.int32)
    remap[used] = np.arange(len(used), dtype=np.int32)
    return verts[used], remap[tris]


def decimate_mesh(verts: np.ndarray, tris: np.ndarray,
                  target_tris: int = 100_000
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Quadric edge-collapse decimation toward a target triangle count —
    the reference's meshing_decimation_quadric_edge_collapse
    (utils/mesh_utils.py decimate_mesh:44-85), implemented natively
    (Garland-Heckbert quadrics, optimal placement, boundary constraints,
    normal-flip guard; native/mesher.cpp mesh_decimate_quadric)."""
    if len(tris) <= target_tris:
        return verts, tris
    lib = _lib()
    vp = ctypes.POINTER(ctypes.c_float)()
    tp = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    rc = lib.mesh_decimate_quadric(
        np.ascontiguousarray(verts, np.float32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(verts)),
        np.ascontiguousarray(tris, np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(tris)), ctypes.c_int64(int(target_tris)),
        ctypes.byref(vp), ctypes.byref(nv), ctypes.byref(tp),
        ctypes.byref(nt))
    assert rc == 0, "quadric decimation failed"
    return _unpack_out(vp, nv, tp, nt)


def repair_nonmanifold(verts: np.ndarray, tris: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Non-manifold repair (pymeshlab meshing_repair_non_manifold_edges
    method=0 + meshing_repair_non_manifold_vertices vertdispratio=0,
    utils/mesh_utils.py:127-130): edges with > 2 incident faces keep the 2
    largest-area faces; vertices whose incident faces form several edge-
    connected fans are split per fan."""
    if len(tris) == 0:
        return verts, tris
    lib = _lib()
    vp = ctypes.POINTER(ctypes.c_float)()
    tp = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    rc = lib.mesh_repair_nonmanifold(
        np.ascontiguousarray(verts, np.float32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(verts)),
        np.ascontiguousarray(tris, np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(tris)),
        ctypes.byref(vp), ctypes.byref(nv), ctypes.byref(tp),
        ctypes.byref(nt))
    assert rc == 0, "non-manifold repair failed"
    return _unpack_out(vp, nv, tp, nt)


def remesh_isotropic(verts: np.ndarray, tris: np.ndarray,
                     target_len: float, iterations: int = 3
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Isotropic explicit remeshing toward a target edge length (pymeshlab
    meshing_isotropic_explicit_remeshing, utils/mesh_utils.py:134-136;
    iterations=3, targetlen absolute).  Light Botsch-Kobbelt variant:
    split edges > 4/3 L, collapse edges < 4/5 L, tangential relaxation;
    edge flips omitted (native/mesher.cpp mesh_remesh_isotropic)."""
    if len(tris) == 0:
        return verts, tris
    lib = _lib()
    vp = ctypes.POINTER(ctypes.c_float)()
    tp = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    rc = lib.mesh_remesh_isotropic(
        np.ascontiguousarray(verts, np.float32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(verts)),
        np.ascontiguousarray(tris, np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(tris)),
        ctypes.c_float(target_len), ctypes.c_int(int(iterations)),
        ctypes.byref(vp), ctypes.byref(nv), ctypes.byref(tp),
        ctypes.byref(nt))
    assert rc == 0, "isotropic remesh failed"
    return _unpack_out(vp, nv, tp, nt)


def clean_mesh(verts: np.ndarray, tris: np.ndarray,
               v_pct: float = 1.0, min_f: int = 64, min_d: float = 20.0,
               repair: bool = False, remesh: bool = False,
               remesh_size: float = 0.01
               ) -> Tuple[np.ndarray, np.ndarray]:
    """pymeshlab-style cleaning (clean_mesh, utils/mesh_utils.py:88-146):
    merge vertices closer than v_pct% of the bbox diagonal, drop duplicate
    and degenerate faces, remove connected components with < min_f faces or
    diameter < min_d% of the bbox diagonal, drop unreferenced vertices;
    then optionally `repair` non-manifold edges/vertices and isotropically
    `remesh` to edge length `remesh_size` (the reference defaults both ON;
    here they default OFF to keep small test meshes bit-stable — the export
    path enables them)."""
    if len(tris) == 0:
        return verts, tris
    lib = _lib()
    vp = ctypes.POINTER(ctypes.c_float)()
    tp = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int64()
    nt = ctypes.c_int64()
    rc = lib.mesh_clean(
        np.ascontiguousarray(verts, np.float32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(len(verts)),
        np.ascontiguousarray(tris, np.int32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(tris)),
        ctypes.c_float(v_pct), ctypes.c_float(min_d),
        ctypes.c_int64(min_f),
        ctypes.byref(vp), ctypes.byref(nv), ctypes.byref(tp),
        ctypes.byref(nt))
    assert rc == 0, "mesh clean failed"
    verts, tris = _unpack_out(vp, nv, tp, nt)
    if repair and len(tris):
        verts, tris = repair_nonmanifold(verts, tris)
    if remesh and len(tris):
        verts, tris = remesh_isotropic(verts, tris, remesh_size)
    return verts, tris


def decimate_mesh_cluster(verts: np.ndarray, tris: np.ndarray,
                          target_tris: int = 100_000, max_iters: int = 8
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Vertex-clustering decimation (fast, coarse; kept as the cheap
    alternative to `decimate_mesh`'s quadric collapse)."""
    if len(tris) <= target_tris:
        return verts, tris
    lib = _lib()
    cells = 256
    cur_v, cur_t = verts, tris
    for _ in range(max_iters):
        vp = ctypes.POINTER(ctypes.c_float)()
        tp = ctypes.POINTER(ctypes.c_int32)()
        nv = ctypes.c_int64()
        nt = ctypes.c_int64()
        rc = lib.mesh_decimate_cluster(
            np.ascontiguousarray(verts, np.float32).ctypes.data_as(
                ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(len(verts)),
            np.ascontiguousarray(tris, np.int32).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int32)),
            ctypes.c_int64(len(tris)), ctypes.c_int(cells),
            ctypes.byref(vp), ctypes.byref(nv), ctypes.byref(tp),
            ctypes.byref(nt))
        assert rc == 0
        cur_v = np.ctypeslib.as_array(vp, (nv.value, 3)).copy()
        cur_t = np.ctypeslib.as_array(tp, (nt.value, 3)).copy() \
            if nt.value else np.zeros((0, 3), np.int32)
        lib.mesh_free(ctypes.cast(vp, ctypes.c_void_p))
        lib.mesh_free(ctypes.cast(tp, ctypes.c_void_p))
        if len(cur_t) <= target_tris or cells <= 8:
            break
        cells = max(8, int(cells / (len(cur_t) / target_tris) ** (1 / 3)))
    return cur_v.astype(np.float32), cur_t


def gaussian_density_grid(g: NumpyGaussians, resolution: int = 256,
                          block_pts: int = 32768,
                          max_per_block: int = 8192,
                          relax: float = 0.1):
    """Blockwise density field (extract_fields, gs_core.py:786-852).

    Returns (grid [res, res, res] float32, center [3], scale float): verts
    from the grid map back to world via v / scale + center.
    """
    xyz = g.xyz.astype(np.float32)
    opa = 1.0 / (1.0 + np.exp(-g.opacity[:, 0].astype(np.float32)))
    mn, mx = xyz.min(0), xyz.max(0)
    center = (mn + mx) / 2
    scale = 1.8 / max((mx - mn).max(), 1e-8)
    xyz_n = (xyz - center) * scale
    stds = np.exp(g.scaling.astype(np.float32)) * scale
    rot = g.rotation / np.clip(
        np.linalg.norm(g.rotation, axis=-1, keepdims=True), 1e-12, None)
    cov6 = np.asarray(build_cov3d(jnp.asarray(stds), jnp.asarray(rot)))
    # inverse covariance entries (gaussian_3d_coeff semantics)
    a, b, c = cov6[:, 0], cov6[:, 1], cov6[:, 2]
    d, e, f = cov6[:, 3], cov6[:, 4], cov6[:, 5]
    det = a * d * f + 2 * b * c * e - a * e * e - d * c * c - f * b * b
    det = np.where(np.abs(det) < 1e-24, 1e-24, det)
    inv = np.stack([(d * f - e * e), -(b * f - c * e), (b * e - c * d),
                    (a * f - c * c), -(a * e - b * c), (a * d - b * b)],
                   axis=-1) / det[:, None]

    n = xyz_n.shape[0]
    lin = np.linspace(-1.0, 1.0, resolution, dtype=np.float32)
    grid = np.zeros((resolution,) * 3, np.float32)

    @jax.jit
    def eval_block(pts, bxyz, binv, bopa, bmask):
        d = pts[:, None, :] - bxyz[None, :, :]              # [M, L, 3]
        ia, ib, ic, id_, ie, if_ = (binv[:, i] for i in range(6))
        power = -0.5 * (ia * d[..., 0] ** 2 + id_ * d[..., 1] ** 2
                        + if_ * d[..., 2] ** 2) \
            - ib * d[..., 0] * d[..., 1] - ic * d[..., 0] * d[..., 2] \
            - ie * d[..., 1] * d[..., 2]
        w = jnp.where(power <= 0, jnp.exp(power), 0.0)
        return jnp.sum(jnp.where(bmask[None, :], bopa[None, :] * w, 0.0),
                       axis=1)

    # blocks over z-slabs of the grid
    pts_per_slab = resolution * resolution
    slab_rows = max(1, block_pts // pts_per_slab)
    for z0 in range(0, resolution, slab_rows):
        z1 = min(z0 + slab_rows, resolution)
        zz, yy, xx = np.meshgrid(lin[z0:z1], lin, lin, indexing="ij")
        pts = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3)
        vmin = pts.min(0) - relax
        vmax = pts.max(0) + relax
        mask = ((xyz_n > vmin) & (xyz_n < vmax)).all(-1)
        idx = np.nonzero(mask)[0]
        if len(idx) == 0:
            continue
        if len(idx) > max_per_block:
            idx = idx[np.argsort(-opa[idx])[:max_per_block]]
        pad = max_per_block - len(idx)
        sel = np.pad(idx, (0, pad))
        bmask = np.zeros((max_per_block,), bool)
        bmask[:len(idx)] = True
        val = np.asarray(eval_block(
            jnp.asarray(pts), jnp.asarray(xyz_n[sel]), jnp.asarray(inv[sel]),
            jnp.asarray(opa[sel]), jnp.asarray(bmask)))
        # val dims are (z, y, x); grid is indexed [x, y, z]
        grid[:, :, z0:z1] = np.transpose(
            val.reshape(z1 - z0, resolution, resolution), (2, 1, 0))

    return grid, center, scale


def extract_mesh(g: NumpyGaussians, density_thresh: float = 0.005,
                 resolution: int = 256, keep_largest: bool = True,
                 decimate_target: int = 100_000, clean: bool = True,
                 repair: bool = True, remesh: bool = True,
                 remesh_size: float = 0.01
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Gaussians -> (verts [V, 3] world-space, tris [F, 3])
    (extract_mesh, gs_core.py:855-869: marching cubes -> clean_mesh ->
    quadric decimation).  keep_largest additionally applies the
    single-component filter (our stricter default; the reference keeps all
    components above clean_mesh's size thresholds).  repair/remesh mirror
    the reference clean_mesh defaults (both ON, remesh_size=0.01 in the
    [-1, 1] normalized frame — converted to grid units here since cleaning
    runs before the rescale)."""
    grid, center, scale = gaussian_density_grid(g, resolution)
    verts, tris = marching_tets(grid, density_thresh)
    if clean and len(tris):
        # reference clean_mesh defaults: v_pct=1, min_f=64, min_d=20
        # (gs_core.py:861 -> utils/mesh_utils.py:88-146)
        verts, tris = clean_mesh(
            verts, tris, repair=repair, remesh=remesh,
            remesh_size=remesh_size * (resolution - 1) / 2.0)
    if keep_largest and len(tris):
        verts, tris = largest_component(verts, tris)
    if decimate_target and decimate_target > 0:
        verts, tris = decimate_mesh(verts, tris, decimate_target)
    # grid coords -> [-1, 1] -> world
    verts = verts / (resolution - 1.0) * 2.0 - 1.0
    verts = verts / scale + center
    return verts.astype(np.float32), tris


def save_mesh_obj(path: str, verts: np.ndarray, tris: np.ndarray) -> None:
    if os.path.dirname(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for t in tris:
            f.write(f"f {t[0] + 1} {t[1] + 1} {t[2] + 1}\n")


def vertex_normals(verts: np.ndarray, tris: np.ndarray) -> np.ndarray:
    """Area-weighted smooth vertex normals (reference geometry/utils.py
    Mesh._compute_vertex_normal: cross-product face normals scattered to
    vertices, then normalized)."""
    verts = np.asarray(verts, np.float64).reshape(-1, 3)
    tris = np.asarray(tris, np.int64).reshape(-1, 3)
    fn = np.cross(verts[tris[:, 1]] - verts[tris[:, 0]],
                  verts[tris[:, 2]] - verts[tris[:, 0]])  # 2*area * normal
    vn = np.zeros_like(verts)
    for c in range(3):
        np.add.at(vn, tris[:, c], fn)
    norm = np.linalg.norm(vn, axis=-1, keepdims=True)
    vn = np.where(norm > 1e-20, vn / np.maximum(norm, 1e-20),
                  np.array([0.0, 0.0, 1.0]))
    return vn.astype(np.float32)


def vertex_tangents(verts: np.ndarray, tris: np.ndarray, uvs: np.ndarray,
                    normals: Optional[np.ndarray] = None) -> np.ndarray:
    """Per-vertex tangents from UVs (reference geometry/utils.py
    Mesh._compute_vertex_tangent): per-face tangent from the UV Jacobian,
    accumulated per vertex, then Gram-Schmidt-orthogonalized against the
    normal.  Needed for normal-mapped textured OBJ export."""
    verts = np.asarray(verts, np.float64).reshape(-1, 3)
    tris = np.asarray(tris, np.int64).reshape(-1, 3)
    uvs = np.asarray(uvs, np.float64).reshape(-1, 2)
    if normals is None:
        normals = vertex_normals(verts, tris)
    normals = np.asarray(normals, np.float64).reshape(-1, 3)

    e1 = verts[tris[:, 1]] - verts[tris[:, 0]]
    e2 = verts[tris[:, 2]] - verts[tris[:, 0]]
    du1 = uvs[tris[:, 1]] - uvs[tris[:, 0]]
    du2 = uvs[tris[:, 2]] - uvs[tris[:, 0]]
    det = du1[:, 0] * du2[:, 1] - du1[:, 1] * du2[:, 0]
    r = np.where(np.abs(det) > 1e-20, 1.0 / np.where(det == 0, 1.0, det), 0.0)
    tang = (e1 * du2[:, 1:2] - e2 * du1[:, 1:2]) * r[:, None]
    vt = np.zeros_like(verts)
    for c in range(3):
        np.add.at(vt, tris[:, c], tang)
    # orthogonalize against the normal
    vt = vt - normals * np.sum(vt * normals, axis=-1, keepdims=True)
    norm = np.linalg.norm(vt, axis=-1, keepdims=True)
    fallback = np.cross(normals, np.array([0.0, 1.0, 0.0]))
    fb_norm = np.linalg.norm(fallback, axis=-1, keepdims=True)
    fallback = np.where(fb_norm > 1e-6, fallback / np.maximum(fb_norm, 1e-20),
                        np.array([1.0, 0.0, 0.0]))
    vt = np.where(norm > 1e-10, vt / np.maximum(norm, 1e-20), fallback)
    return vt.astype(np.float32)


def spherical_uvs(verts: np.ndarray,
                  center: Optional[np.ndarray] = None) -> np.ndarray:
    """Simple spherical-projection UV parameterization for quick textured
    export when no atlas exists (the reference relies on external tools
    for unwrapping; this gives a dependency-free default)."""
    verts = np.asarray(verts, np.float64).reshape(-1, 3)
    if center is None:
        center = verts.mean(axis=0)
    d = verts - center
    r = np.linalg.norm(d, axis=-1)
    u = 0.5 + np.arctan2(d[:, 2], d[:, 0]) / (2.0 * np.pi)
    v = 0.5 + np.arcsin(np.clip(d[:, 1] / np.maximum(r, 1e-20), -1, 1)) / np.pi
    return np.stack([u, v], axis=-1).astype(np.float32)
