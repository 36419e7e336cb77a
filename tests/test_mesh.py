"""Native mesher tests: sphere SDF golden test, density field, end-to-end
Gaussian -> mesh extraction."""

import numpy as np
import pytest

from open_diffusiongs_tpu.ops.gaussians import NumpyGaussians
from open_diffusiongs_tpu.ops.mesh import (extract_mesh,
                                           gaussian_density_grid,
                                           largest_component, marching_tets,
                                           save_mesh_obj)


def _sphere_grid(res=48, r=0.6):
    lin = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return (r - np.sqrt(x * x + y * y + z * z)).astype(np.float32)


def test_marching_tets_sphere():
    res = 48
    grid = _sphere_grid(res)
    verts, tris = marching_tets(grid, 0.0)
    assert len(verts) > 100 and len(tris) > 100
    # vertices lie on the r=0.6 sphere (in grid coords)
    w = verts / (res - 1) * 2 - 1
    rad = np.linalg.norm(w, axis=1)
    assert abs(rad.mean() - 0.6) < 0.02
    assert rad.std() < 0.02
    # all triangle indices valid
    assert tris.min() >= 0 and tris.max() < len(verts)
    # welded: every vertex used
    assert len(np.unique(tris)) == len(verts)
    # watertight-ish: every edge shared by exactly 2 triangles
    edges = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]],
                            tris[:, [0, 2]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.99


def test_largest_component():
    g1 = _sphere_grid(32, 0.5)
    # two disjoint spheres
    lin = np.linspace(-1, 1, 32, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    small = 0.15 - np.sqrt((x - 0.75) ** 2 + (y - 0.75) ** 2 + (z - 0.75) ** 2)
    grid = np.maximum(g1, small).astype(np.float32)
    verts, tris = marching_tets(grid, 0.0)
    v2, t2 = largest_component(verts, tris)
    assert len(t2) < len(tris)
    w = v2 / 31 * 2 - 1
    assert np.linalg.norm(w, axis=1).max() < 0.6  # small sphere removed


def test_density_grid_peak_at_gaussian():
    g = NumpyGaussians(
        xyz=np.asarray([[0.2, -0.1, 0.3], [-0.4, 0.2, -0.2]], np.float32),
        features=np.zeros((2, 1, 3), np.float32),
        scaling=np.full((2, 3), -2.0, np.float32),
        rotation=np.tile(np.asarray([1, 0, 0, 0], np.float32), (2, 1)),
        opacity=np.full((2, 1), 3.0, np.float32))
    grid, center, scale = gaussian_density_grid(g, resolution=32,
                                                max_per_block=16)
    assert grid.max() > 0.5
    # peak location ~ first or second gaussian
    idx = np.unravel_index(np.argmax(grid), grid.shape)
    world = (np.asarray(idx) / 31 * 2 - 1) / scale + center
    d = np.linalg.norm(g.xyz - world, axis=1).min()
    assert d < 0.15


@pytest.mark.slow
def test_extract_mesh_end_to_end(tmp_path):
    rng = np.random.default_rng(0)
    # cloud of gaussians inside a 0.3-radius ball -> mesh around it
    n = 300
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    pts = dirs * rng.uniform(0, 0.3, (n, 1))
    g = NumpyGaussians(
        xyz=pts.astype(np.float32),
        features=np.zeros((n, 1, 3), np.float32),
        scaling=np.full((n, 3), -3.0, np.float32),
        rotation=np.tile(np.asarray([1, 0, 0, 0], np.float32), (n, 1)),
        opacity=np.full((n, 1), 2.0, np.float32))
    verts, tris = extract_mesh(g, density_thresh=0.05, resolution=64)
    assert len(verts) > 50 and len(tris) > 50
    assert np.linalg.norm(verts, axis=1).max() < 0.6
    path = str(tmp_path / "m.obj")
    save_mesh_obj(path, verts, tris)
    head = open(path).readline()
    assert head.startswith("v ")


def test_decimate_mesh():
    from open_diffusiongs_tpu.ops.mesh import decimate_mesh
    grid = _sphere_grid(64, 0.6)
    verts, tris = marching_tets(grid, 0.0)
    assert len(tris) > 4000
    v2, t2 = decimate_mesh(verts, tris, target_tris=1000)
    assert len(t2) <= max(1500, len(tris) // 3)
    # still a sphere-ish shell
    w = v2 / 63 * 2 - 1
    rad = np.linalg.norm(w, axis=1)
    assert abs(rad.mean() - 0.6) < 0.05


def test_quadric_decimation_quality():
    """Quadric edge-collapse must hit the triangle budget while keeping the
    surface tight: on a sphere, max radial deviation stays small (the old
    vertex-clustering path is far coarser at the same budget)."""
    from open_diffusiongs_tpu.ops.mesh import decimate_mesh
    grid = _sphere_grid(64, 0.6)
    verts, tris = marching_tets(grid, 0.0)
    v2, t2 = decimate_mesh(verts, tris, target_tris=800)
    assert len(t2) <= 800
    assert len(t2) > 300            # didn't collapse to nothing
    w = v2 / 63 * 2 - 1
    rad = np.linalg.norm(w, axis=1)
    # every vertex within 5% of the true radius (quadric keeps the surface)
    assert np.abs(rad - 0.6).max() < 0.03, np.abs(rad - 0.6).max()
    assert abs(rad.mean() - 0.6) < 0.01


def test_clean_mesh_removes_junk():
    """clean_mesh = merge close vertices + drop duplicate/degenerate faces
    + remove small components (utils/mesh_utils.py:88-146 semantics)."""
    from open_diffusiongs_tpu.ops.mesh import clean_mesh
    grid = _sphere_grid(64, 0.6)
    verts, tris = marching_tets(grid, 0.0)
    n0 = len(tris)
    # junk: a duplicate face (reordered), a degenerate face, a far-away
    # tiny component (2 faces), and a near-duplicate vertex chain
    dup = tris[0][[1, 2, 0]][None]
    degen = np.array([[tris[0][0], tris[0][0], tris[0][1]]], np.int32)
    far = np.array([[200.0, 200, 200], [200.5, 200, 200],
                    [200, 200.5, 200], [200.5, 200.5, 200]], np.float32)
    far_f = np.array([[0, 1, 2], [1, 3, 2]], np.int32) + len(verts)
    verts2 = np.concatenate([verts, far]).astype(np.float32)
    tris2 = np.concatenate([tris, dup, degen, far_f]).astype(np.int32)

    v3, t3 = clean_mesh(verts2, tris2, v_pct=0.01, min_f=8, min_d=5.0)
    # all junk removed, sphere body kept
    assert len(t3) <= n0
    assert len(t3) > n0 * 0.8
    w = v3 / 63 * 2 - 1
    rad = np.linalg.norm(w, axis=1)
    assert rad.max() < 0.75          # far component gone
    # no duplicate faces remain
    key = np.sort(t3, axis=1)
    uniq = np.unique(key, axis=0)
    assert len(uniq) == len(t3)
    # no degenerate faces
    assert (t3[:, 0] != t3[:, 1]).all() and (t3[:, 1] != t3[:, 2]).all()


def test_clean_mesh_merges_close_vertices():
    from open_diffusiongs_tpu.ops.mesh import clean_mesh
    # two triangles sharing an edge only up to epsilon-duplicated vertices
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                      [1.0001, 0, 0], [0.0001, 1, 0], [1, 1, 0]], np.float32)
    tris = np.array([[0, 1, 2], [3, 5, 4]], np.int32)
    v2, t2 = clean_mesh(verts, tris, v_pct=1.0, min_f=0, min_d=0.0)
    assert len(v2) == 4              # the two eps-pairs merged
    assert len(t2) == 2


def test_vertex_normals_sphere():
    """Normals on a sphere mesh must point radially outward."""
    import numpy as np
    from open_diffusiongs_tpu.ops import mesh as mesh_lib
    # icosphere-ish: marching tets over a sphere SDF
    res = 24
    g = np.mgrid[0:res, 0:res, 0:res].astype(np.float32)
    c = (res - 1) / 2.0
    d = 8.0 - np.sqrt(((g - c) ** 2).sum(0))  # inside > 0
    verts, tris = mesh_lib.marching_tets(d, 0.0)
    vn = mesh_lib.vertex_normals(verts, tris)
    radial = verts - c
    radial /= np.linalg.norm(radial, axis=-1, keepdims=True)
    cos = np.sum(vn * radial, axis=-1)
    assert np.mean(cos) > 0.97          # overwhelmingly outward
    assert np.all(np.abs(np.linalg.norm(vn, axis=-1) - 1.0) < 1e-5)


def test_vertex_tangents_orthogonal():
    import numpy as np
    from open_diffusiongs_tpu.ops import mesh as mesh_lib
    res = 20
    g = np.mgrid[0:res, 0:res, 0:res].astype(np.float32)
    c = (res - 1) / 2.0
    d = 6.0 - np.sqrt(((g - c) ** 2).sum(0))
    verts, tris = mesh_lib.marching_tets(d, 0.0)
    uvs = mesh_lib.spherical_uvs(verts)
    vn = mesh_lib.vertex_normals(verts, tris)
    vt = mesh_lib.vertex_tangents(verts, tris, uvs, vn)
    dot = np.abs(np.sum(vt * vn, axis=-1))
    assert np.max(dot) < 1e-4           # tangent _|_ normal
    assert np.all(np.abs(np.linalg.norm(vt, axis=-1) - 1.0) < 1e-4)
    assert uvs.min() >= 0.0 and uvs.max() <= 1.0


def test_repair_nonmanifold():
    """A fin face on an edge (3 faces on one edge) must be removed; a
    bow-tie vertex (two fans meeting at one vertex) must be split."""
    import numpy as np
    from open_diffusiongs_tpu.ops import mesh as mesh_lib
    # two triangles sharing edge (0,1) + a small third "fin" on it
    verts = np.array([[0, 0, 0], [1, 0, 0], [0.5, 1, 0], [0.5, -1, 0],
                      [0.5, 0, 0.1]], np.float32)
    tris = np.array([[0, 1, 2], [1, 0, 3], [0, 1, 4]], np.int32)
    v2, t2 = mesh_lib.repair_nonmanifold(verts, tris)
    assert len(t2) == 2          # the small fin dropped
    # bow-tie: two triangles sharing ONLY vertex 0
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0],
                      [-1, 0, 0], [-1, -1, 0]], np.float32)
    tris = np.array([[0, 1, 2], [0, 3, 4]], np.int32)
    v2, t2 = mesh_lib.repair_nonmanifold(verts, tris)
    assert len(t2) == 2
    assert len(v2) == 6          # vertex 0 duplicated for the second fan
    # no vertex index shared between the two faces any more
    assert len(set(t2[0]) & set(t2[1])) == 0


def test_remesh_isotropic_sphere():
    """Remeshing a coarse sphere toward a smaller edge length must keep the
    surface (radius preserved) while equalizing edge lengths."""
    import numpy as np
    from open_diffusiongs_tpu.ops import mesh as mesh_lib
    res = 20
    g = np.mgrid[0:res, 0:res, 0:res].astype(np.float32)
    c = (res - 1) / 2.0
    d = 6.0 - np.sqrt(((g - c) ** 2).sum(0))
    verts, tris = mesh_lib.marching_tets(d, 0.0)
    def edge_lengths(v, t):
        e = np.concatenate([v[t[:, 1]] - v[t[:, 0]],
                            v[t[:, 2]] - v[t[:, 1]],
                            v[t[:, 0]] - v[t[:, 2]]])
        return np.linalg.norm(e, axis=-1)

    target = 0.6
    v2, t2 = mesh_lib.remesh_isotropic(verts, tris, target_len=target,
                                       iterations=3)
    r = np.linalg.norm(v2 - c, axis=-1)
    assert abs(float(r.mean()) - 6.0) < 0.35   # surface preserved
    el0, el = edge_lengths(verts, tris), edge_lengths(v2, t2)
    # edge lengths regularized toward the target band [4/5 L, 4/3 L]
    in_band0 = np.mean((el0 > 0.8 * target) & (el0 < 4 / 3 * target))
    in_band = np.mean((el > 0.8 * target) & (el < 4 / 3 * target))
    assert in_band > in_band0 + 0.1
    assert abs(float(np.median(el)) - target) < 0.3 * target
    # soft upper bound: the last collapse pass can re-lengthen a few edges
    assert el.max() < 2.0 * target
    # still a closed surface: every edge shared by exactly 2 faces
    from collections import Counter
    cnt = Counter()
    for t in t2:
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            cnt[(min(a, b), max(a, b))] += 1
    assert set(cnt.values()) == {2}
