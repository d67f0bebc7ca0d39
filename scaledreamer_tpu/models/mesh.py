"""Mesh container: normals, laplacian/normal-consistency, OBJ export.

Parity target: reference `threestudio/models/mesh.py:12-309` (vertex
normals, uniform Laplacian, normal-consistency loss, outlier removal) and
the OBJ+MTL writer from `threestudio/utils/saving.py` (SaverMixin.save_obj).
NumPy implementation — the export path is offline (SURVEY.md §7.2 step 11);
training-time mesh losses (geometry/texture stages) can reuse the same
formulas in jnp when those stages land.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class Mesh:
    def __init__(self, v_pos: np.ndarray, t_pos_idx: np.ndarray, **extras):
        self.v_pos = np.asarray(v_pos, np.float32)
        self.t_pos_idx = np.asarray(t_pos_idx, np.int32)
        self.extras = extras
        self._v_normal = None

    @property
    def v_normal(self) -> np.ndarray:
        if self._v_normal is None:
            self._v_normal = self._compute_vertex_normals()
        return self._v_normal

    def _compute_vertex_normals(self) -> np.ndarray:
        i0, i1, i2 = (self.t_pos_idx[:, 0], self.t_pos_idx[:, 1],
                      self.t_pos_idx[:, 2])
        v0, v1, v2 = self.v_pos[i0], self.v_pos[i1], self.v_pos[i2]
        fn = np.cross(v1 - v0, v2 - v0)
        vn = np.zeros_like(self.v_pos)
        for idx in (i0, i1, i2):
            np.add.at(vn, idx, fn)
        norm = np.linalg.norm(vn, axis=-1, keepdims=True)
        return vn / np.maximum(norm, 1e-20)

    def laplacian(self) -> float:
        """Mean uniform-Laplacian magnitude (reference mesh.py laplacian)."""
        V = self.v_pos.shape[0]
        nbr_sum = np.zeros_like(self.v_pos)
        nbr_cnt = np.zeros((V, 1), np.float32)
        edges = np.concatenate([
            self.t_pos_idx[:, [0, 1]], self.t_pos_idx[:, [1, 2]],
            self.t_pos_idx[:, [2, 0]]], axis=0)
        for a, b in ((0, 1), (1, 0)):
            np.add.at(nbr_sum, edges[:, a], self.v_pos[edges[:, b]])
            np.add.at(nbr_cnt, edges[:, a], 1.0)
        lap = self.v_pos - nbr_sum / np.maximum(nbr_cnt, 1.0)
        return float(np.linalg.norm(lap, axis=-1).mean())

    def normal_consistency(self) -> float:
        """Mean (1 - cos) between normals of edge-adjacent faces
        (reference mesh.py normal_consistency)."""
        faces = self.t_pos_idx
        fn = np.cross(self.v_pos[faces[:, 1]] - self.v_pos[faces[:, 0]],
                      self.v_pos[faces[:, 2]] - self.v_pos[faces[:, 0]])
        fn = fn / np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True),
                             1e-20)
        edge_map = {}
        total, count = 0.0, 0
        for fi, f in enumerate(faces):
            for a, b in ((0, 1), (1, 2), (2, 0)):
                key = (min(f[a], f[b]), max(f[a], f[b]))
                if key in edge_map:
                    other = edge_map[key]
                    total += 1.0 - float(np.dot(fn[fi], fn[other]))
                    count += 1
                else:
                    edge_map[key] = fi
        return total / max(count, 1)

    def remove_outliers(self, n_faces_threshold=0.01) -> "Mesh":
        """Keep only the largest connected component(s)
        (reference mesh.py remove_outlier via trimesh; union-find here)."""
        V = self.v_pos.shape[0]
        parent = np.arange(V)

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for f in self.t_pos_idx:
            a, b, c = (find(f[0]), find(f[1]), find(f[2]))
            parent[b] = a
            parent[c] = a
        roots = np.array([find(i) for i in range(V)])
        face_roots = roots[self.t_pos_idx[:, 0]]
        uniq, counts = np.unique(face_roots, return_counts=True)
        if isinstance(n_faces_threshold, float):
            # fraction of total faces (reference semantics)
            keep_roots = uniq[counts >= n_faces_threshold
                              * self.t_pos_idx.shape[0]]
        else:
            keep_roots = uniq[counts >= n_faces_threshold]
        keep_faces = np.isin(face_roots, keep_roots)
        return reindex_mesh(self.v_pos, self.t_pos_idx[keep_faces])


def reindex_mesh(v_pos, faces) -> Mesh:
    used = np.unique(faces)
    remap = -np.ones(v_pos.shape[0], np.int64)
    remap[used] = np.arange(used.shape[0])
    return Mesh(v_pos[used], remap[faces])


def vertex_tangents(mesh: Mesh, uv: np.ndarray) -> np.ndarray:
    """Per-vertex tangents from UVs (reference mesh.py _compute_vertex_tangent
    via nvdiffrec's formulation): accumulate per-face tangents weighted by
    the UV-area denominator, then Gram-Schmidt against the vertex normal."""
    v, f = mesh.v_pos, mesh.t_pos_idx
    p0, p1, p2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    t0, t1, t2 = uv[f[:, 0]], uv[f[:, 1]], uv[f[:, 2]]
    e1, e2 = p1 - p0, p2 - p0
    u1, u2 = t1 - t0, t2 - t0
    denom = u1[:, 0] * u2[:, 1] - u1[:, 1] * u2[:, 0]
    denom = np.where(np.abs(denom) < 1e-12,
                     np.where(denom < 0, -1e-12, 1e-12), denom)
    tang = (e1 * u2[:, 1:2] - e2 * u1[:, 1:2]) / denom[:, None]
    acc = np.zeros_like(v)
    for k in range(3):
        np.add.at(acc, f[:, k], tang)
    n = mesh.v_normal
    acc = acc - n * np.sum(acc * n, axis=-1, keepdims=True)
    norm = np.linalg.norm(acc, axis=-1, keepdims=True)
    return acc / np.maximum(norm, 1e-20)


def box_projection_unwrap(mesh: Mesh, padding: float = 0.02):
    """UV-unwrap by box projection: 6 charts (one per dominant normal axis
    direction), packed into a 3x2 atlas grid.

    TPU-native stand-in for the reference's xatlas unwrap
    (threestudio/models/mesh.py `unwrap_uv` / exporters/mesh_exporter.py:
    60-75): xatlas is a C++ dependency not present here, and box projection
    is the standard fallback — charts are injective per face (a face's UV
    triangle never degenerates since its normal is dominant along the
    projection axis). Vertices shared between charts are duplicated so the
    OBJ vt table stays 1:1 with positions.

    Returns (new_mesh, uv [V', 2] in [0, 1]).
    """
    v, faces = mesh.v_pos, mesh.t_pos_idx
    fn = np.cross(v[faces[:, 1]] - v[faces[:, 0]],
                  v[faces[:, 2]] - v[faces[:, 0]])
    axis = np.abs(fn).argmax(axis=-1)                       # [F] in 0..2
    sign = np.take_along_axis(fn, axis[:, None], 1)[:, 0] >= 0
    chart = axis * 2 + sign.astype(np.int64)                # [F] in 0..5

    # duplicate vertices per (vertex, chart)
    key = faces.astype(np.int64) * 6 + chart[:, None]       # [F, 3]
    uniq, inv = np.unique(key.reshape(-1), return_inverse=True)
    new_faces = inv.reshape(-1, 3).astype(np.int32)
    src_vid = (uniq // 6).astype(np.int64)
    src_chart = (uniq % 6).astype(np.int64)
    new_v = v[src_vid]

    # project each chart onto the plane orthogonal to its axis
    drop = src_chart // 2
    keep = np.stack([(drop + 1) % 3, (drop + 2) % 3], axis=-1)  # [V', 2]
    uv = np.take_along_axis(new_v, keep, axis=1).astype(np.float64)
    # mirror one coordinate for negative-facing charts so UVs keep the
    # face winding (texture not flipped)
    neg = (src_chart % 2) == 0
    uv[neg, 0] = -uv[neg, 0]

    # normalize per chart and pack into a 3x2 grid
    cell_w, cell_h = 1.0 / 3.0, 1.0 / 2.0
    for c in range(6):
        m = src_chart == c
        if not m.any():
            continue
        lo = uv[m].min(axis=0)
        ext = uv[m].max(axis=0) - lo
        ext = np.maximum(ext, 1e-9)
        s = (1.0 - 2 * padding) / ext.max()                 # uniform scale
        local = (uv[m] - lo) * s + padding
        cx, cy = c % 3, c // 3
        uv[m] = local * [cell_w, cell_h] + [cx * cell_w, cy * cell_h]
    return Mesh(new_v, new_faces), uv.astype(np.float32)


def bake_texture(mesh: Mesh, uv: np.ndarray, color_fn, size: int = 1024,
                 fill_iters: int = 8) -> np.ndarray:
    """Rasterize the UV atlas and sample colors at covered texels.

    Replaces the reference's nvdiffrast UV rasterization + cv2 inpaint
    (threestudio/models/exporters/mesh_exporter.py:76-137): the texel->3D
    map comes from the pure-XLA rasterizer run in UV space, colors from
    `color_fn(positions [N, 3]) -> [N, 3]`, and seam padding from iterative
    neighbor-mean dilation.
    """
    import jax.numpy as jnp

    from ..ops.rasterize import interpolate, rasterize

    V = uv.shape[0]
    # UV -> clip: u right; texel row = v * size under the rasterizer's
    # +y_ndc -> increasing-row convention (ops/rasterize.py), so
    # y_ndc = 2v - 1
    v_clip = np.stack([uv[:, 0] * 2.0 - 1.0, 2.0 * uv[:, 1] - 1.0,
                       np.zeros(V, np.float32), np.ones(V, np.float32)],
                      axis=-1)
    rast = rasterize(jnp.asarray(v_clip), jnp.asarray(mesh.t_pos_idx),
                     jnp.ones((mesh.t_pos_idx.shape[0],), bool), size, size)
    pos = interpolate(jnp.asarray(mesh.v_pos), rast,
                      jnp.asarray(mesh.t_pos_idx))
    mask = np.asarray(rast.mask)
    positions = np.asarray(pos).reshape(-1, 3)

    colors = np.asarray(color_fn(positions[mask.reshape(-1)]))
    img = np.zeros((size * size, 3), np.float32)
    img[mask.reshape(-1)] = colors
    img = img.reshape(size, size, 3)

    # dilation inpaint: fill empty texels from covered neighbors
    filled = mask.copy()
    for _ in range(fill_iters):
        if filled.all():
            break
        acc = np.zeros_like(img)
        cnt = np.zeros((size, size), np.float32)
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            sh = np.roll(img, (dy, dx), axis=(0, 1))
            shm = np.roll(filled, (dy, dx), axis=(0, 1))
            acc += sh * shm[..., None]
            cnt += shm
        new = ~filled & (cnt > 0)
        img[new] = acc[new] / cnt[new][..., None]
        filled |= new
    return np.clip(img, 0.0, 1.0)


def write_obj(path: str, mesh: Mesh,
              v_rgb: Optional[np.ndarray] = None,
              v_uv: Optional[np.ndarray] = None,
              texture_path: Optional[str] = None,
              save_normal: bool = True) -> None:
    """OBJ (+ MTL if textured) writer (reference saving.py save_obj)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    mtl_path = os.path.splitext(path)[0] + ".mtl"
    with open(path, "w") as f:
        if texture_path is not None:
            f.write(f"mtllib {os.path.basename(mtl_path)}\n")
            f.write("usemtl material_0\n")
        for i, v in enumerate(mesh.v_pos):
            if v_rgb is not None:
                c = v_rgb[i]
                f.write(f"v {v[0]} {v[1]} {v[2]} {c[0]} {c[1]} {c[2]}\n")
            else:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        if v_uv is not None:
            for uv in v_uv:
                f.write(f"vt {uv[0]} {1.0 - uv[1]}\n")
        if save_normal:
            for n in mesh.v_normal:
                f.write(f"vn {n[0]} {n[1]} {n[2]}\n")
        for t in mesh.t_pos_idx + 1:
            if v_uv is not None and save_normal:
                f.write(f"f {t[0]}/{t[0]}/{t[0]} {t[1]}/{t[1]}/{t[1]} "
                        f"{t[2]}/{t[2]}/{t[2]}\n")
            elif save_normal:
                f.write(f"f {t[0]}//{t[0]} {t[1]}//{t[1]} {t[2]}//{t[2]}\n")
            else:
                f.write(f"f {t[0]} {t[1]} {t[2]}\n")
    if texture_path is not None:
        with open(mtl_path, "w") as f:
            f.write("newmtl material_0\n")
            f.write("Ka 1.000 1.000 1.000\nKd 1.000 1.000 1.000\n")
            f.write("Ks 0.000 0.000 0.000\n")
            f.write(f"map_Kd {os.path.basename(texture_path)}\n")
