"""UV unwrap + texture bake tests (reference mesh_exporter.py:43-137)."""

import os

import numpy as np
import pytest

import scaledreamer_tpu as sd
from scaledreamer_tpu.models.isosurface import marching_tetrahedra_numpy
from scaledreamer_tpu.models.mesh import (Mesh, bake_texture,
                                          box_projection_unwrap)

sd.ensure_builtins()


def _sphere_mesh(R=24, radius=0.55):
    ax = np.linspace(-1, 1, R, dtype=np.float32)
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1)
    field = np.linalg.norm(g, axis=-1) - radius
    verts, faces = marching_tetrahedra_numpy(field)
    verts = verts / (R - 1) * 2.0 - 1.0
    return Mesh(verts.astype(np.float32), faces)


def test_box_projection_unwrap_properties():
    mesh = _sphere_mesh()
    mesh_uv, uv = box_projection_unwrap(mesh)
    # all UVs in [0, 1]
    assert uv.min() >= 0.0 and uv.max() <= 1.0
    # positions preserved (duplication only)
    assert mesh_uv.v_pos.shape[0] >= mesh.v_pos.shape[0]
    assert mesh_uv.t_pos_idx.shape == mesh.t_pos_idx.shape
    # every face's UV triangle is non-degenerate (injective projection)
    f = mesh_uv.t_pos_idx
    a, b, c = uv[f[:, 0]], uv[f[:, 1]], uv[f[:, 2]]
    area2 = np.abs((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
                   - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]))
    assert (area2 > 1e-12).all()
    # surface area is preserved by the duplication
    def total_area(m):
        v = m.v_pos[m.t_pos_idx]
        return np.linalg.norm(
            np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=-1).sum()
    np.testing.assert_allclose(total_area(mesh_uv), total_area(mesh),
                               rtol=1e-5)


def test_vertex_tangents_orthogonal_to_normals():
    from scaledreamer_tpu.models.mesh import vertex_tangents
    mesh = _sphere_mesh(16)
    mesh_uv, uv = box_projection_unwrap(mesh)
    t = vertex_tangents(mesh_uv, uv)
    assert t.shape == mesh_uv.v_pos.shape
    n = mesh_uv.v_normal
    dots = np.abs(np.sum(t * n, axis=-1))
    assert np.median(dots) < 1e-4  # Gram-Schmidt orthogonality
    lens = np.linalg.norm(t, axis=-1)
    assert (np.abs(lens[lens > 0.5] - 1.0) < 1e-4).all()


def test_bake_texture_samples_world_positions():
    mesh = _sphere_mesh(16)
    mesh_uv, uv = box_projection_unwrap(mesh)

    # color = position-derived: red channel encodes x in [-1,1] -> [0,1]
    def color_fn(p):
        return np.clip(np.stack([
            p[:, 0] * 0.5 + 0.5, p[:, 1] * 0.5 + 0.5,
            p[:, 2] * 0.5 + 0.5], -1), 0, 1)

    tex = bake_texture(mesh_uv, uv, color_fn, size=128)
    assert tex.shape == (128, 128, 3)
    assert tex.max() > 0.55 and tex.min() >= 0.0
    # covered texels should span the color range (sphere spans x in +-0.55)
    assert tex[..., 0].max() - tex[..., 0].min() > 0.3


def test_textured_export_end_to_end(tmp_path):
    """--export with save_texture writes obj + mtl + image, and the obj
    references them (reference mesh_exporter.py obj+mtl contract)."""
    import jax
    from scaledreamer_tpu.core.config import parse_structured

    cls = sd.find("scaledreamer-system")
    system = cls(cfg=parse_structured(cls.Config, {
        "geometry_type": "implicit-volume",
        "geometry": {
            "radius": 1.0, "density_bias": "blob_magic3d",
            "density_activation": "softplus",
            "density_blob_scale": 10.0, "density_blob_std": 0.5,
            "normal_type": "analytic",
            "pos_encoding_config": {
                "otype": "HashGrid", "n_levels": 4,
                "n_features_per_level": 2, "log2_hashmap_size": 8,
                "base_resolution": 4, "per_level_scale": 1.5}},
        "material_type": "no-material",
        "material": {"color_activation": "sigmoid"},
        "background_type": "solid-color-background",
        "renderer_type": "nerf-volume-renderer",
        "renderer": {"radius": 1.0, "num_samples_per_ray": 8,
                     "estimator": "importance",
                     "num_samples_per_ray_importance": 8},
        "optimizer": {"name": "Adam", "args": {"lr": 1e-3}},
    }))
    dm_cls = sd.find("random-camera-datamodule")
    dm = dm_cls(cfg=parse_structured(dm_cls.Config, {
        "batch_size": 1, "width": 8, "height": 8}), seed=0)
    dm.setup("fit")
    rng = jax.random.PRNGKey(0)
    batch = dm.train_batch()
    state = system.init_state(rng, batch)

    Exp = sd.find("mesh-exporter")
    exporter = Exp(cfg=parse_structured(Exp.Config, {
        "save_texture": True, "texture_size": 64, "texture_format": "png",
        "isosurface_resolution": 24}))
    # density blob at init -> non-empty isosurface at threshold ~5
    system.geometry.cfg.isosurface_threshold = 5.0
    outputs = exporter(system, state, str(tmp_path))
    assert len(outputs) == 3
    obj_path, tex_path, mtl_path = outputs
    assert os.path.exists(obj_path) and os.path.exists(tex_path) \
        and os.path.exists(mtl_path)
    obj = open(obj_path).read()
    assert "mtllib" in obj and "vt " in obj and "f " in obj
    mtl = open(mtl_path).read()
    assert os.path.basename(tex_path) in mtl
    import imageio.v2 as imageio
    img = imageio.imread(tex_path)
    assert img.shape == (64, 64, 3)
