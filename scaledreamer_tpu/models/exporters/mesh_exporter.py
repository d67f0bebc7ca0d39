"""`mesh-exporter` / `dummy-exporter`: isosurface -> textured OBJ.

Parity target: reference `threestudio/models/exporters/mesh_exporter.py:17-175`
— isosurface -> (xatlas UV unwrap + nvdiffrast texture bake) -> obj+mtl.
TPU-native replacement (SURVEY.md §2.3 N3/N4): marching tetrahedra
(models/isosurface.py, native C++ kernel) + per-vertex color sampling.
Vertex-color export is the default (`save_texture: false` also exists in
the reference config surface); a UV-atlas bake can be layered on later
without changing this interface.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ... import register
from ...core.base import BaseObject
from ..isosurface import IsosurfaceHelper
from ..mesh import Mesh, write_obj

logger = logging.getLogger(__name__)


@register("mesh-exporter")
class MeshExporter(BaseObject):
    @dataclass
    class Config:
        fmt: str = "obj"
        save_name: str = "model"
        save_normal: bool = True
        save_vertex_color: bool = True
        save_texture: bool = False
        texture_size: int = 1024
        texture_format: str = "jpg"
        xatlas_chart_options: dict = None
        xatlas_pack_options: dict = None
        context_type: str = "cpu"
        isosurface_resolution: int = 128

    cfg: Config

    def __call__(self, system, state, save_dir: str,
                 space_cache=None) -> list:
        geometry = system.geometry
        cfg_geo = geometry.cfg
        radius = cfg_geo.radius
        helper = IsosurfaceHelper(self.cfg.isosurface_resolution)
        bbox_min = [-radius] * 3
        bbox_max = [radius] * 3
        pts = helper.grid_vertices(bbox_min, bbox_max)

        geo_params = {"params": state.params["geometry"]}
        chunk = 262144
        fields = []
        threshold = getattr(cfg_geo, "isosurface_threshold", 0.0)

        thr = threshold if isinstance(threshold, (int, float)) else 0.0
        # SDF fields: level = field - thr; density fields: -(field - thr)
        is_sdf = hasattr(geometry, "forward_sdf") or \
            hasattr(type(geometry), "forward_sdf")

        @jax.jit
        def eval_level(p):
            if space_cache is not None:
                field, _ = geometry.apply(
                    geo_params, p[None], space_cache,
                    method=geometry.forward_field)
                field = field[0]
            else:
                field, _ = geometry.apply(geo_params, p,
                                          method=geometry.forward_field)
            return (field - thr) if is_sdf else -(field - thr)

        for i in range(0, pts.shape[0], chunk):
            p = jnp.asarray(pts[i:i + chunk])
            fields.append(np.asarray(eval_level(p))[..., 0])
        field = np.concatenate(fields)

        verts, faces = helper.extract(field, bbox_min, bbox_max)
        if verts.shape[0] == 0:
            logger.warning("Empty isosurface; nothing exported")
            return []
        mesh = Mesh(verts, faces)
        if getattr(cfg_geo, "isosurface_remove_outliers", False):
            mesh = mesh.remove_outliers(
                getattr(cfg_geo, "isosurface_outlier_n_faces_threshold",
                        0.01))

        v_rgb = None
        if self.cfg.save_vertex_color:
            @jax.jit
            def eval_color(p):
                if space_cache is not None:
                    out = geometry.apply(geo_params, p[None], space_cache,
                                         method=geometry.export)
                else:
                    out = geometry.apply(geo_params, p,
                                         method=geometry.export)
                return out.get("features")

            feats = []
            vp = mesh.v_pos
            pad = (-len(vp)) % chunk if len(vp) > chunk else 0
            for i in range(0, len(vp), chunk):
                p = jnp.asarray(vp[i:i + chunk])
                f = eval_color(p)
                if f is not None:
                    feats.append(np.asarray(f).reshape(-1, f.shape[-1]))
            if feats:
                mat_out = system.material.apply(
                    {"params": state.params.get("material", {})},
                    features=jnp.asarray(np.concatenate(feats)),
                    method=system.material.export)
                v_rgb = np.asarray(mat_out["albedo"])[:len(vp)]

        out_path = os.path.join(save_dir, f"{self.cfg.save_name}.obj")
        write_obj(out_path, mesh, v_rgb=v_rgb,
                  save_normal=self.cfg.save_normal)
        logger.info("Exported mesh: %s (%d verts, %d faces)", out_path,
                    mesh.v_pos.shape[0], mesh.t_pos_idx.shape[0])
        return [out_path]


@register("dummy-exporter")
class DummyExporter(BaseObject):
    @dataclass
    class Config:
        pass

    def __call__(self, *args, **kwargs):
        return []


def run_export(system, state, cfg, save_dir: str):
    """Launcher hook (reference systems/base.py:317-342 predict path)."""
    from ...core.config import parse_structured
    from ... import find

    exp_type = cfg.system.get("exporter_type", "mesh-exporter")
    exp_cls = find(exp_type)
    exporter = exp_cls(cfg=parse_structured(
        exp_cls.Config, cfg.system.get("exporter", {})))
    return exporter(system, state, os.path.join(save_dir, "export"))
