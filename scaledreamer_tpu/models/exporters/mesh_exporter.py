"""`mesh-exporter` / `dummy-exporter`: isosurface -> textured OBJ.

Parity target: reference `threestudio/models/exporters/mesh_exporter.py:17-175`
— isosurface -> (xatlas UV unwrap + nvdiffrast texture bake) -> obj+mtl.
TPU-native replacement (SURVEY.md §2.3 N3/N4): marching tetrahedra
(models/isosurface.py, native C++ kernel) + either per-vertex colors
(`save_texture: false`, the default) or the full texture pipeline
(`save_texture: true`): box-projection UV unwrap + pure-XLA UV
rasterization bake + dilation inpaint -> obj + mtl + albedo image
(models/mesh.py `box_projection_unwrap` / `bake_texture`).
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Optional

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
        isosurface_coarse_to_fine: bool = True
        # amortized generators only: which prompt's radiance field to
        # export (the space_cache is generated from this prompt with zero
        # noise). BEYOND REFERENCE: the reference's predict path cannot
        # export its generators at all (forward_field needs a space_cache
        # it never builds).
        prompt: Optional[str] = None

    cfg: Config

    def __call__(self, system, state, save_dir: str,
                 space_cache=None) -> list:
        geometry = system.geometry
        cfg_geo = geometry.cfg
        radius = cfg_geo.radius
        helper = IsosurfaceHelper(self.cfg.isosurface_resolution)

        geo_params = {"params": state.params["geometry"]}
        chunk = 262144
        threshold = getattr(cfg_geo, "isosurface_threshold", 0.0)
        # SDF fields: level = field - thr; density fields: -(field - thr)
        is_sdf = hasattr(geometry, "forward_sdf") or \
            hasattr(type(geometry), "forward_sdf")

        @jax.jit
        def eval_field(p):
            if space_cache is not None:
                field, _ = geometry.apply(
                    geo_params, p[None], space_cache,
                    method=geometry.forward_field)
                field = field[0]
            else:
                field, _ = geometry.apply(geo_params, p,
                                          method=geometry.forward_field)
            return field

        def extract(bbox_min, bbox_max):
            pts = helper.grid_vertices(bbox_min, bbox_max)
            fields = []
            for i in range(0, pts.shape[0], chunk):
                p = jnp.asarray(pts[i:i + chunk])
                fields.append(np.asarray(eval_field(p))[..., 0])
            field = np.concatenate(fields)
            if threshold == "auto":
                # reference geometry/base.py:145-152: mean positive density
                eps = 1e-5
                pos = field[field > eps]
                thr = float(pos.mean()) if pos.size else 0.0
                logger.info("Automatically determined isosurface "
                            "threshold: %.5f", thr)
            else:
                thr = float(threshold)
            level = (field - thr) if is_sdf else -(field - thr)
            return helper.extract(level, bbox_min, bbox_max)

        bbox_min = np.asarray([-radius] * 3, np.float32)
        bbox_max = np.asarray([radius] * 3, np.float32)
        if self.cfg.isosurface_coarse_to_fine:
            # coarse pass -> tight bbox (+10% margin) -> fine pass
            # (reference geometry/base.py:171-186)
            verts, faces = extract(bbox_min, bbox_max)
            if verts.shape[0]:
                vmin, vmax = verts.min(axis=0), verts.max(axis=0)
                margin = (vmax - vmin) * 0.1
                bbox_min = np.maximum(vmin - margin, bbox_min)
                bbox_max = np.minimum(vmax + margin, bbox_max)
        verts, faces = extract(bbox_min, bbox_max)
        if verts.shape[0] == 0:
            logger.warning("Empty isosurface; nothing exported")
            return []
        mesh = Mesh(verts, faces)
        if getattr(cfg_geo, "isosurface_remove_outliers", False):
            mesh = mesh.remove_outliers(
                getattr(cfg_geo, "isosurface_outlier_n_faces_threshold",
                        0.01))

        def _export_out(p):
            if space_cache is not None:
                return geometry.apply(geo_params, p[None], space_cache,
                                      method=geometry.export)
            return geometry.apply(geo_params, p, method=geometry.export)

        # Feature-less geometries export an UNcolored OBJ (reference
        # mesh_exporter.py behavior) rather than all-black vertex colors;
        # probe the export signature without computing anything.
        probe = jax.eval_shape(
            _export_out, jax.ShapeDtypeStruct((8, 3), jnp.float32))
        has_features = probe.get("features") is not None

        @jax.jit
        def eval_color_points(p):
            """[N, 3] world points -> [N, 3] albedo."""
            out = _export_out(p)
            feats = out["features"]
            mat_out = system.material.apply(
                {"params": state.params.get("material", {})},
                features=feats.reshape(-1, feats.shape[-1]),
                method=system.material.export)
            return mat_out["albedo"]

        def _color_points(points_np):
            outs = []
            for i in range(0, len(points_np), chunk):
                outs.append(np.asarray(eval_color_points(
                    jnp.asarray(points_np[i:i + chunk]))))
            return (np.concatenate(outs) if outs
                    else np.zeros((0, 3), np.float32))

        color_fn = _color_points if has_features else None

        out_path = os.path.join(save_dir, f"{self.cfg.save_name}.obj")
        outputs = [out_path]

        if self.cfg.save_texture and color_fn is None:
            logger.warning("save_texture requested but the geometry exports "
                           "no features; writing an uncolored OBJ instead")
        if self.cfg.save_texture and color_fn is not None:
            # UV unwrap + texture bake + obj/mtl/image (reference
            # mesh_exporter.py:43-137 xatlas+nvdiffrast path)
            from ..mesh import bake_texture, box_projection_unwrap
            mesh_uv, uv = box_projection_unwrap(mesh)
            tex = bake_texture(mesh_uv, uv, color_fn,
                               size=self.cfg.texture_size)
            fmt = self.cfg.texture_format
            tex_path = os.path.join(
                save_dir, f"{self.cfg.save_name}_albedo.{fmt}")
            os.makedirs(save_dir, exist_ok=True)
            import imageio.v2 as imageio
            imageio.imwrite(tex_path, (tex * 255).astype(np.uint8))
            write_obj(out_path, mesh_uv, v_uv=uv, texture_path=tex_path,
                      save_normal=self.cfg.save_normal)
            mtl_path = os.path.splitext(out_path)[0] + ".mtl"
            outputs += [tex_path, mtl_path]
            logger.info("Exported textured mesh: %s (+%s, %s)", out_path,
                        os.path.basename(mtl_path),
                        os.path.basename(tex_path))
            return outputs

        v_rgb = None
        if self.cfg.save_vertex_color and color_fn is not None:
            v_rgb = color_fn(mesh.v_pos)
            if v_rgb.shape[0] != mesh.v_pos.shape[0]:
                v_rgb = None

        write_obj(out_path, mesh, v_rgb=v_rgb,
                  save_normal=self.cfg.save_normal)
        logger.info("Exported mesh: %s (%d verts, %d faces)", out_path,
                    mesh.v_pos.shape[0], mesh.t_pos_idx.shape[0])
        return outputs


@register("dummy-exporter")
class DummyExporter(BaseObject):
    @dataclass
    class Config:
        pass

    def __call__(self, *args, **kwargs):
        return []


def run_export(system, state, cfg, save_dir: str):
    """Launcher hook (reference systems/base.py:317-342 predict path).

    Amortized systems additionally need a per-prompt space_cache;
    `system.exporter.prompt="..."` selects which prompt to export (beyond
    the reference, whose predict path cannot export its generators)."""
    from ...core.config import parse_structured
    from ... import find

    exp_type = cfg.system.get("exporter_type", "mesh-exporter")
    exp_cls = find(exp_type)
    exporter = exp_cls(cfg=parse_structured(
        exp_cls.Config, cfg.system.get("exporter", {})))
    space_cache = None
    needs_cache = hasattr(system, "build_space_cache_for_prompt") and \
        hasattr(system.geometry, "generate_space_cache")
    if needs_cache:
        prompt = getattr(exporter.cfg, "prompt", None)
        if not prompt:
            raise ValueError(
                "exporting an amortized generator needs a prompt: set "
                'system.exporter.prompt="..." (the space_cache is built '
                "from its embedding with zero noise)")
        noise_dim = int((cfg.data or {}).get("dim_gaussian", 16))
        space_cache = system.build_space_cache_for_prompt(
            state, prompt, noise_dim=noise_dim)
        logger.info("Exporting amortized field for prompt %r", prompt)
    kwargs = {"space_cache": space_cache} if space_cache is not None else {}
    return exporter(system, state, os.path.join(save_dir, "export"),
                    **kwargs)
