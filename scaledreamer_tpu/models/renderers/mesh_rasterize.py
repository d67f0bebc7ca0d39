"""`mesh-rasterize-renderer`: differentiable mesh rendering for the
geometry/texture training stages.

Parity target: the reference's mesh stages (threestudio
systems/scaledreamer.py:105-166) render an in-graph isosurface of the SDF
with nvdiffrast and train on normal/rgb images plus mesh regularizers
(normal consistency, laplacian). The upstream fork ships the stage logic but
no mesh renderer (no config uses it); this renderer completes the path
TPU-natively:

- fixed-topology marching tets every step (ops/marching_tets.py),
- pure-XLA software rasterizer (ops/rasterize.py) instead of nvdiffrast,
- mesh regularizers computed IN-GRAPH and returned as loss scalars
  (`loss_normal_consistency`, `loss_laplacian_smoothness`) since mesh
  objects with dynamic shapes cannot cross the jit boundary.

Accepts the standard batch (rays for background directions + image shape)
plus `mvp_mtx` [B, 4, 4] and `camera_positions` [B, 3].
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ... import register
from ...ops.marching_tets import (build_tet_topology, laplacian_loss,
                                  marching_tets, normal_consistency_loss,
                                  vertex_normals)
from ...ops.rasterize import interpolate, rasterize


@register("mesh-rasterize-renderer")
class MeshRasterizeRenderer(nn.Module):
    @dataclass
    class Config:
        radius: float = 1.0
        isosurface_resolution: int = 32
        isosurface_threshold: float = 0.0
        rasterize_chunk: int = 1024
        render_rgb: bool = True
        # kept for base-config compatibility with the volume renderers
        eval_chunk_size: int = 0
        randomized: bool = True
        near_plane: float = 0.0
        far_plane: float = 1e10

    cfg: "MeshRasterizeRenderer.Config"
    geometry: nn.Module
    material: nn.Module
    background: nn.Module

    # rays are only used for the image shape + background directions; the
    # mesh itself is projected with mvp_mtx.
    requires_full_image = True

    def __call__(self, rays_o, rays_d, light_positions=None, bg_color=None,
                 occ_grid=None, train: bool = True, mvp_mtx=None,
                 camera_positions=None, render_rgb: bool = True, **kwargs):
        cfg = self.cfg
        B, H, W, _ = rays_o.shape
        assert mvp_mtx is not None, \
            "mesh-rasterize-renderer needs mvp_mtx in the batch"

        topo = build_tet_topology(cfg.isosurface_resolution)
        r = cfg.radius
        grid_verts = jnp.asarray(topo.verts_unit) * (2.0 * r) - r  # [G, 3]

        field, _ = self.geometry.forward_field(grid_verts)
        level = self.geometry.forward_level(field, cfg.isosurface_threshold)
        mt = marching_tets(level.reshape(-1), grid_verts, topo)

        v_pos = mt.v_pos                                       # [E, 3]
        v_nrm = vertex_normals(mt)                             # [E, 3]
        v_hom = jnp.concatenate(
            [v_pos, jnp.ones((v_pos.shape[0], 1))], axis=-1)   # [E, 4]

        do_rgb = bool(render_rgb and cfg.render_rgb)
        comp_rgb, comp_normal, opacity, depth = [], [], [], []
        for b in range(B):
            v_clip = v_hom @ mvp_mtx[b].T                      # [E, 4]
            rast = rasterize(v_clip, mt.faces, mt.face_valid, H, W,
                             chunk=cfg.rasterize_chunk)
            maskf = rast.mask[..., None].astype(jnp.float32)   # [H, W, 1]
            pix_pos = interpolate(v_pos, rast, mt.faces)       # [H, W, 3]
            pix_nrm = interpolate(v_nrm, rast, mt.faces)
            pix_nrm = pix_nrm / jnp.sqrt(
                jnp.sum(pix_nrm * pix_nrm, axis=-1, keepdims=True) + 1e-20)

            comp_normal.append((pix_nrm + 1.0) / 2.0 * maskf)
            opacity.append(maskf)
            depth.append(rast.z[..., None] * maskf)

            if do_rgb:
                geo_out = self.geometry(
                    pix_pos.reshape(1, -1, 3), output_normal=False)
                feats = geo_out["features"].reshape(H, W, -1)
                viewdirs = rays_d[b]
                light = (light_positions[b].reshape(1, 1, 3)
                         if light_positions is not None
                         else jnp.zeros((1, 1, 3)))
                rgb_fg = self.material(
                    features=feats, viewdirs=viewdirs,
                    positions=pix_pos,
                    light_positions=jnp.broadcast_to(light, (H, W, 3)),
                    shading_normal=pix_nrm)
                bg = self.background(rays_d[b:b + 1],
                                     train=train).reshape(H, W, -1)
                comp_rgb.append(rgb_fg * maskf + bg * (1.0 - maskf))

        out = {
            "opacity": jnp.stack(opacity),
            "depth": jnp.stack(depth),
            "comp_normal": jnp.stack(comp_normal),
        }
        if do_rgb:
            out["comp_rgb"] = jnp.stack(comp_rgb)
        else:
            # guidance input for the geometry stage is comp_normal; still
            # provide comp_rgb for uniform downstream handling
            out["comp_rgb"] = out["comp_normal"]
        if train:
            out["loss_normal_consistency"] = normal_consistency_loss(mt)
            out["loss_laplacian_smoothness"] = laplacian_loss(mt)
            out["mesh_n_valid_faces"] = jnp.sum(
                mt.face_valid.astype(jnp.int32))
        return out
