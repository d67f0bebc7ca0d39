"""`nerf-volume-renderer`: density-field volume renderer.

Parity target: reference
`threestudio/models/renderers/nerf_volume_renderer.py:20-470` — occgrid /
importance estimators, density compositing, bg composite, z-variance (HiFA),
comp_normal. The nerfacc CUDA segment ops are replaced by dense [R, S]
compositing (`ops/render.py`), and the occgrid path by occupancy-guided
CDF sampling at fixed shape (`occupancy.py`).

Everything here runs inside the jitted train step; rays arrive [B, H, W, 3]
and all shapes are static per resolution milestone.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ... import register
from ...ops.math import safe_normalize
from ...ops.render import (accumulate_along_rays, importance_sampling,
                           rays_intersect_bbox, render_weights_from_density,
                           sample_pdf)
from .occupancy import OccGridState, query_occupancy


@dataclass
class VolumeRendererBaseConfig:
    radius: float = 1.0
    num_samples_per_ray: int = 512
    eval_chunk_size: int = 160000
    randomized: bool = True
    near_plane: float = 0.0
    far_plane: float = 1e10
    return_comp_normal: bool = False
    return_normal_perturb: bool = False


@register("nerf-volume-renderer")
class NeRFVolumeRenderer(nn.Module):
    @dataclass
    class Config(VolumeRendererBaseConfig):
        estimator: str = "occgrid"  # ["occgrid", "importance"]
        train_chunk_size: int = 0   # rays per lax.map chunk (0 = no chunking)
        # occgrid
        grid_prune: bool = True
        prune_alpha_threshold: bool = True
        grid_resolution: int = 32
        occ_threshold: float = 0.01
        # importance
        num_samples_per_ray_importance: int = 64

    cfg: "NeRFVolumeRenderer.Config"
    geometry: nn.Module
    material: nn.Module
    background: nn.Module

    def _sample_along_rays(self, rays_o, rays_d, occ_grid: Optional[OccGridState],
                           rng, train: bool):
        """Returns dense (t_starts, t_ends) [R, S]."""
        cfg = self.cfg
        near, far = rays_intersect_bbox(rays_o, rays_d, cfg.radius)
        near = jnp.maximum(near, cfg.near_plane)
        far = jnp.minimum(far, cfg.far_plane)
        R = rays_o.shape[0]
        S = cfg.num_samples_per_ray
        stratified = train and cfg.randomized

        if cfg.estimator == "importance":
            def prop_sigma_fn(t0, t1):
                tm = (t0 + t1)[..., None] / 2.0
                pos = rays_o[:, None, :] + rays_d[:, None, :] * tm
                return self.geometry.forward_density(pos)[..., 0]

            return importance_sampling(
                prop_sigma_fn, cfg.num_samples_per_ray_importance, S,
                near, far, rng=rng, stratified=stratified)

        # occgrid: uniform probe of the binary grid reshapes the sample CDF
        # so the fixed S samples concentrate in occupied cells.
        u = jnp.linspace(0.0, 1.0, S + 1)[None, :]
        t_edges = near + (far - near) * u  # [R, S+1]
        if occ_grid is not None and cfg.grid_prune:
            tm = (t_edges[:, :-1] + t_edges[:, 1:]) / 2.0
            pos = rays_o[:, None, :] + rays_d[:, None, :] * tm[..., None]
            occ = query_occupancy(occ_grid, pos, cfg.grid_resolution,
                                  cfg.radius, cfg.occ_threshold)
            pdf = occ + 1e-2  # keep empty rays sampleable
            cdf = jnp.cumsum(pdf, axis=-1)
            cdf = jnp.concatenate([jnp.zeros((R, 1)), cdf], axis=-1)
            cdf = cdf / cdf[:, -1:]
            svals = sample_pdf(t_edges, cdf, S,
                               rng if stratified else None, stratified)
            svals = jnp.sort(svals, axis=-1)
            return svals[:, :-1], svals[:, 1:]
        if stratified and rng is not None:
            # jitter the interior edges within their bins (stratified)
            bin_w = (far - near) / S
            jitter = (jax.random.uniform(rng, (R, S - 1)) - 0.5) * bin_w
            interior = t_edges[:, 1:-1] + jitter
            t_edges = jnp.concatenate(
                [t_edges[:, :1], interior, t_edges[:, -1:]], axis=-1)
        return t_edges[:, :-1], t_edges[:, 1:]

    @nn.compact
    def __call__(self, rays_o, rays_d, light_positions=None, bg_color=None,
                 occ_grid: Optional[OccGridState] = None, train: bool = True,
                 **kwargs):
        B, H, W, _ = rays_o.shape
        cfg = self.cfg
        rays_o_flat = rays_o.reshape(-1, 3)
        rays_d_flat = rays_d.reshape(-1, 3)
        R = rays_o_flat.shape[0]
        rng = self.make_rng("sampling") if (train and cfg.randomized) else \
            jax.random.PRNGKey(0)
        requires_normal = getattr(self.material, "requires_normal", False) or \
            cfg.return_comp_normal
        if light_positions is not None:
            light_flat = jnp.broadcast_to(
                light_positions.reshape(B, 1, 3), (B, H * W, 3)
            ).reshape(R, 3)
        else:
            light_flat = jnp.zeros((R, 3), jnp.float32)

        def render_chunk(ro, rd, lf, chunk_rng):
            """ro/rd/lf [Rc, 3] -> per-ray dict (leading dim Rc)."""
            t_starts, t_ends = self._sample_along_rays(
                ro, rd, occ_grid, chunk_rng, train)
            S = t_starts.shape[-1]
            t_mid = ((t_starts + t_ends) / 2.0)[..., None]
            t_intervals = (t_ends - t_starts)[..., None]
            positions = ro[:, None, :] + rd[:, None, :] * t_mid
            t_dirs = jnp.broadcast_to(rd[:, None, :], positions.shape)
            t_light = jnp.broadcast_to(lf[:, None, :], positions.shape)
            geo_out = self.geometry(positions, output_normal=requires_normal)
            density = geo_out["density"][..., 0]
            if cfg.estimator == "occgrid" and occ_grid is not None and \
                    cfg.grid_prune and cfg.prune_alpha_threshold:
                occ = query_occupancy(occ_grid, positions,
                                      cfg.grid_resolution, cfg.radius,
                                      cfg.occ_threshold)
                density = density * occ
            rgb_fg = self.material(
                features=geo_out.get("features"), viewdirs=t_dirs,
                positions=positions, light_positions=t_light,
                shading_normal=geo_out.get("shading_normal"))
            out = {"t_mid": t_mid, "t_intervals": t_intervals,
                   "t_dirs": t_dirs, "positions": positions,
                   "density": density, "rgb_fg": rgb_fg,
                   "t_starts": t_starts, "t_ends": t_ends}
            for k in ("features", "normal", "shading_normal", "sdf_grad"):
                if k in geo_out:
                    out[k] = geo_out[k]
            return out

        chunk = cfg.train_chunk_size if train else 0
        if chunk and 0 < chunk < R and not self.is_initializing():
            n_chunks = (R + chunk - 1) // chunk
            pad = n_chunks * chunk - R
            ro = jnp.pad(rays_o_flat, ((0, pad), (0, 0)))
            rd = jnp.pad(rays_d_flat, ((0, pad), (0, 0)),
                         constant_values=1.0)
            lf = jnp.pad(light_flat, ((0, pad), (0, 0)))
            ro = ro.reshape(n_chunks, chunk, 3)
            rd = rd.reshape(n_chunks, chunk, 3)
            lf = lf.reshape(n_chunks, chunk, 3)
            rngs = (jax.random.split(rng, n_chunks) if rng is not None
                    else jnp.zeros((n_chunks, 2), jnp.uint32))
            stacked = jax.lax.map(
                lambda a: render_chunk(a[0], a[1], a[2], a[3]),
                (ro, rd, lf, rngs))
            chunk_out = jax.tree.map(
                lambda v: v.reshape(n_chunks * chunk, *v.shape[2:])[:R],
                stacked)
        else:
            chunk_out = render_chunk(rays_o_flat, rays_d_flat, light_flat,
                                     rng)

        t_mid = chunk_out["t_mid"]
        t_intervals = chunk_out["t_intervals"]
        t_dirs = chunk_out["t_dirs"]
        positions = chunk_out["positions"]
        density = chunk_out["density"]
        rgb_fg = chunk_out["rgb_fg"]
        t_starts = chunk_out["t_starts"]
        t_ends = chunk_out["t_ends"]
        geo_out = {k: chunk_out[k]
                   for k in ("features", "normal", "shading_normal",
                             "sdf_grad") if k in chunk_out}
        geo_out["density"] = density[..., None]
        comp_rgb_bg = self.background(rays_d, train=train).reshape(R, -1)

        weights, trans = render_weights_from_density(t_starts, t_ends, density)
        opacity = accumulate_along_rays(weights)  # [R, 1]
        depth = accumulate_along_rays(weights, t_mid)
        comp_rgb_fg = accumulate_along_rays(weights, rgb_fg)

        # z-variance (HiFA; reference nerf_volume_renderer.py:335-349)
        w_norm = weights / jnp.clip(opacity, 1e-5)
        z_mean = accumulate_along_rays(w_norm, t_mid)
        z_var = accumulate_along_rays(
            w_norm, (t_mid - z_mean[:, None, :]) ** 2)
        z_variance = z_var * (opacity > 0.5).astype(jnp.float32)

        if bg_color is None:
            bg = comp_rgb_bg
        else:
            bg = bg_color.reshape(R, -1) if bg_color.ndim >= 3 else \
                jnp.broadcast_to(bg_color.reshape(B, 1, -1),
                                 (B, H * W, comp_rgb_fg.shape[-1])).reshape(R, -1)
        comp_rgb = comp_rgb_fg + bg * (1.0 - opacity)

        out = {
            "comp_rgb": comp_rgb.reshape(B, H, W, -1),
            "comp_rgb_fg": comp_rgb_fg.reshape(B, H, W, -1),
            "comp_rgb_bg": comp_rgb_bg.reshape(B, H, W, -1),
            "opacity": opacity.reshape(B, H, W, 1),
            "depth": depth.reshape(B, H, W, 1),
            "z_variance": z_variance.reshape(B, H, W, 1),
        }
        if train:
            out.update({
                "weights": weights[..., None],
                "t_points": t_mid,
                "t_intervals": t_intervals,
                "t_dirs": t_dirs,
                "points": positions,
                **geo_out,
            })
            if cfg.return_comp_normal and "normal" in geo_out:
                comp_normal = safe_normalize(
                    accumulate_along_rays(weights, geo_out["normal"]))
                out["comp_normal"] = (
                    (comp_normal + 1.0) / 2.0 * opacity
                ).reshape(B, H, W, 3)
        elif "normal" in geo_out:
            comp_normal = safe_normalize(
                accumulate_along_rays(weights, geo_out["normal"]))
            out["comp_normal"] = ((comp_normal + 1.0) / 2.0 * opacity
                                  ).reshape(B, H, W, 3)
        return out
