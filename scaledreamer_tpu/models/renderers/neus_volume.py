"""`neus-volume-renderer`: SDF-based volume renderer (NeuS / VolSDF).

Parity target: reference
`threestudio/models/renderers/neus_volume_renderer.py:19-390` — LearnedVariance
(inv_std = exp(10 * param)), NeuS logistic-CDF alpha or VolSDF density,
cos-anneal ratio, occgrid/importance estimators.

`cos_anneal_ratio` is a traced scalar input evaluated host-side per step
(reference update_step :353-359), keeping the step a single XLA program.
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
                           neus_alpha, rays_intersect_bbox,
                           render_weights_from_alpha, sample_pdf,
                           volsdf_alpha, volsdf_density)
from .occupancy import OccGridState, query_occupancy


class LearnedVariance(nn.Module):
    """inv_std = clamp(exp(10 * _inv_std), 1e-6, 1e6)
    (reference neus_volume_renderer.py:26-38)."""
    init_val: float = 0.3
    trainable: bool = True

    @nn.compact
    def __call__(self):
        if self.trainable:
            raw = self.param(
                "_inv_std",
                lambda k: jnp.asarray(self.init_val, jnp.float32))
        else:
            raw = jnp.asarray(self.init_val, jnp.float32)
        return jnp.clip(jnp.exp(raw * 10.0), 1e-6, 1e6)


@register("neus-volume-renderer")
class NeuSVolumeRenderer(nn.Module):
    @dataclass
    class Config:
        radius: float = 1.0
        num_samples_per_ray: int = 512
        randomized: bool = True
        eval_chunk_size: int = 160000
        learned_variance_init: float = 0.3
        cos_anneal_end_steps: int = 0
        use_volsdf: bool = False
        near_plane: float = 0.0
        far_plane: float = 1e10
        trainable_variance: bool = True
        estimator: str = "occgrid"
        grid_prune: bool = True
        prune_alpha_threshold: bool = True
        grid_resolution: int = 32
        occ_threshold: float = 0.01
        num_samples_per_ray_importance: int = 64
        return_comp_normal: bool = False

    cfg: "NeuSVolumeRenderer.Config"
    geometry: nn.Module
    material: nn.Module
    background: nn.Module

    def setup(self):
        self.variance = LearnedVariance(
            init_val=self.cfg.learned_variance_init,
            trainable=self.cfg.trainable_variance)

    def _sample(self, rays_o, rays_d, occ_grid, rng, train, inv_std):
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
                sdf = self.geometry_sdf(pos)
                return volsdf_density(sdf, inv_std)[..., 0]

            return importance_sampling(
                prop_sigma_fn, cfg.num_samples_per_ray_importance, S,
                near, far, rng=rng, stratified=stratified)

        u = jnp.linspace(0.0, 1.0, S + 1)[None, :]
        t_edges = near + (far - near) * u
        if occ_grid is not None and cfg.grid_prune:
            tm = (t_edges[:, :-1] + t_edges[:, 1:]) / 2.0
            pos = rays_o[:, None, :] + rays_d[:, None, :] * tm[..., None]
            occ = query_occupancy(occ_grid, pos, cfg.grid_resolution,
                                  cfg.radius, cfg.occ_threshold)
            pdf = occ + 1e-2
            cdf = jnp.cumsum(pdf, axis=-1)
            cdf = jnp.concatenate([jnp.zeros((R, 1)), cdf], axis=-1)
            cdf = cdf / cdf[:, -1:]
            svals = jnp.sort(sample_pdf(t_edges, cdf, S,
                                        rng if stratified else None,
                                        stratified), axis=-1)
            return svals[:, :-1], svals[:, 1:]
        return t_edges[:, :-1], t_edges[:, 1:]

    def geometry_sdf(self, pos):
        return self.geometry.forward_sdf(pos)

    def __call__(self, rays_o, rays_d, light_positions=None, bg_color=None,
                 occ_grid: Optional[OccGridState] = None, train: bool = True,
                 cos_anneal_ratio: float = 1.0, **kwargs):
        cfg = self.cfg
        B, H, W, _ = rays_o.shape
        rays_o_flat = rays_o.reshape(-1, 3)
        rays_d_flat = rays_d.reshape(-1, 3)
        R = rays_o_flat.shape[0]
        inv_std = self.variance()
        rng = self.make_rng("sampling") if (train and cfg.randomized) else None

        t_starts, t_ends = self._sample(
            rays_o_flat, rays_d_flat, occ_grid, rng, train, inv_std)
        S = t_starts.shape[-1]
        t_mid = ((t_starts + t_ends) / 2.0)[..., None]
        t_intervals = (t_ends - t_starts)[..., None]
        positions = rays_o_flat[:, None, :] + rays_d_flat[:, None, :] * t_mid
        t_dirs = jnp.broadcast_to(rays_d_flat[:, None, :], positions.shape)
        if light_positions is not None:
            t_light = jnp.broadcast_to(
                light_positions.reshape(B, 1, 1, 3), (B, H * W, S, 3)
            ).reshape(R, S, 3)
        else:
            t_light = jnp.zeros_like(positions)

        geo_out = self.geometry(positions, output_normal=True)
        sdf = geo_out["sdf"]

        if cfg.use_volsdf:
            alpha = volsdf_alpha(sdf, t_intervals, inv_std)[..., 0]
        else:
            alpha = neus_alpha(sdf, geo_out["normal"], t_dirs, t_intervals,
                               inv_std, cos_anneal_ratio)[..., 0]

        rgb_fg = self.material(
            features=geo_out.get("features"), viewdirs=t_dirs,
            positions=positions, light_positions=t_light,
            shading_normal=geo_out.get("shading_normal"))
        comp_rgb_bg = self.background(rays_d, train=train).reshape(R, -1)

        weights = render_weights_from_alpha(alpha)
        opacity = accumulate_along_rays(weights)
        depth = accumulate_along_rays(weights, t_mid)
        comp_rgb_fg = accumulate_along_rays(weights, rgb_fg)

        w_norm = weights / jnp.clip(opacity, 1e-5)
        z_mean = accumulate_along_rays(w_norm, t_mid)
        z_var = accumulate_along_rays(w_norm, (t_mid - z_mean[:, None, :]) ** 2)
        z_variance = z_var * (opacity > 0.5).astype(jnp.float32)

        bg = comp_rgb_bg if bg_color is None else bg_color.reshape(R, -1)
        comp_rgb = comp_rgb_fg + bg * (1.0 - opacity)

        out = {
            "comp_rgb": comp_rgb.reshape(B, H, W, -1),
            "comp_rgb_fg": comp_rgb_fg.reshape(B, H, W, -1),
            "comp_rgb_bg": comp_rgb_bg.reshape(B, H, W, -1),
            "opacity": opacity.reshape(B, H, W, 1),
            "depth": depth.reshape(B, H, W, 1),
            "z_variance": z_variance.reshape(B, H, W, 1),
            "inv_std": inv_std,
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
        comp_normal = safe_normalize(
            accumulate_along_rays(weights, geo_out["normal"]))
        out["comp_normal"] = ((comp_normal + 1.0) / 2.0 * opacity
                              ).reshape(B, H, W, 3)
        return out
