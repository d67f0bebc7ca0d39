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
from ...ops.math import get_activation, safe_normalize
from ...ops.networks import get_encoding, get_mlp
from ...ops.render import (accumulate_along_rays, importance_sampling,
                           prop_interlevel_loss, proposal_sampling,
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


class PropNet(nn.Module):
    """Trainable proposal density field — the reference's
    `create_network_with_input_encoding(**proposal_network_config)` +
    `prop_sigma_fn` (nerf_volume_renderer.py:72-78,181-207): bbox-normalized
    positions -> hashgrid encode -> tiny MLP -> shifted_trunc_exp density,
    zeroed outside the bbox."""
    config: dict
    radius: float

    def setup(self):
        cfg = self.config or {}
        n_in = int(cfg.get("n_input_dims", 3))
        self.encoding = get_encoding(
            n_in, cfg.get("encoding_config", {
                "otype": "HashGrid", "n_levels": 5,
                "n_features_per_level": 2, "log2_hashmap_size": 17,
                "base_resolution": 16, "per_level_scale": 1.447269}))
        self.network = get_mlp(
            int(cfg.get("n_output_dims", 1)),
            cfg.get("network_config", {
                "otype": "VanillaMLP", "activation": "ReLU",
                "n_neurons": 64, "n_hidden_layers": 1}))

    def __call__(self, positions: jnp.ndarray) -> jnp.ndarray:
        """positions [..., 3] world coords -> density [...]."""
        x = (positions + self.radius) / (2.0 * self.radius)
        selector = jnp.all((x > 0.0) & (x < 1.0), axis=-1)
        flat = x.reshape(-1, x.shape[-1])
        raw = self.network(self.encoding(flat)).reshape(x.shape[:-1])
        return get_activation("shifted_trunc_exp")(raw) * selector


@register("nerf-volume-renderer")
class NeRFVolumeRenderer(nn.Module):
    @dataclass
    class Config(VolumeRendererBaseConfig):
        estimator: str = "occgrid"  # ["occgrid", "proposal", "importance"]
        train_chunk_size: int = 0   # rays per lax.map chunk (0 = no chunking)
        # occgrid
        grid_prune: bool = True
        prune_alpha_threshold: bool = True
        grid_resolution: int = 32
        occ_threshold: float = 0.01
        # proposal (reference nerf_volume_renderer.py:41-45): prop net
        # architecture + the optimizer group the system injects for it
        # (threestudio steps a SEPARATE prop optimizer; here the interlevel
        # loss is detached from the radiance field, so the prop net rides
        # the main optimizer as its own param group "prop_net")
        proposal_network_config: Optional[dict] = None
        prop_optimizer_config: Optional[dict] = None
        prop_scheduler_config: Optional[dict] = None
        num_samples_per_ray_proposal: int = 64
        # importance
        num_samples_per_ray_importance: int = 64
        # TPU row-count options (BASELINE.md): a stop-gradient COARSE
        # density pass (prop_encode_levels coarse hashgrid levels; fine
        # levels contribute zero gather rows) reshapes the occgrid sample
        # CDF so num_samples_compact samples replace num_samples_per_ray
        # for the full-geometry evaluation. Train-time only; 0 = off
        # (reference parity). Sample PLACEMENT changes, gradients don't.
        num_samples_compact: int = 0
        prop_encode_levels: int = 0

    cfg: "NeRFVolumeRenderer.Config"
    geometry: nn.Module
    material: nn.Module
    background: nn.Module

    def _sample_along_rays(self, rays_o, rays_d, occ_grid: Optional[OccGridState],
                           rng, train: bool, prop_net=None):
        """Returns dense (t_starts, t_ends) [R, S] plus an aux dict
        (non-empty only for the proposal estimator)."""
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

            ts, te = importance_sampling(
                prop_sigma_fn, cfg.num_samples_per_ray_importance, S,
                near, far, rng=rng, stratified=stratified)
            return ts, te, {}

        if cfg.estimator == "proposal":
            def prop_sigma_fn(t0, t1):
                tm = (t0 + t1)[..., None] / 2.0
                pos = rays_o[:, None, :] + rays_d[:, None, :] * tm
                return prop_net(pos)

            (ts, te), aux = proposal_sampling(
                prop_sigma_fn, cfg.num_samples_per_ray_proposal, S,
                near, far, rng=rng, stratified=stratified)
            return ts, te, aux

        # occgrid: uniform probe of the binary grid reshapes the sample CDF
        # so the fixed S samples concentrate in occupied cells.
        rng_occ, rng_compact = (jax.random.split(rng)
                                if rng is not None else (None, None))
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
                               rng_occ if stratified else None, stratified)
            svals = jnp.sort(svals, axis=-1)
            ts, te = svals[:, :-1], svals[:, 1:]
        else:
            if stratified and rng_occ is not None:
                # jitter the interior edges within their bins (stratified)
                bin_w = (far - near) / S
                jitter = (jax.random.uniform(rng_occ, (R, S - 1)) - 0.5) \
                    * bin_w
                interior = t_edges[:, 1:-1] + jitter
                t_edges = jnp.concatenate(
                    [t_edges[:, :1], interior, t_edges[:, -1:]], axis=-1)
            ts, te = t_edges[:, :-1], t_edges[:, 1:]
        if train and 0 < cfg.num_samples_compact < S:
            ts, te = self._compact_samples(rays_o, rays_d, ts, te,
                                           rng_compact, stratified)
        return ts, te, {}

    def _compact_samples(self, rays_o, rays_d, t_starts, t_ends, rng,
                         stratified: bool):
        """Coarse-density sample compaction for the dense occgrid path
        (BASELINE.md row-count program): a stop-gradient density pass over
        the full sample set — encoded with only `prop_encode_levels` coarse
        hashgrid levels, so the fine levels' gather rows vanish — reshapes
        the per-ray CDF, and `num_samples_compact` resampled points replace
        the `num_samples_per_ray` set for the full geometry evaluation.
        The analog of the generative renderer's prop_encode_levels: it
        moves sample PLACEMENT only; image gradients are untouched."""
        cfg = self.cfg
        tm = (t_starts + t_ends)[..., None] / 2.0
        pos = rays_o[:, None, :] + rays_d[:, None, :] * tm
        kw = {}
        if cfg.prop_encode_levels > 0 and getattr(
                self.geometry, "supports_prop_max_levels", False):
            kw["max_levels"] = cfg.prop_encode_levels
        sigma = jax.lax.stop_gradient(
            self.geometry.forward_density(pos, **kw))[..., 0]
        w, _ = render_weights_from_density(t_starts, t_ends, sigma)
        pdf = w + 1e-3 / w.shape[-1]  # keep empty rays sampleable
        cdf = jnp.cumsum(pdf, axis=-1)
        cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)
        cdf = cdf / cdf[:, -1:]
        edges = jnp.concatenate([t_starts[:, :1], t_ends], axis=-1)
        svals = sample_pdf(edges, cdf, cfg.num_samples_compact,
                           rng if stratified else None, stratified)
        svals = jnp.sort(svals, axis=-1)
        return svals[:, :-1], svals[:, 1:]

    @nn.compact
    def __call__(self, rays_o, rays_d, light_positions=None, bg_color=None,
                 occ_grid: Optional[OccGridState] = None, train: bool = True,
                 **kwargs):
        B, H, W, _ = rays_o.shape
        cfg = self.cfg
        if cfg.estimator not in ("occgrid", "proposal", "importance"):
            raise ValueError(
                f"Unknown estimator {cfg.estimator!r}, should be one of "
                "['occgrid', 'proposal', 'importance'] (reference "
                "nerf_volume_renderer.py:110-113)")
        prop_net = (PropNet(cfg.proposal_network_config or {},
                            cfg.radius, name="prop_net")
                    if cfg.estimator == "proposal" else None)
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
            t_starts, t_ends, est_aux = self._sample_along_rays(
                ro, rd, occ_grid, chunk_rng, train, prop_net=prop_net)
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
            out.update(est_aux)  # prop_svals/prop_cdfs/final_svals
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
            if cfg.estimator == "proposal":
                # interlevel loss training the prop net (detached from the
                # radiance field; the system adds it to the total loss
                # gated by scalars["prop_grad_gate"])
                out["prop_loss"] = jnp.mean(prop_interlevel_loss(
                    chunk_out["final_svals"], weights,
                    chunk_out["prop_svals"], chunk_out["prop_cdfs"]))
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
