"""`3DConv-net`: StyleGAN2-style voxel generator geometry (CC3D).

Parity target: reference
`custom/amortized/models/geometry/stylegan_3dconv_net.py:21-423`:
mapping (z + text -> w) + modulated conv3d synthesis pyramid -> B x res³ x C
voxel grid; trilinear sampling -> tiny SDF/feature MLPs; sphere shape-init
(1000-step Adam fit, `fit_shape_init_3dconv`) or closed-form sdf_bias.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ... import register
from ...ops.grid_sample import grid_sample_3d
from ...ops.math import get_activation, safe_normalize, scale_tensor
from ...ops.networks import get_mlp
from .base import ImplicitGeometryConfig, bbox_from_radius
from .conv3d_modules import Generator3D


def contract_to_unisphere_custom(x, bbox, unbounded: bool = False):
    """Normalize to [-1, 1] (reference custom/.../utils.py:14-26) — note the
    custom variant maps to (-1, 1), not (0, 1)."""
    lo, hi = bbox[0], bbox[1]
    return scale_tensor(x, (lo, hi), (-1.0, 1.0))


@register("3DConv-net")
class Voxel3DSdf(nn.Module):
    @dataclass
    class Config(ImplicitGeometryConfig):
        space_generator_config: dict = field(default_factory=lambda: {
            "z_dim": 64, "w_dim": 256, "c_dim": 1024, "num_layers": 2,
            "img_resolution": 128, "img_channels": 32,
            "channel_multiplier": 1})
        backbone: str = "3dconv_net"
        truncation_psi: float = 1.0
        activation: str = "none"
        shape_init: Optional[str] = None
        shape_init_params: Optional[Any] = None
        force_shape_init: bool = False
        sdf_bias: Any = 0.0
        sdf_bias_params: Optional[Any] = None
        isosurface_remove_outliers: bool = False

    cfg: "Voxel3DSdf.Config"

    def setup(self):
        g = self.cfg.space_generator_config
        self.space_generator = Generator3D(
            z_dim=g.get("z_dim", 64), w_dim=g.get("w_dim", 256),
            c_dim=g.get("c_dim", 1024), num_layers=g.get("num_layers", 2),
            img_resolution=g.get("img_resolution", 128),
            img_channels=g.get("img_channels", 32),
            channel_multiplier=g.get("channel_multiplier", 1),
            channel_base=g.get("channel_base", 512),
            conv_dtype=({"bfloat16": jnp.bfloat16,
                         "float32": None}[g.get("conv_dtype", "float32")]))
        in_dim = g.get("img_channels", 32)
        self.sdf_network = get_mlp(1, self.cfg.mlp_network_config)
        if self.cfg.n_feature_dims > 0:
            self.feature_network = get_mlp(
                self.cfg.n_feature_dims, self.cfg.mlp_network_config)
        self._in_dim = in_dim

    @property
    def bbox(self):
        return bbox_from_radius(self.cfg.radius)

    def get_shifted_sdf(self, points, sdf):
        bias = self.cfg.sdf_bias
        if bias == "sphere":
            return sdf + (jnp.linalg.norm(points, axis=-1, keepdims=True)
                          - float(self.cfg.sdf_bias_params))
        if bias == "ellipsoid":
            size = jnp.asarray(self.cfg.sdf_bias_params, jnp.float32)
            return sdf + (jnp.linalg.norm(points / size, axis=-1,
                                          keepdims=True) - 1.0)
        if isinstance(bias, (int, float)):
            return sdf + bias
        raise ValueError(f"Unknown sdf bias {bias}")

    # space_cache is a dict so the pre-truncation mapping output `w` rides
    # along for the train step's w_avg EMA update (see conv3d_modules
    # MappingNetwork docstring)
    accepts_truncation_psi = True

    def generate_space_cache(self, styles=None, text_embed=None,
                             truncation_psi=None, unconditional: bool = False):
        """mapping + synthesis -> {"voxel": [B, D, H, W, C], "w": [B, W]}
        (reference :226-241; reference layout is [B, C, D, H, W]).
        truncation_psi may be a traced scalar (C()-annealed per step).
        `unconditional=True` is reserved for the shape-init pre-fit, which
        legitimately runs without a text embedding (reference also fits
        unconditionally); any other text_embed=None call asserts."""
        psi = self.cfg.truncation_psi if truncation_psi is None else truncation_psi
        noise_mode = "random"
        vol, w = self.space_generator(styles, text_embed, truncation_psi=psi,
                                      noise_mode=noise_mode, return_w=True,
                                      unconditional=unconditional)
        return {"voxel": get_activation(self.cfg.activation)(vol), "w": w}

    def interpolate_encodings(self, points, space_cache):
        """points [B, N, 3] in [-1,1] -> trilinear features [B, N, C]
        (reference get_trilinear_feature, utils.py:99-111)."""
        vol = space_cache["voxel"] if isinstance(space_cache, dict) \
            else space_cache
        return grid_sample_3d(vol, points, align_corners=False)

    def forward_sdf(self, points, space_cache):
        orig = points.shape
        B = orig[0]
        pts = points.reshape(B, -1, 3)
        pts_n = contract_to_unisphere_custom(pts, self.bbox,
                                             self.cfg.unbounded)
        enc = self.interpolate_encodings(pts_n, space_cache)
        sdf = self.sdf_network(enc)
        sdf = self.get_shifted_sdf(pts, sdf)
        return sdf.reshape(*orig[:-1], 1)

    def __call__(self, points, space_cache, output_normal: bool = False):
        B, N, _ = points.shape
        points_unscaled = points
        pts_n = contract_to_unisphere_custom(points, self.bbox,
                                             self.cfg.unbounded)
        enc = self.interpolate_encodings(pts_n, space_cache)
        sdf = self.sdf_network(enc)
        sdf = self.get_shifted_sdf(points_unscaled, sdf)
        out = {"sdf": sdf.reshape(B * N, 1)}
        if self.cfg.n_feature_dims > 0:
            out["features"] = self.feature_network(enc).reshape(
                B * N, self.cfg.n_feature_dims)
        if output_normal:
            nt = self.cfg.normal_type
            if nt == "finite_difference":
                eps = float(self.cfg.finite_difference_normal_eps)
                grads = []
                for axis in range(3):
                    offs = jnp.zeros((3,), jnp.float32).at[axis].set(eps)
                    p_off = jnp.clip(points_unscaled + offs,
                                     -self.cfg.radius, self.cfg.radius)
                    s_off = self.forward_sdf(p_off, space_cache)
                    grads.append((s_off - sdf) / eps)
                sdf_grad = jnp.concatenate(grads, axis=-1)
            elif nt == "analytic":
                sdf_grad = jax.grad(
                    lambda p: jnp.sum(self.forward_sdf(p, space_cache))
                )(points_unscaled)
            else:
                raise NotImplementedError(f"normal_type {nt}")
            normal = safe_normalize(sdf_grad)
            out.update({"normal": normal.reshape(B * N, 3),
                        "shading_normal": normal.reshape(B * N, 3),
                        "sdf_grad": sdf_grad.reshape(B * N, 3)})
        return out

    def forward_field(self, points, space_cache):
        return self.forward_sdf(points, space_cache), None

    def forward_level(self, field, threshold):
        return field - threshold

    def export(self, points, space_cache):
        B = points.shape[0]
        pts_n = contract_to_unisphere_custom(
            points.reshape(B, -1, 3), self.bbox, self.cfg.unbounded)
        enc = self.interpolate_encodings(pts_n, space_cache)
        return {"features": self.feature_network(enc).reshape(
            *points.shape[:-1], self.cfg.n_feature_dims)}

    def init_all(self, points, text_embed, styles=None):
        cache = self.generate_space_cache(styles, text_embed)
        return self(points, cache, output_normal=True)


def fit_shape_init_3dconv(module: Voxel3DSdf, params, n_steps: int = 1000,
                          batch_size: int = 4, n_points: int = 10000,
                          lr: float = 1e-3):
    """1000-step Adam pre-fit of the generator's SDF to an analytic shape.

    Parity target: reference `initialize_shape`
    (custom/amortized/models/geometry/stylegan_3dconv_net.py:122-198):
    per step, sample a batch of random styles z, generate space caches,
    regress forward_sdf at uniform points onto the sphere/ellipsoid SDF
    (MSE, Adam lr 1e-3). The reference then broadcast()s params from rank 0;
    here the fit uses a FIXED PRNG key (independent of the per-process
    seed), so every process computes bit-identical params and the broadcast
    is unnecessary by construction.

    `params` is the geometry param subtree; returns the fitted subtree.
    """
    import optax

    cfg = module.cfg
    if cfg.shape_init is None and not cfg.force_shape_init:
        return params
    if cfg.sdf_bias != 0.0:
        import logging
        logging.getLogger(__name__).warning(
            "shape_init and sdf_bias are both specified, which may lead to "
            "unexpected results.")

    radius = float(cfg.radius)
    if cfg.shape_init == "sphere":
        r = float(cfg.shape_init_params)

        def gt_sdf(p):
            return jnp.linalg.norm(p, axis=-1, keepdims=True) - r
    elif cfg.shape_init == "ellipsoid":
        size = jnp.asarray(cfg.shape_init_params, jnp.float32)

        def gt_sdf(p):
            return (jnp.linalg.norm(p / size, axis=-1, keepdims=True)
                    - 1.0)
    else:
        raise ValueError(f"Unknown shape init {cfg.shape_init}")

    z_dim = cfg.space_generator_config.get("z_dim", 64)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def fit_step(params, opt_state, key):
        kz, kp, kn = jax.random.split(key, 3)
        z = jax.random.normal(kz, (batch_size, z_dim))
        pts = jax.random.uniform(kp, (batch_size, n_points, 3),
                                 minval=-radius, maxval=radius)

        def loss_fn(p):
            cache = module.apply({"params": p}, styles=z, text_embed=None,
                                 unconditional=True,
                                 method=module.generate_space_cache,
                                 rngs={"noise": kn})
            sdf = module.apply({"params": p}, pts, cache,
                               method=module.forward_sdf)
            return jnp.mean((sdf - gt_sdf(pts)) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # fixed key: identical across processes (replaces the reference's
    # torch.distributed broadcast, SURVEY.md §2.2 collectives row)
    rng = jax.random.PRNGKey(0)
    loss = None
    for i in range(n_steps):
        params, opt_state, loss = fit_step(params, opt_state,
                                           jax.random.fold_in(rng, i))
    import logging
    logging.getLogger(__name__).info(
        "fit_shape_init_3dconv: %d steps, final mse %.5f", n_steps,
        float(loss))
    return params
