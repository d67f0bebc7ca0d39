"""`implicit-sdf` geometry: hash-grid SDF + feature field.

Parity target: reference `threestudio/models/geometry/implicit_sdf.py:17-413`:
SDF network with sphere/ellipsoid closed-form bias (`sdf_bias`), optional
shape-init pre-fit, fd/analytic/pred normals, eikonal-ready sdf gradients.

The shape_init optimization loop (reference :91-228, 1000 Adam steps against
an analytic SDF) is provided as `fit_shape_init` — a standalone jitted optax
loop run once at startup; with replicated params + same key it needs no
broadcast (SURVEY.md §2.2).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ... import register
from ...ops.math import contract_to_unisphere, safe_normalize
from ...ops.networks import get_encoding, get_mlp
from .base import ImplicitGeometryConfig, bbox_from_radius


@register("implicit-sdf")
class ImplicitSDF(nn.Module):
    @dataclass
    class Config(ImplicitGeometryConfig):
        shape_init: Optional[str] = None
        shape_init_params: Optional[Any] = None
        force_shape_init: bool = False
        sdf_bias: Any = 0.0
        sdf_bias_params: Optional[Any] = None
        isosurface_threshold: Any = 0.0

    cfg: "ImplicitSDF.Config"

    def setup(self):
        self.encoding = get_encoding(
            self.cfg.n_input_dims, self.cfg.pos_encoding_config)
        self.sdf_network = get_mlp(1, self.cfg.mlp_network_config)
        if self.cfg.n_feature_dims > 0:
            self.feature_network = get_mlp(
                self.cfg.n_feature_dims, self.cfg.mlp_network_config)
        if self.cfg.normal_type == "pred":
            self.normal_network = get_mlp(3, self.cfg.mlp_network_config)

    @property
    def bbox(self):
        return bbox_from_radius(self.cfg.radius)

    def get_shifted_sdf(self, points, sdf):
        """Apply closed-form sdf bias (reference implicit_sdf.py:230-262)."""
        bias = self.cfg.sdf_bias
        if bias == "sphere":
            radius = float(self.cfg.sdf_bias_params)
            sdf_bias = jnp.linalg.norm(points, axis=-1, keepdims=True) - radius
        elif bias == "ellipsoid":
            size = jnp.asarray(self.cfg.sdf_bias_params, jnp.float32)
            sdf_bias = jnp.linalg.norm(points / size, axis=-1, keepdims=True) - 1.0
        elif isinstance(bias, (int, float)):
            sdf_bias = jnp.asarray(bias, jnp.float32)
        else:
            raise ValueError(f"Unknown sdf bias {bias}")
        return sdf + sdf_bias

    def forward_sdf(self, points):
        pts = contract_to_unisphere(points, self.bbox, self.cfg.unbounded)
        sdf = self.sdf_network(
            self.encoding(pts.reshape(-1, self.cfg.n_input_dims))
        ).reshape(*points.shape[:-1], 1)
        return self.get_shifted_sdf(points, sdf)

    def __call__(self, points, output_normal: bool = False):
        points_unscaled = points
        pts = contract_to_unisphere(points, self.bbox, self.cfg.unbounded)
        denc = None
        if output_normal and self.cfg.normal_type == "analytic":
            if self.cfg.unbounded:
                raise NotImplementedError(
                    "analytic normals assume the linear bbox contraction "
                    "jacobian; use finite_difference with unbounded=True")
            # ONE fused encode serves sdf, features AND normals (a second
            # plain encode would double the gather fwd+bwd cost)
            enc, denc = self.encoding(
                pts.reshape(-1, self.cfg.n_input_dims), with_grad=True)
        else:
            enc = self.encoding(pts.reshape(-1, self.cfg.n_input_dims))
        sdf = self.sdf_network(enc).reshape(*points.shape[:-1], 1)
        sdf = self.get_shifted_sdf(points_unscaled, sdf)
        out = {"sdf": sdf}
        if self.cfg.n_feature_dims > 0:
            out["features"] = self.feature_network(enc).reshape(
                *points.shape[:-1], self.cfg.n_feature_dims)
        if output_normal:
            nt = self.cfg.normal_type
            if nt in ("finite_difference", "finite_difference_laplacian"):
                eps = float(self.cfg.finite_difference_normal_eps)
                comps = []
                if nt == "finite_difference_laplacian":
                    for axis in range(3):
                        offs = jnp.zeros((3,), jnp.float32).at[axis].set(eps)
                        s_pos = self.forward_sdf(points_unscaled + offs)
                        s_neg = self.forward_sdf(points_unscaled - offs)
                        comps.append(0.5 * (s_pos - s_neg) / eps)
                else:
                    for axis in range(3):
                        offs = jnp.zeros((3,), jnp.float32).at[axis].set(eps)
                        s_pos = self.forward_sdf(points_unscaled + offs)
                        comps.append((s_pos - sdf) / eps)
                sdf_grad = jnp.concatenate(comps, axis=-1)
                normal = safe_normalize(sdf_grad)
            elif nt == "pred":
                normal = safe_normalize(self.normal_network(enc).reshape(
                    *points.shape[:-1], 3))
                sdf_grad = normal
            elif nt == "analytic":
                # denc computed above by the shared fused encode
                enc_g = enc
                scale = 1.0 / (2.0 * self.cfg.radius)
                pflat = points_unscaled.reshape(-1, 3)

                def sdf_of(e, p):
                    return self.get_shifted_sdf(p, self.sdf_network(e))

                grads = []
                for axis in range(3):
                    unit = jnp.zeros((1, 3)).at[0, axis].set(1.0)
                    tangent_p = jnp.broadcast_to(unit, pflat.shape)
                    _, ds = jax.jvp(sdf_of, (enc_g, pflat),
                                    (denc[axis] * scale, tangent_p))
                    grads.append(ds)
                sdf_grad = jnp.concatenate(grads, axis=-1).reshape(
                    *points.shape[:-1], 3)
                normal = safe_normalize(sdf_grad)
            else:
                raise ValueError(f"Unknown normal type {nt}")
            out.update({"normal": normal, "shading_normal": normal,
                        "sdf_grad": sdf_grad})
        return out

    def forward_field(self, points):
        return self.forward_sdf(points), None

    def forward_level(self, field, threshold):
        return field - threshold

    def export(self, points):
        if self.cfg.n_feature_dims == 0:
            return {}
        pts = contract_to_unisphere(points, self.bbox, self.cfg.unbounded)
        enc = self.encoding(pts.reshape(-1, self.cfg.n_input_dims))
        return {"features": self.feature_network(enc).reshape(
            *points.shape[:-1], self.cfg.n_feature_dims)}


def analytic_shape_sdf(shape: str, params) -> callable:
    """Target SDFs for shape_init (implicit_sdf.py:106-185): closed-form
    sphere/ellipsoid plus `mesh:<path>` via exact winding-number sign +
    point-mesh distance (reference uses libigl; see ops/shape_loss.py)."""
    if shape == "sphere":
        radius = float(params)
        return lambda p: jnp.linalg.norm(p, axis=-1, keepdims=True) - radius
    if shape == "ellipsoid":
        size = jnp.asarray(params, jnp.float32)
        return lambda p: jnp.linalg.norm(p / size, axis=-1, keepdims=True) - 1.0
    if shape.startswith("mesh:"):
        from ...ops.shape_loss import (normalize_guide_mesh,
                                       point_mesh_sq_distance, read_obj,
                                       winding_number)
        v, f = read_obj(shape[len("mesh:"):])
        scale = float(params) if params is not None else 0.7
        v = normalize_guide_mesh(v, scale)

        def mesh_sdf(p):
            flat = p.reshape(-1, 3)
            dist = jnp.sqrt(point_mesh_sq_distance(v, f, flat) + 1e-12)
            inside = winding_number(v, f, flat) > 0.5
            sign = jnp.where(inside, -1.0, 1.0)
            return (sign * dist).reshape(*p.shape[:-1], 1)

        return mesh_sdf
    raise ValueError(f"Unknown shape_init: {shape}")


def fit_shape_init(module, params, cfg, key, n_steps: int = 1000,
                   batch: int = 4096, lr: float = 1e-3):
    """Pre-fit the SDF network to an analytic shape (implicit_sdf.py:200-228).

    Returns updated params. Pure-JAX loop (lax.fori over jitted Adam steps).
    """
    import optax

    target_fn = analytic_shape_sdf(cfg.shape_init, cfg.shape_init_params)
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(carry, k):
        params, opt_state = carry
        pts = jax.random.uniform(
            k, (batch, 3), minval=-cfg.radius, maxval=cfg.radius)

        def loss_fn(p):
            sdf = module.apply(p, pts, method=module.forward_sdf)
            return jnp.mean((sdf - target_fn(pts)) ** 2)

        grads = jax.grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), None

    keys = jax.random.split(key, n_steps)
    (params, _), _ = jax.lax.scan(
        lambda c, k: step(c, k), (params, opt_state), keys)
    return params
