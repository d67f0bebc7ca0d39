"""`Hyper-iNGP`: ATT3D-style text-conditioned hypernetwork geometry.

Parity target: reference
`custom/amortized/models/geometry/hyper_iNGP.py:18-425`:
- `LinearHyperNetwork` maps the pooled CLIP text embedding (c_dim) to the
  weights of tiny per-prompt linear heads (sdf enc->64->1, feature
  enc->64->3), xavier-init SiLU+LayerNorm trunk (:18-111),
- shared (prompt-independent) HashGrid encoding,
- forward = batched matmul of encodings against generated weights
  (`hypernet_forward` :238-259),
- sphere `sdf_bias` support.

TPU notes: the per-prompt bmm is exactly an MXU-shaped einsum
(`bnc,bco->bno`); analytic normals via jax.grad are offered in addition to
the reference's finite differences (SURVEY.md §7.3-4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ... import register
from ...ops.math import contract_to_unisphere, safe_normalize
from ...ops.networks import get_encoding
from .base import ImplicitGeometryConfig, bbox_from_radius


class LinearHyperNetwork(nn.Module):
    """text embedding [B, c_dim] -> dict of per-sample weight stacks."""
    n_input_dims: int
    c_dim: int = 1024
    out_dims: Dict[str, Any] = None
    n_neurons: int = 64
    n_hidden_layers: int = 1
    output_activation: Optional[str] = None

    def _weight_shapes(self):
        out = {}
        for key, val in (self.out_dims or {
                "sdf_weights": [64, 1], "feature_weights": [64, 3]}).items():
            dims = [self.n_input_dims] + (list(val) if isinstance(
                val, (list, tuple)) else [val])
            out[key] = list(zip(dims[:-1], dims[1:]))
        return out

    @property
    def n_output_dims(self):
        return sum(i * o for shapes in self._weight_shapes().values()
                   for i, o in shapes)

    @nn.compact
    def __call__(self, text_embed):
        xavier = nn.initializers.xavier_normal()
        h = nn.Dense(self.n_neurons, use_bias=False, kernel_init=xavier,
                     name="layers_0")(text_embed)
        h = nn.LayerNorm(name="norm_0")(h)
        h = nn.silu(h)
        for i in range(self.n_hidden_layers - 1):
            h = nn.Dense(self.n_neurons, kernel_init=xavier,
                         bias_init=nn.initializers.zeros,
                         name=f"layers_{i + 1}")(h)
            h = nn.LayerNorm(name=f"norm_{i + 1}")(h)
            h = nn.silu(h)
        out = nn.Dense(self.n_output_dims, kernel_init=xavier,
                       bias_init=nn.initializers.zeros, name="layers_out")(h)

        result = {}
        start = 0
        for key, shapes in self._weight_shapes().items():
            params = []
            for cin, cout in shapes:
                end = start + cin * cout
                params.append(out[..., start:end].reshape(
                    *text_embed.shape[:-1], cin, cout))
                start = end
            result[key] = params
        return result


def hypernet_forward(enc, weight_list, activation=jax.nn.relu,
                     output_activation=None):
    """Batched per-sample linear stack: enc [B, N, C] x weights [B, C, C']
    (reference hyper_iNGP.py:238-259; bias-free)."""
    h = enc
    for idx, w in enumerate(weight_list):
        h = jnp.einsum("bnc,bco->bno", h, w)
        if idx < len(weight_list) - 1 and activation is not None:
            h = activation(h)
        elif idx == len(weight_list) - 1 and output_activation is not None:
            h = output_activation(h)
    return h


@register("Hyper-iNGP")
class HyperINGP(nn.Module):
    @dataclass
    class Config(ImplicitGeometryConfig):
        hypernet_config: dict = field(default_factory=lambda: {
            "c_dim": 1024,
            "out_dims": {"sdf_weights": [64, 1], "feature_weights": [64, 3]},
            "spectral_norm": False,
            "n_neurons": 64,
            "n_hidden_layers": 1,
            "output_activation": None,
        })
        backbone: str = "linear_hypernetwork"
        shape_init: Optional[str] = None
        shape_init_params: Optional[Any] = None
        force_shape_init: bool = False
        sdf_bias: Any = 0.0
        sdf_bias_params: Optional[Any] = None
        isosurface_remove_outliers: bool = False

    cfg: "HyperINGP.Config"

    def setup(self):
        self.encoding = get_encoding(
            self.cfg.n_input_dims, self.cfg.pos_encoding_config)
        hc = self.cfg.hypernet_config
        self.hypernet = LinearHyperNetwork(
            n_input_dims=self.encoding.n_output_dims,
            c_dim=hc.get("c_dim", 1024),
            out_dims=hc.get("out_dims"),
            n_neurons=hc.get("n_neurons", 64),
            n_hidden_layers=hc.get("n_hidden_layers", 1),
            output_activation=hc.get("output_activation"))

    @property
    def bbox(self):
        return bbox_from_radius(self.cfg.radius)

    def get_shifted_sdf(self, points, sdf):
        bias = self.cfg.sdf_bias
        if bias == "sphere":
            radius = float(self.cfg.sdf_bias_params)
            return sdf + (jnp.linalg.norm(points, axis=-1, keepdims=True)
                          - radius)
        if bias == "ellipsoid":
            size = jnp.asarray(self.cfg.sdf_bias_params, jnp.float32)
            return sdf + (jnp.linalg.norm(points / size, axis=-1,
                                          keepdims=True) - 1.0)
        if isinstance(bias, (int, float)):
            return sdf + bias
        raise ValueError(f"Unknown sdf bias {bias}")

    def generate_space_cache(self, styles=None, text_embed=None):
        """ONE hypernet forward per batch (reference :229-236)."""
        return self.hypernet(text_embed)

    def init_all(self, points, text_embed, styles=None):
        """Initialization helper exercising every submodule (hypernet +
        encoding) so `module.init(..., method=init_all)` creates all params."""
        cache = self.generate_space_cache(styles, text_embed)
        return self(points, cache, output_normal=True)

    # proposal-pass static level truncation is supported (renderer
    # `prop_encode_levels`; see HashGridEncoding max_levels)
    supports_prop_max_levels = True

    def _encode(self, points, max_levels=None):
        pts = contract_to_unisphere(points, self.bbox, self.cfg.unbounded)
        B = points.shape[0]
        kw = {} if max_levels is None else {"max_levels": max_levels}
        enc = self.encoding(pts.reshape(-1, self.cfg.n_input_dims), **kw)
        return enc.reshape(B, -1, enc.shape[-1])

    def forward_sdf(self, points, space_cache, max_levels=None):
        """points [B, N, 3] -> sdf [B, N, 1]."""
        orig = points.shape
        points3 = points.reshape(orig[0], -1, 3)
        enc = self._encode(points3, max_levels=max_levels)
        sdf = hypernet_forward(enc, space_cache["sdf_weights"])
        sdf = self.get_shifted_sdf(points3, sdf)
        return sdf.reshape(*orig[:-1], 1)

    def __call__(self, points, space_cache, output_normal: bool = False):
        """points [B, N, 3] with per-sample space_cache; returns flattened
        [B*N, .] outputs (reference forward :261-325)."""
        B, N, _ = points.shape
        points_unscaled = points
        denc = None
        if output_normal and self.cfg.normal_type == "analytic":
            if self.cfg.unbounded:
                raise NotImplementedError(
                    "analytic normals assume the linear bbox contraction "
                    "jacobian; use finite_difference with unbounded=True")
            # ONE fused encode serves sdf, features AND normals — the
            # gathers (the TPU bottleneck) are paid once; a separate plain
            # encode here would double both the forward and the backward
            # (trace-profiled in r2: two full scatter/scan passes)
            pts_unit = contract_to_unisphere(
                points_unscaled, self.bbox, self.cfg.unbounded)
            enc_flat, denc = self.encoding(
                pts_unit.reshape(-1, 3), with_grad=True)
            enc = enc_flat.reshape(B, N, -1)
        else:
            enc = self._encode(points)
        sdf = hypernet_forward(enc, space_cache["sdf_weights"])
        sdf = self.get_shifted_sdf(points_unscaled, sdf)
        out = {"sdf": sdf.reshape(B * N, 1)}
        if self.cfg.n_feature_dims > 0:
            feat = hypernet_forward(enc, space_cache["feature_weights"])
            out["features"] = feat.reshape(B * N, self.cfg.n_feature_dims)
        if output_normal:
            nt = self.cfg.normal_type
            if nt == "finite_difference":
                # one eval per axis: avoids a [B, N, 3, 3] tensor whose
                # trailing dims pad catastrophically under TPU (8,128)
                # tiling (1.1 GB for 790k points)
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
                # denc computed above by the shared fused encode
                enc_b = enc
                w_list = space_cache["sdf_weights"]

                def head(e):
                    return hypernet_forward(e, w_list)

                grads = []
                # d pts_unit / d points = 1 / (2 * radius) (uniform bbox)
                scale = 1.0 / (2.0 * self.cfg.radius)
                for axis in range(3):
                    tangent = denc[axis].reshape(B, N, -1)
                    _, dsdf = jax.jvp(head, (enc_b,), (tangent,))
                    grads.append(dsdf * scale)
                sdf_net_grad = jnp.concatenate(grads, axis=-1)  # [B, N, 3]
                # + gradient of the closed-form sdf bias
                if self.cfg.sdf_bias == "sphere":
                    r = jnp.linalg.norm(points_unscaled, axis=-1,
                                        keepdims=True)
                    bias_grad = points_unscaled / jnp.maximum(r, 1e-8)
                elif self.cfg.sdf_bias == "ellipsoid":
                    size = jnp.asarray(self.cfg.sdf_bias_params, jnp.float32)
                    q = points_unscaled / size
                    rq = jnp.linalg.norm(q, axis=-1, keepdims=True)
                    bias_grad = q / (jnp.maximum(rq, 1e-8) * size)
                else:
                    bias_grad = jnp.zeros_like(points_unscaled)
                sdf_grad = sdf_net_grad + bias_grad
            else:
                raise NotImplementedError(f"normal_type {nt}")
            normal = safe_normalize(sdf_grad)
            out.update({
                "normal": normal.reshape(B * N, 3),
                "shading_normal": normal.reshape(B * N, 3),
                "sdf_grad": sdf_grad.reshape(B * N, 3),
            })
        return out

    def forward_field(self, points, space_cache):
        return self.forward_sdf(points, space_cache), None

    def forward_level(self, field, threshold):
        return field - threshold

    def export(self, points, space_cache):
        B = points.shape[0]
        enc = self._encode(points.reshape(B, -1, 3))
        feat = hypernet_forward(enc, space_cache["feature_weights"])
        return {"features": feat.reshape(*points.shape[:-1],
                                         self.cfg.n_feature_dims)}
