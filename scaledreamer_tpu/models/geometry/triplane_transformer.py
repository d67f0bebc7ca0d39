"""`Triplane-transformer-sdf`: OpenLRM-style triplane transformer generator.

Parity targets:
- `custom/amortized/extern/triplane_transformer_modules.py:9-187`
  (ModLN-free variant actually used: ConditionModulationBlock with
  cross-attn on 77-token local text, or the token-concat woCrossAttn
  variant), learned pos-embed of 3x32² tokens, 12 layers, deconv x2 to
  3x64²x32 triplane;
- `custom/amortized/models/geometry/triplane_transformer.py:20-316` wrapper:
  EG3D-bugfixed plane projection + grid_sample concat -> SDF/feature MLPs;
- `custom/amortized/models/geometry/utils.py:29-97` plane sampling. The
  fixed plane projections reduce to P0=(x,y), P1=(x,z), P2=(z,y).

TPU notes: attention over 3072 triplane tokens at 768 dim is pure
MXU work; plane sampling is the shared `grid_sample_2d` gather+lerp.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ... import register
from ...ops.grid_sample import grid_sample_2d
from ...ops.math import safe_normalize, scale_tensor
from ...ops.networks import get_mlp
from .base import ImplicitGeometryConfig, bbox_from_radius


class MHAttention(nn.Module):
    """diffusers.Attention equivalent: bias-free qkv, out proj with bias."""
    query_dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        d = self.query_dim
        q = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(d, use_bias=False, dtype=self.dtype, name="to_v")(context)
        B, L, _ = q.shape
        S = k.shape[1]
        hd = d // self.heads
        q = q.reshape(B, L, self.heads, hd)
        k = k.reshape(B, S, self.heads, hd)
        v = v.reshape(B, S, self.heads, hd)
        attn = jnp.einsum("blhd,bshd->bhls", q, k,
                          preferred_element_type=jnp.float32) / jnp.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = attn.astype(v.dtype)
        out = jnp.einsum("bhls,bshd->blhd", attn, v).reshape(B, L, d)
        return nn.Dense(d, dtype=self.dtype, name="to_out")(out)


class ConditionModulationBlock(nn.Module):
    """cross-attn + self-attn + MLP (triplane_transformer_modules.py:33-72)."""
    inner_dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        h = nn.LayerNorm(epsilon=self.eps, name="norm1")(x)
        x = x + MHAttention(self.inner_dim, self.num_heads, dtype=self.dtype,
                            name="cross_attn")(h, cond)
        h = nn.LayerNorm(epsilon=self.eps, name="norm2")(x)
        x = x + MHAttention(self.inner_dim, self.num_heads, dtype=self.dtype,
                            name="self_attn")(h)
        h = nn.LayerNorm(epsilon=self.eps, name="norm3")(x)
        h = nn.Dense(int(self.inner_dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_0")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.inner_dim, dtype=self.dtype, name="mlp_1")(h)
        return x + h


class ConditionModulationBlockWoCrossAttn(nn.Module):
    """token-concat variant (triplane_transformer_modules.py:74-113)."""
    inner_dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cond):
        x = jnp.concatenate([cond, x], axis=1)
        h = nn.LayerNorm(epsilon=self.eps, name="norm2")(x)
        x = x + MHAttention(self.inner_dim, self.num_heads, dtype=self.dtype,
                            name="self_attn")(h)
        h = nn.LayerNorm(epsilon=self.eps, name="norm3")(x)
        h = nn.gelu(h)
        h = nn.Dense(int(self.inner_dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_0")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.inner_dim, dtype=self.dtype, name="mlp_1")(h)
        x = x + h
        return x[:, cond.shape[1]:, :]


class TriplaneTransformer(nn.Module):
    """text embedding -> triplane [B, 3, H', W', C]
    (triplane_transformer_modules.py:116-187; NHWC planes here)."""
    inner_dim: int = 768
    condition_dim: int = 1024
    triplane_low_res: int = 32
    triplane_high_res: int = 64
    triplane_dim: int = 32
    num_layers: int = 12
    num_heads: int = 16
    local_text: bool = False
    mlp_ratio: float = 4.0
    eps: float = 1e-6
    # bf16 attention/MLP compute (params and LayerNorms stay f32)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, text_embed):
        N = text_embed.shape[0]
        H = W = self.triplane_low_res
        L = 3 * H * W
        pos_embed = self.param(
            "pos_embed",
            lambda k, s: jax.random.normal(k, s) * (1.0 / self.inner_dim) ** 0.5,
            (1, L, self.inner_dim))
        if not self.local_text:
            cond = nn.Dense(self.inner_dim, name="proj")(text_embed)
            cond = cond[:, None, :]
        else:
            cond = text_embed  # [N, 77, condition_dim]
        x = jnp.broadcast_to(pos_embed, (N, L, self.inner_dim))
        Block = (ConditionModulationBlock if self.local_text
                 else ConditionModulationBlockWoCrossAttn)
        for i in range(self.num_layers):
            x = nn.remat(Block)(self.inner_dim, self.num_heads,
                                self.mlp_ratio, self.eps,
                                dtype=self.dtype,
                                name=f"layers_{i}")(x, cond)
        x = nn.LayerNorm(epsilon=self.eps, name="norm")(x)
        # [N, 3, H, W, D] -> deconv x2 per plane
        x = x.reshape(N * 3, H, W, self.inner_dim)
        x = nn.ConvTranspose(self.triplane_dim, (2, 2), strides=(2, 2),
                             use_bias=False, name="deconv")(x)
        Hh = self.triplane_high_res
        return x.reshape(N, 3, Hh, Hh, self.triplane_dim)


def sample_from_planes(planes, coordinates):
    """planes [B, 3, H, W, C]; coordinates [B, M, 3] in [-1, 1] (box_warp=2)
    -> [B, M, 3*C] (reference utils.py:82-97, OpenLRM concat layout)."""
    B, n_planes, H, W, C = planes.shape
    x, y, z = (coordinates[..., 0], coordinates[..., 1], coordinates[..., 2])
    projections = [
        jnp.stack([x, y], axis=-1),   # plane 0: (x, y)
        jnp.stack([x, z], axis=-1),   # plane 1: (x, z)
        jnp.stack([z, y], axis=-1),   # plane 2: (z, y)
    ]
    feats = [grid_sample_2d(planes[:, i], projections[i],
                            align_corners=False)
             for i in range(3)]
    return jnp.concatenate(feats, axis=-1)  # [B, M, 3C]


@register("Triplane-transformer-sdf")
class TriplaneTransformerSDF(nn.Module):
    @dataclass
    class Config(ImplicitGeometryConfig):
        space_generator_config: dict = field(default_factory=lambda: {
            "inner_dim": 768, "condition_dim": 1024,
            "triplane_low_res": 32, "triplane_high_res": 64,
            "triplane_dim": 32, "num_layers": 12, "num_heads": 16,
            "flash_attention": False, "local_text": False, "mlp_ratio": 4})
        backbone: str = "triplane_transformer"
        sdf_bias: Any = 0.0
        sdf_bias_params: Optional[Any] = None
        isosurface_remove_outliers: bool = False

    cfg: "TriplaneTransformerSDF.Config"

    def setup(self):
        g = self.cfg.space_generator_config
        self.space_generator = TriplaneTransformer(
            inner_dim=g.get("inner_dim", 768),
            condition_dim=g.get("condition_dim", 1024),
            triplane_low_res=g.get("triplane_low_res", 32),
            triplane_high_res=g.get("triplane_high_res", 64),
            triplane_dim=g.get("triplane_dim", 32),
            num_layers=g.get("num_layers", 12),
            num_heads=g.get("num_heads", 16),
            local_text=g.get("local_text", False),
            mlp_ratio=float(g.get("mlp_ratio", 4)),
            dtype=({"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
                g.get("dtype", "float32")]))
        self.sdf_network = get_mlp(1, self.cfg.mlp_network_config)
        if self.cfg.n_feature_dims > 0:
            self.feature_network = get_mlp(
                self.cfg.n_feature_dims, self.cfg.mlp_network_config)

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

    def generate_space_cache(self, styles=None, text_embed=None):
        return self.space_generator(text_embed)

    def _encode(self, points):
        """points [B, N, 3] world -> plane features [B, N, 3C]."""
        pts = scale_tensor(points, (self.bbox[0], self.bbox[1]), (-1.0, 1.0))
        return pts

    def forward_sdf(self, points, space_cache):
        orig = points.shape
        B = orig[0]
        pts = points.reshape(B, -1, 3)
        pts_n = self._encode(pts)
        enc = sample_from_planes(space_cache, pts_n)
        sdf = self.sdf_network(enc)
        sdf = self.get_shifted_sdf(pts, sdf)
        return sdf.reshape(*orig[:-1], 1)

    def __call__(self, points, space_cache, output_normal: bool = False):
        B, N, _ = points.shape
        points_unscaled = points
        pts_n = self._encode(points)
        enc = sample_from_planes(space_cache, pts_n)
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
        pts_n = self._encode(points.reshape(B, -1, 3))
        enc = sample_from_planes(space_cache, pts_n)
        return {"features": self.feature_network(enc).reshape(
            *points.shape[:-1], self.cfg.n_feature_dims)}

    def init_all(self, points, text_embed, styles=None):
        cache = self.generate_space_cache(styles, text_embed)
        return self(points, cache, output_normal=True)
