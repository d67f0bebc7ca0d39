"""Background models: neural env map, solid color, textured.

Parity targets:
- `neural-environment-map-background`
  (reference threestudio/models/background/neural_environment_map_background.py:15-67)
- `solid-color-background`, `textured-background`
  (solid_color_background.py:13-51, textured_background.py).

Random background augmentation (reference :56-66) is jit-pure here: the
Bernoulli draw and random color come from linen's rng stream ("aug") and mix
via arithmetic select — no Python branch, no retrace, no DDP `color*0+` hack.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ... import register
from ...ops.math import get_activation
from ...ops.networks import get_encoding, get_mlp


def _apply_random_aug(module, color, dirs, prob: float, n_out: int):
    """Blend per-batch random solid color with probability `prob`."""
    key = module.make_rng("aug")
    k1, k2 = jax.random.split(key)
    use_aug = jax.random.bernoulli(k1, prob)
    rand_color = jax.random.uniform(k2, (dirs.shape[0],) + (1,) * (dirs.ndim - 2)
                                    + (n_out,))
    rand_color = jnp.broadcast_to(rand_color, color.shape)
    return jnp.where(use_aug, rand_color, color)


@register("neural-environment-map-background")
class NeuralEnvironmentMapBackground(nn.Module):
    @dataclass
    class Config:
        n_output_dims: int = 3
        color_activation: str = "sigmoid"
        dir_encoding_config: dict = field(default_factory=lambda: {
            "otype": "HashGrid", "n_levels": 4, "n_features_per_level": 2,
            "log2_hashmap_size": 19, "base_resolution": 4,
            "per_level_scale": 4.0})
        mlp_network_config: dict = field(default_factory=lambda: {
            "otype": "VanillaMLP", "activation": "ReLU",
            "n_neurons": 16, "n_hidden_layers": 2})
        random_aug: bool = False
        random_aug_prob: float = 0.5
        eval_color: Optional[Tuple[float, float, float]] = None

    cfg: "NeuralEnvironmentMapBackground.Config"

    def setup(self):
        self.encoding = get_encoding(3, self.cfg.dir_encoding_config)
        self.network = get_mlp(
            self.cfg.n_output_dims, self.cfg.mlp_network_config)

    def __call__(self, dirs, train: bool = True):
        """dirs: [B, ..., 3] normalized view directions."""
        if not train and self.cfg.eval_color is not None:
            return jnp.broadcast_to(
                jnp.asarray(self.cfg.eval_color, jnp.float32),
                (*dirs.shape[:-1], self.cfg.n_output_dims))
        d01 = (dirs + 1.0) / 2.0
        emb = self.encoding(d01.reshape(-1, 3))
        color = self.network(emb).reshape(
            *dirs.shape[:-1], self.cfg.n_output_dims)
        color = get_activation(self.cfg.color_activation)(color)
        if train and self.cfg.random_aug:
            color = _apply_random_aug(
                self, color, dirs, self.cfg.random_aug_prob,
                self.cfg.n_output_dims)
        return color


@register("solid-color-background")
class SolidColorBackground(nn.Module):
    @dataclass
    class Config:
        n_output_dims: int = 3
        color: Tuple = (1.0, 1.0, 1.0)
        learned: bool = False
        random_aug: bool = False
        random_aug_prob: float = 0.5

    cfg: "SolidColorBackground.Config"

    @nn.compact
    def __call__(self, dirs, train: bool = True):
        if self.cfg.learned:
            env_color = self.param(
                "env_color",
                lambda k: jnp.asarray(self.cfg.color, jnp.float32))
        else:
            env_color = jnp.asarray(self.cfg.color, jnp.float32)
        color = jnp.broadcast_to(
            env_color, (*dirs.shape[:-1], self.cfg.n_output_dims))
        if train and self.cfg.random_aug:
            color = _apply_random_aug(
                self, color, dirs, self.cfg.random_aug_prob,
                self.cfg.n_output_dims)
        return color


@register("textured-background")
class TexturedBackground(nn.Module):
    """Learned equirect texture sampled by view direction
    (reference textured_background.py)."""

    @dataclass
    class Config:
        n_output_dims: int = 3
        height: int = 64
        width: int = 64
        color_activation: str = "sigmoid"

    cfg: "TexturedBackground.Config"

    @nn.compact
    def __call__(self, dirs, train: bool = True):
        cfg = self.cfg
        texture = self.param(
            "texture",
            nn.initializers.zeros,
            (1, cfg.height, cfg.width, cfg.n_output_dims))
        # spherical coords of view dir -> texture uv
        x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
        theta = jnp.arccos(jnp.clip(z, -1 + 1e-6, 1 - 1e-6))  # [0, pi]
        phi = jnp.arctan2(y, x)  # [-pi, pi]
        v = theta / jnp.pi * (cfg.height - 1)
        u = (phi / jnp.pi + 1) / 2 * (cfg.width - 1)
        # bilinear sample
        u0, v0 = jnp.floor(u).astype(jnp.int32), jnp.floor(v).astype(jnp.int32)
        u1 = jnp.clip(u0 + 1, 0, cfg.width - 1)
        v1 = jnp.clip(v0 + 1, 0, cfg.height - 1)
        u0 = jnp.clip(u0, 0, cfg.width - 1)
        v0 = jnp.clip(v0, 0, cfg.height - 1)
        fu, fv = u - u0, v - v0
        tex = texture[0]
        c = (tex[v0, u0] * ((1 - fu) * (1 - fv))[..., None]
             + tex[v0, u1] * (fu * (1 - fv))[..., None]
             + tex[v1, u0] * ((1 - fu) * fv)[..., None]
             + tex[v1, u1] * (fu * fv)[..., None])
        return get_activation(self.cfg.color_activation)(c)
