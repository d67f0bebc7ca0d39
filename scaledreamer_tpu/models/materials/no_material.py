"""`no-material`: passthrough feature→color activation.

Parity target: reference `threestudio/models/materials/no_material.py:15-63`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ... import register
from ...ops.math import get_activation
from ...ops.networks import get_mlp


@register("no-material")
class NoMaterial(nn.Module):
    @dataclass
    class Config:
        n_output_dims: int = 3
        color_activation: str = "sigmoid"
        input_feature_dims: Optional[int] = None
        mlp_network_config: Optional[dict] = None
        requires_normal: bool = False

    cfg: "NoMaterial.Config"

    @property
    def requires_normal(self) -> bool:
        return self.cfg.requires_normal

    def setup(self):
        self.use_network = (self.cfg.input_feature_dims is not None
                            and self.cfg.mlp_network_config is not None)
        if self.use_network:
            self.network = get_mlp(
                self.cfg.n_output_dims, self.cfg.mlp_network_config)

    def __call__(self, features, **kwargs):
        if not self.use_network:
            assert features.shape[-1] == self.cfg.n_output_dims
            return get_activation(self.cfg.color_activation)(features)
        color = self.network(features.reshape(-1, features.shape[-1])).reshape(
            *features.shape[:-1], self.cfg.n_output_dims)
        return get_activation(self.cfg.color_activation)(color)

    def export(self, features, **kwargs):
        color = jnp.clip(self(features, **kwargs), 0.0, 1.0)
        return {"albedo": color[..., :3]}
