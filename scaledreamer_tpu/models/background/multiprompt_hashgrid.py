"""`multiprompt-neural-hashgrid-environment-map-background`.

Parity target: reference
`custom/amortized/models/background/multiprompt_neural_environment_hashgrid_map_background.py:17-116`:
text-conditioned sky — a LinearHyperNetwork generates per-prompt
`bg_weights: [64, 3]` applied to hashgrid-encoded view directions via
batched matmul.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ... import register
from ...ops.math import get_activation
from ...ops.networks import get_encoding
from ..geometry.hyper_ingp import LinearHyperNetwork, hypernet_forward
from .backgrounds import _apply_random_aug


@register("multiprompt-neural-hashgrid-environment-map-background")
class MultipromptNeuralHashgridBackground(nn.Module):
    @dataclass
    class Config:
        n_output_dims: int = 3
        color_activation: str = "sigmoid"
        pos_encoding_config: dict = field(default_factory=lambda: {
            "otype": "HashGrid", "n_levels": 8, "n_features_per_level": 2,
            "log2_hashmap_size": 19, "base_resolution": 4,
            "per_level_scale": 1.8114473285278132})
        hypernet_config: dict = field(default_factory=lambda: {
            "c_dim": 1024,
            "out_dims": {"bg_weights": [64, 3]},
            "spectral_norm": False,
            "n_neurons": 64,
            "n_hidden_layers": 1,
            "output_activation": None})
        random_aug: bool = False
        random_aug_prob: float = 0.5
        eval_color: Optional[Tuple[float, float, float]] = None

    cfg: "MultipromptNeuralHashgridBackground.Config"
    accepts_text_embed: bool = True

    def setup(self):
        self.encoding = get_encoding(3, self.cfg.pos_encoding_config)
        hc = self.cfg.hypernet_config
        self.hypernet = LinearHyperNetwork(
            n_input_dims=self.encoding.n_output_dims,
            c_dim=hc.get("c_dim", 1024),
            out_dims=hc.get("out_dims"),
            n_neurons=hc.get("n_neurons", 64),
            n_hidden_layers=hc.get("n_hidden_layers", 1),
            output_activation=hc.get("output_activation"))

    def __call__(self, dirs, text_embed=None, train: bool = True):
        B = dirs.shape[0]
        if not train and self.cfg.eval_color is not None:
            return jnp.broadcast_to(
                jnp.asarray(self.cfg.eval_color, jnp.float32),
                (*dirs.shape[:-1], self.cfg.n_output_dims))
        bg_cache = self.hypernet(text_embed)
        d01 = (dirs + 1.0) / 2.0
        emb = self.encoding(d01.reshape(-1, 3))
        color = hypernet_forward(
            emb.reshape(B, -1, emb.shape[-1]), bg_cache["bg_weights"])
        color = color.reshape(*dirs.shape[:-1], self.cfg.n_output_dims)
        color = get_activation(self.cfg.color_activation)(color)
        if train and self.cfg.random_aug:
            color = _apply_random_aug(self, color, dirs,
                                      self.cfg.random_aug_prob,
                                      self.cfg.n_output_dims)
        return color
