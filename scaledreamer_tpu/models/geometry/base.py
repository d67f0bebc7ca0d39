"""Geometry base: config surface + bbox/contraction helpers.

Parity target: reference `threestudio/models/geometry/base.py:54-188`
(BaseImplicitGeometry): bbox from `radius`, `contract_to_unisphere`,
isosurface drive. Isosurface extraction lives in
`scaledreamer_tpu/models/isosurface.py` (offline CPU path) and is invoked by
exporters, not by the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Union

import jax.numpy as jnp

from ...ops.math import contract_to_unisphere  # noqa: F401  (re-export)


@dataclass
class BaseGeometryConfig:
    radius: float = 1.0
    isosurface: bool = True
    isosurface_method: str = "mc-cpu"
    isosurface_resolution: int = 128
    isosurface_threshold: Union[float, str] = 0.0
    isosurface_chunk: int = 0
    isosurface_coarse_to_fine: bool = True
    isosurface_deformable_grid: bool = False
    isosurface_remove_outliers: bool = True
    isosurface_outlier_n_faces_threshold: Union[int, float] = 0.01


def bbox_from_radius(radius: float) -> jnp.ndarray:
    return jnp.asarray(
        [[-radius, -radius, -radius], [radius, radius, radius]], jnp.float32)


@dataclass
class ImplicitGeometryConfig(BaseGeometryConfig):
    n_input_dims: int = 3
    n_feature_dims: int = 3
    pos_encoding_config: dict = field(default_factory=lambda: {
        "otype": "HashGrid",
        "n_levels": 16,
        "n_features_per_level": 2,
        "log2_hashmap_size": 19,
        "base_resolution": 16,
        "per_level_scale": 1.447269237440378,
    })
    mlp_network_config: dict = field(default_factory=lambda: {
        "otype": "VanillaMLP",
        "activation": "ReLU",
        "output_activation": "none",
        "n_neurons": 64,
        "n_hidden_layers": 1,
    })
    normal_type: Optional[str] = "finite_difference"
    finite_difference_normal_eps: Any = 0.01
    unbounded: bool = False
