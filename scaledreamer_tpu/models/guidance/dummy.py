"""`dummy-guidance`: analytic gradient toward a target color image.

The reference ships no fake guidance (SURVEY.md §4: "No fake
guidance/renderer exists... (d) a dummy-guidance ... so the full train loop
runs in seconds without diffusion weights" — this implements that
recommendation). The loss pulls the rendered image toward a constant target
color with the same reparameterized-MSE form as ASD, so the full system /
optimizer / schedule plumbing is exercised end-to-end in tests and smoke
runs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from ... import register
from ...core.base import BaseObject


@register("dummy-guidance")
class DummyGuidance(BaseObject):
    @dataclass
    class Config:
        target_color: Tuple[float, float, float] = (0.8, 0.2, 0.2)
        scale: float = 1.0

    cfg: Config

    def configure(self) -> None:
        self.params = {}

    def init_params(self, rng, param_dtype=None):
        return self.params

    def __call__(self, params, rng, rgb, prompt_utils=None, elevation=None,
                 azimuth=None, camera_distances=None, min_step_percent=0.0,
                 max_step_percent=1.0, grad_clip_val=None, **kwargs):
        target = jnp.asarray(self.cfg.target_color, jnp.float32)
        grad = self.cfg.scale * (rgb - target)
        tgt = jax.lax.stop_gradient(rgb - grad)
        loss = 0.5 * jnp.sum((rgb - tgt) ** 2) / rgb.shape[0]
        return {"loss_asd": loss, "grad_norm": jnp.linalg.norm(grad),
                "min_step": jnp.asarray(0), "max_step": jnp.asarray(0)}

    def schedule_scalars(self, epoch: int, global_step: int) -> dict:
        return {"min_step_percent": 0.0, "max_step_percent": 1.0}
