"""`scaledreamer-system`: single-prompt ASD training system.

Parity target: reference `threestudio/systems/scaledreamer.py:14-315`
(StableDreamer). This class is a thin registration shell: all stage logic —
coarse-stage loss assembly (asd + orient + sparsity + opaque + z-variance
[+ eikonal]) AND the geometry/texture mesh stages incl. the double-guidance
combos (reference :105-160) — lives in `BaseLift3DSystem`
(systems/base.py, see make_train_step / compute_regularization_losses),
with mesh rasterization in `models/renderers/mesh_rasterize.py`
(tested: tests/test_mesh_stage.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from .. import register
from .base import BaseLift3DSystem


@register("scaledreamer-system")
class ScaleDreamerSystem(BaseLift3DSystem):
    @dataclass
    class Config(BaseLift3DSystem.Config):
        pass

    cfg: Config
