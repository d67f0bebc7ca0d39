"""`scaledreamer-system`: single-prompt ASD training system.

Parity target: reference `threestudio/systems/scaledreamer.py:14-315`
(StableDreamer): coarse-stage loss assembly (asd + orient + sparsity +
opaque + z-variance [+ eikonal]), validation/test orbit rendering to image
grids and mp4. The geometry/texture mesh stages (reference :105-160) are a
later-round item (requires the differentiable rasterizer).
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
