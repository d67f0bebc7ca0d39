"""Component base classes and the update protocol.

Parity target: reference `threestudio/utils/base.py:21-118`
(Configurable / Updateable / BaseObject / BaseModule). The TPU-native twist:
components that own learnable parameters are Flax linen modules (pure
functions of params), so there is no device buffer bookkeeping (`_dummy`) and
no in-place `weights:` loading — parameter surgery happens on pytrees at
state-construction time (see systems/base.py).

The Updateable protocol is kept host-side for things that genuinely change
Python-visible state between steps (dataset resolution milestones, cached
embedding rotation). Anything that merely anneals a scalar is instead a
`ScheduleSet` entry evaluated per step and fed to the jitted step as a traced
scalar input — this is what keeps the whole step one XLA program.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Optional

from .config import parse_structured


class Updateable:
    """Recursive per-step update hook (reference utils/base.py:21-74)."""

    def do_update_step(self, epoch: int, global_step: int,
                       on_load_weights: bool = False):
        for child in self._updateable_children():
            child.do_update_step(epoch, global_step, on_load_weights)
        self.update_step(epoch, global_step, on_load_weights)

    def do_update_step_end(self, epoch: int, global_step: int):
        for child in self._updateable_children():
            child.do_update_step_end(epoch, global_step)
        self.update_step_end(epoch, global_step)

    def update_step(self, epoch: int, global_step: int,
                    on_load_weights: bool = False):
        pass

    def update_step_end(self, epoch: int, global_step: int):
        pass

    def _updateable_children(self):
        for attr in vars(self).values():
            if isinstance(attr, Updateable):
                yield attr


def update_if_possible(module: Any, epoch: int, global_step: int) -> None:
    if hasattr(module, "do_update_step"):
        module.do_update_step(epoch, global_step)


def update_end_if_possible(module: Any, epoch: int, global_step: int) -> None:
    if hasattr(module, "do_update_step_end"):
        module.do_update_step_end(epoch, global_step)


class BaseObject(Updateable):
    """Non-learnable component with a structured Config (utils/base.py:77-94)."""

    @dataclass
    class Config:
        pass

    cfg: Any

    def __init__(self, cfg: Optional[dict] = None, *args, **kwargs):
        super().__init__()
        self.cfg = parse_structured(self.Config, cfg)
        self.configure(*args, **kwargs)

    def configure(self, *args, **kwargs) -> None:
        pass


def cfg_field(**kwargs):
    """Shorthand default_factory field for nested config dataclasses."""
    return dataclasses.field(default_factory=lambda: dict(kwargs))
