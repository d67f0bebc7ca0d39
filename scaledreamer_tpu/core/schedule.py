"""Scalar schedule mini-language ("C()") and schedule bundling.

Behavior-parity reimplementation of the reference scalar-schedule
interpolator (threestudio/utils/misc.py:66-101): any numeric config value may
instead be a list

    [start_step, start_value, end_value, end_step, (end_value2, end_step2, ...)]

interpolated per global step (int end_step) or per epoch (float end_step),
with linear or exp interpolation. A bare 3-list gets start_step=0 prepended;
6+ element lists chain multiple segments.

TPU-first design note: schedules are evaluated HOST-side each step and fed
into the single jitted train step as scalar array inputs, so annealing never
triggers a retrace (SURVEY.md §7.1).
"""

from __future__ import annotations

import math
from typing import Any, Dict

def C(value: Any, epoch, global_step: int, interpolation: str = "linear") -> float:
    """Reference-parity scalar schedule (reference threestudio/utils/misc.py:66-101).

    epoch may be None: the trainer passes None when no epoch axis is
    configured (trainer.steps_per_epoch == 0), which makes epoch-mode
    schedules (float end_step) an explicit error instead of a silent
    freeze at the start value.
    """
    if isinstance(value, (int, float)):
        return value
    value = list(value)
    if not isinstance(value, list):
        raise TypeError(f"Scalar schedule only supports list, got {type(value)}")
    if len(value) == 3:
        value = [0] + value
    if len(value) >= 6:
        # multi-segment: [s0, v0, v1, e1, v2, e2, ...]; pick the active segment
        select_i = 3
        for i in range(3, len(value) - 2, 2):
            if global_step >= value[i]:
                select_i = i + 2
        if select_i != 3:
            start_value, start_step = value[select_i - 3], value[select_i - 2]
        else:
            start_step, start_value = value[:2]
        end_value, end_step = value[select_i - 1], value[select_i]
        value = [start_step, start_value, end_value, end_step]
    if len(value) != 4:
        raise ValueError(f"Bad schedule spec: {value}")
    start_step, start_value, end_value, end_step = value
    if isinstance(end_step, float) and epoch is None:
        # float end_step selects EPOCH interpolation (reference
        # misc.py:84-95). The trainer is step-based over infinite iterable
        # datasets; unless trainer.steps_per_epoch defines an epoch axis,
        # an epoch-mode schedule would stay frozen at its start value
        # forever — reject it instead of silently misbehaving (the
        # reference has the same trap: its PL epochs over infinite
        # iterable datasets never advance either).
        raise ValueError(
            f"C() schedule {value} uses EPOCH interpolation (float "
            "end_step) but the trainer has no epoch axis — set "
            "trainer.steps_per_epoch to define the epoch length, or use "
            "integer steps")
    current = epoch if isinstance(end_step, float) else global_step
    denom = end_step - start_step
    t = 1.0 if denom == 0 else (current - start_step) / denom
    t = max(min(1.0, t), 0.0)
    if interpolation == "linear":
        return start_value + (end_value - start_value) * t
    if interpolation == "exp":
        return math.exp(math.log(start_value) * (1 - t) + math.log(end_value) * t)
    raise ValueError(f"Unknown interpolation: {interpolation}")


def is_schedule(value: Any) -> bool:
    return isinstance(value, (list, tuple)) and len(value) >= 3 and all(
        isinstance(v, (int, float)) for v in value
    )


class ScheduleSet:
    """Named bundle of C()-schedulable scalars, evaluated host-side per step.

    `eval(epoch, step)` returns a flat {name: float} dict suitable for passing
    into a jitted step as traced scalars (one compiled program for the whole
    anneal).
    """

    def __init__(self, specs: Dict[str, Any]):
        self.specs = dict(specs)

    def eval(self, epoch: int, global_step: int) -> Dict[str, float]:
        return {
            k: float(C(v, epoch, global_step)) for k, v in self.specs.items()
        }

    def __contains__(self, k):
        return k in self.specs


def C_max(value: Any) -> float:
    """Max attainable value of a schedule spec (reference utils/config.py C_max)."""
    if isinstance(value, (int, float)):
        return value
    value = list(value)
    if len(value) == 3:
        value = [0] + value
    # values sit at odd positions after the leading start_step
    vals = [value[1]] + value[2::2]
    return max(vals)
