"""Unit tests for the core substrate: registry, config, C() schedule."""

import math

import pytest

import scaledreamer_tpu as sd
from scaledreamer_tpu.core.config import (
    load_yaml, merge_dicts, parse_structured, resolve, set_dotted)
from scaledreamer_tpu.core.schedule import C, C_max, ScheduleSet


def test_registry_roundtrip():
    @sd.register("test-component-xyz")
    class Foo:
        pass

    assert sd.find("test-component-xyz") is Foo


def test_registry_mixin_syntax():
    @sd.register("test-base-c")
    class Base:
        def who(self):
            return "base"

    @sd.register("test-mixin-c")
    class Mixin:
        def who(self):
            return "mixin"

    cls = sd.find("test-base-c:test-mixin-c")
    assert cls().who() == "mixin"
    assert issubclass(cls, Base) and issubclass(cls, Mixin)


def test_registry_unknown():
    with pytest.raises(KeyError):
        sd.find("no-such-component")


def test_config_interpolation_and_resolvers(tmp_path):
    p = tmp_path / "a.yaml"
    p.write_text(
        """
name: exp
radius: 2.0
system:
  geometry:
    radius: ${radius}
  prompt: "a red car"
tag: ${rmspace:${system.prompt},_}
decay: ${calc_exp_lr_decay_rate:0.1,100}
half: ${idiv:10,4}
""")
    cfg = resolve(load_yaml(str(p)))
    assert cfg["system"]["geometry"]["radius"] == 2.0
    assert cfg["tag"] == "a_red_car"
    assert abs(cfg["decay"] - 0.1 ** (1 / 100)) < 1e-12
    assert cfg["half"] == 2


def test_config_dotlist_override():
    cfg = {"a": {"b": 1}, "c": [1, 2]}
    set_dotted(cfg, "a.b", 5)
    set_dotted(cfg, "c.1", 9)
    set_dotted(cfg, "a.new.deep", "x")
    assert cfg == {"a": {"b": 5, "new": {"deep": "x"}}, "c": [1, 9]}


def test_merge_dicts_nested():
    assert merge_dicts({"a": {"x": 1, "y": 2}}, {"a": {"y": 3}, "b": 4}) == {
        "a": {"x": 1, "y": 3}, "b": 4}


def test_parse_structured_unknown_key():
    from dataclasses import dataclass

    @dataclass
    class Cfg:
        a: int = 1

    with pytest.raises(ValueError):
        parse_structured(Cfg, {"a": 2, "zzz": 3})
    assert parse_structured(Cfg, {"a": 2}).a == 2


def test_C_scalar_passthrough():
    assert C(3.5, 0, 100) == 3.5
    assert C(2, 0, 0) == 2


def test_C_linear_interpolation():
    # [start_step, start_value, end_value, end_step]
    spec = [0, 1.0, 0.0, 100]
    assert C(spec, 0, 0) == 1.0
    assert C(spec, 0, 50) == pytest.approx(0.5)
    assert C(spec, 0, 100) == 0.0
    assert C(spec, 0, 200) == 0.0  # clamped


def test_C_three_element_prepends_zero():
    assert C([1.0, 0.0, 100], 0, 50) == pytest.approx(0.5)


def test_C_epoch_mode_float_end():
    # float end_step -> interpolate on epoch
    spec = [0, 1.0, 0.0, 10.0]
    assert C(spec, 5, 99999) == pytest.approx(0.5)


def test_C_epoch_mode_without_epoch_axis_raises():
    # the trainer passes epoch=None when trainer.steps_per_epoch == 0;
    # an epoch-mode schedule must raise instead of silently freezing at
    # its start value (VERDICT r4 #8)
    spec = [0, 1.0, 0.0, 10.0]
    with pytest.raises(ValueError, match="steps_per_epoch"):
        C(spec, None, 99999)
    # step-mode schedules don't care about the missing axis
    assert C([0, 1.0, 0.0, 100], None, 50) == pytest.approx(0.5)


def test_trainer_epoch_axis_advances_epoch_schedules():
    # with trainer.steps_per_epoch wired, epoch = step // steps_per_epoch
    # drives float-end_step schedules (reference misc.py:84-95 semantics)
    spec = [0, 1.0, 0.0, 10.0]
    for step, steps_per_epoch, expect in [(0, 100, 1.0), (500, 100, 0.5),
                                          (999, 100, 0.1), (5000, 100, 0.0)]:
        epoch = step // steps_per_epoch
        assert C(spec, epoch, step) == pytest.approx(expect)


def test_C_multi_segment():
    # 0->100: 1->0.5 ; 100->200: 0.5->0.1
    spec = [0, 1.0, 0.5, 100, 0.1, 200]
    assert C(spec, 0, 0) == 1.0
    assert C(spec, 0, 100) == pytest.approx(0.5)
    assert C(spec, 0, 150) == pytest.approx(0.3)
    assert C(spec, 0, 250) == pytest.approx(0.1)


def test_C_exp_interpolation():
    spec = [0, 1.0, 0.01, 100]
    assert C(spec, 0, 50, interpolation="exp") == pytest.approx(
        math.exp((math.log(1.0) + math.log(0.01)) / 2))


def test_C_max():
    assert C_max([0, 0.5, 0.98, 1000]) == 0.98
    assert C_max(0.3) == 0.3


def test_schedule_set():
    s = ScheduleSet({"lam": [0, 0.0, 1.0, 10], "const": 2.0})
    vals = s.eval(0, 5)
    assert vals["lam"] == pytest.approx(0.5)
    assert vals["const"] == 2.0
