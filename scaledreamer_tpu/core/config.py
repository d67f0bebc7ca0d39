"""Config system: YAML + CLI dotlist overrides + interpolation + resolvers.

Self-contained replacement for the reference's OmegaConf stack
(threestudio/utils/config.py:1-128). Honors the same public surface:

- ``load_config(*yamls, cli_args=[...], n_gpus=N)`` merges YAML files and
  ``key.sub=value`` dotlist overrides, resolves ``${...}`` interpolations and
  registered resolvers, and returns an ``ExperimentConfig``.
- Resolvers with identical semantics to the reference registrations
  (config.py:11-27): ``calc_exp_lr_decay_rate``, ``idiv``, ``basename``,
  ``rmspace``, ``len``, ``add``, ``sub``, ``mul``, ``div``.
- ``parse_structured(DataclassType, cfg)`` instantiates a config dataclass
  from a plain dict, erroring on unknown keys (structured validation).
- Required fields are spelled ``???`` in YAML, as in OmegaConf.
"""

from __future__ import annotations

import dataclasses
import math
import os
import re
import time
from dataclasses import dataclass, field
from typing import Any, Optional

import yaml

MISSING = "???"

_RESOLVERS = {}


def register_resolver(name):
    def deco(fn):
        _RESOLVERS[name] = fn
        return fn
    return deco


@register_resolver("calc_exp_lr_decay_rate")
def _calc_exp_lr_decay_rate(factor, n):
    # gamma such that gamma**n == factor (reference config.py:12-13)
    return float(factor) ** (1.0 / float(n))


@register_resolver("idiv")
def _idiv(a, b):
    return int(a) // int(b)


@register_resolver("basename")
def _basename(p):
    return os.path.basename(str(p))


@register_resolver("rmspace")
def _rmspace(s, sub):
    return str(s).replace(" ", str(sub))


@register_resolver("len")
def _len(x):
    return len(x)


@register_resolver("add")
def _add(a, b):
    return _num(a) + _num(b)


@register_resolver("sub")
def _sub(a, b):
    return _num(a) - _num(b)


@register_resolver("mul")
def _mul(a, b):
    return _num(a) * _num(b)


@register_resolver("div")
def _div(a, b):
    return _num(a) / _num(b)


@register_resolver("C_max")
def _c_max(spec):
    from .schedule import C_max as _cm
    return _cm(spec)


def _num(x):
    if isinstance(x, (int, float)):
        return x
    s = str(x)
    try:
        return int(s)
    except ValueError:
        return float(s)


def _parse_scalar(s: str) -> Any:
    """Parse a CLI override value string with YAML scalar semantics."""
    try:
        return yaml.safe_load(s)
    except yaml.YAMLError:
        return s


def merge_dicts(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_dicts(out[k], v)
        else:
            out[k] = v
    return out


def set_dotted(cfg: dict, dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    cur = cfg
    for k in keys[:-1]:
        if isinstance(cur, list):
            cur = cur[int(k)]
        else:
            cur = cur.setdefault(k, {})
    last = keys[-1]
    if isinstance(cur, list):
        cur[int(last)] = value
    else:
        cur[last] = value


def get_dotted(cfg: Any, dotted: str) -> Any:
    cur = cfg
    for k in dotted.split("."):
        if isinstance(cur, list):
            cur = cur[int(k)]
        elif isinstance(cur, dict):
            cur = cur[k]
        else:
            cur = getattr(cur, k)
    return cur


_INTERP_RE = re.compile(r"\$\{([^{}]+)\}")


def _resolve_expr(expr: str, root: dict) -> Any:
    expr = expr.strip()
    if ":" in expr:
        name, _, argstr = expr.partition(":")
        name = name.strip()
        if name in _RESOLVERS:
            args = [a.strip() for a in argstr.split(",")] if argstr else []
            args = [_resolve_value(a, root) if "${" in a else _parse_scalar(a)
                    for a in args]
            return _RESOLVERS[name](*args)
    return get_dotted(root, expr)


def _resolve_value(v: Any, root: dict, _depth: int = 0) -> Any:
    if _depth > 32:
        raise RecursionError(f"interpolation depth exceeded resolving {v!r}")
    if isinstance(v, str):
        full = _INTERP_RE.fullmatch(v.strip())
        if full:
            out = _resolve_expr(full.group(1), root)
            return _resolve_value(out, root, _depth + 1)

        def sub(m):
            out = _resolve_expr(m.group(1), root)
            out = _resolve_value(out, root, _depth + 1)
            return str(out)

        if "${" in v:
            return _INTERP_RE.sub(sub, v)
        return v
    if isinstance(v, dict):
        return {k: _resolve_value(x, root, _depth) for k, x in v.items()}
    if isinstance(v, list):
        return [_resolve_value(x, root, _depth) for x in v]
    return v


def resolve(cfg: dict) -> dict:
    # iterate to a fixed point so chained interpolations settle
    for _ in range(8):
        new = _resolve_value(cfg, cfg)
        if new == cfg:
            return new
        cfg = new
    return cfg


def load_yaml(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def parse_structured(cls, cfg: Optional[dict] = None):
    """Instantiate config dataclass `cls` from dict, erroring on unknown keys.

    Equivalent role to the reference's OmegaConf structured merge
    (threestudio/utils/config.py:117-128).
    """
    if isinstance(cfg, cls):
        return cfg
    if dataclasses.is_dataclass(cfg) and not isinstance(cfg, type):
        cfg = config_to_dict(cfg)
    cfg = dict(cfg or {})
    names = {f.name for f in dataclasses.fields(cls)}
    unknown = set(cfg) - names
    if unknown:
        raise ValueError(
            f"Unknown config keys for {cls.__name__}: {sorted(unknown)}"
        )
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name in cfg:
            v = cfg[f.name]
            if v == MISSING:
                raise ValueError(f"Missing required config value: {f.name}")
            if dataclasses.is_dataclass(f.type) and isinstance(v, dict):
                v = parse_structured(f.type, v)
            kwargs[f.name] = v
        elif f.default is dataclasses.MISSING and \
                f.default_factory is dataclasses.MISSING:
            raise ValueError(f"Missing required config value: {f.name}")
    for f in dataclasses.fields(cls):
        if f.name in kwargs and kwargs[f.name] == MISSING:
            raise ValueError(f"Missing required config value: {f.name}")
    return cls(**kwargs)


def config_to_dict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj):
        return {f.name: config_to_dict(getattr(obj, f.name))
                for f in dataclasses.fields(obj)}
    if isinstance(obj, dict):
        return {k: config_to_dict(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [config_to_dict(v) for v in obj]
    return obj


@dataclass
class ExperimentConfig:
    """Top-level experiment config (reference utils/config.py:30-101)."""
    name: str = "default"
    description: str = ""
    tag: str = ""
    seed: int = 0
    use_timestamp: bool = True
    timestamp: Optional[str] = None
    exp_root_dir: str = "outputs"

    # populated at load time
    n_gpus: int = 1

    exp_dir: str = "outputs/default"
    trial_name: str = "exp"
    trial_dir: str = "outputs/default/exp"
    resume: Optional[str] = None

    data_type: str = MISSING
    data: dict = field(default_factory=dict)
    system_type: str = MISSING
    system: dict = field(default_factory=dict)
    trainer: dict = field(default_factory=dict)
    checkpoint: dict = field(default_factory=dict)

    def __post_init__(self):
        if not self.tag and not self.use_timestamp:
            raise ValueError("Either tag is specified or use_timestamp is True.")
        self.trial_name = self.tag
        if self.timestamp is None:
            self.timestamp = ""
            if self.use_timestamp:
                self.timestamp = "@" + time.strftime("%Y%m%d-%H%M%S")
        self.trial_name += self.timestamp
        self.exp_dir = os.path.join(self.exp_root_dir, self.name)
        self.trial_dir = os.path.join(self.exp_dir, self.trial_name)
        os.makedirs(self.trial_dir, exist_ok=True)


def load_config(*yamls: str, cli_args: Optional[list] = None,
                n_gpus: int = 1, makedirs: bool = True) -> ExperimentConfig:
    cfg = {}
    for path in yamls:
        cfg = merge_dicts(cfg, load_yaml(path))
    for arg in cli_args or []:
        if "=" not in arg:
            raise ValueError(f"Malformed CLI override (expected k=v): {arg}")
        k, _, v = arg.partition("=")
        set_dotted(cfg, k, _parse_scalar(v))
    cfg["n_gpus"] = n_gpus
    cfg = resolve(cfg)
    if not makedirs:
        cfg = dict(cfg)
        cfg["use_timestamp"] = False
        cfg.setdefault("tag", "test")
        import tempfile
        cfg["exp_root_dir"] = tempfile.mkdtemp(prefix="sdtpu-cfg-")
    return parse_structured(ExperimentConfig, cfg)


def dump_config(path: str, cfg: Any) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(config_to_dict(cfg), f, sort_keys=False)
