"""Runtime shape-contract checking — the `--typecheck` layer.

The reference installs a jaxtyping/typeguard import hook when launched with
`--typecheck` (reference launch.py:135-138, threestudio/utils/typing.py:31-41)
so that tensor shape annotations are validated at runtime. Import hooks don't
compose with jit tracing, so the TPU rebuild exposes the same contract as an
explicit checker: a tiny einops-style spec language validated host-side on
batch entry (and usable anywhere via `check`). Enabled by `launch.py
--typecheck`; zero overhead when disabled.

Spec syntax: space-separated dims — an integer literal pins a size, a name
binds consistently across all arrays in one `check_group`, `*` matches any
single dim, `...` matches any number of leading dims.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

_ENABLED = False


def enable(flag: bool = True) -> None:
    global _ENABLED
    _ENABLED = flag


def enabled() -> bool:
    return _ENABLED


class ShapeError(TypeError):
    pass


def _shape_of(x):
    return tuple(getattr(x, "shape", np.shape(x)))


def check(name: str, x, spec: str,
          dims: Optional[Dict[str, int]] = None) -> Dict[str, int]:
    """Validate `x` against `spec`; returns the (updated) dim bindings.

    Raises ShapeError on mismatch. `dims` carries named-dim bindings across
    several checks (see `check_group`).
    """
    if dims is None:
        dims = {}
    shape = _shape_of(x)
    parts = spec.split()
    if parts and parts[0] == "...":
        parts = parts[1:]
        if len(shape) < len(parts):
            raise ShapeError(
                f"{name}: shape {shape} too short for spec '{spec}'")
        shape = shape[len(shape) - len(parts):]
    elif len(shape) != len(parts):
        raise ShapeError(
            f"{name}: rank {len(shape)} != spec '{spec}' rank {len(parts)}"
            f" (shape {shape})")
    for i, (p, s) in enumerate(zip(parts, shape)):
        if p == "*":
            continue
        if p.isdigit():
            if int(p) != s:
                raise ShapeError(
                    f"{name}: dim {i} is {s}, spec '{spec}' requires {p}"
                    f" (shape {shape})")
        else:
            if p in dims and dims[p] != s:
                raise ShapeError(
                    f"{name}: dim {i} ({p}) is {s}, but {p}={dims[p]} was "
                    f"bound earlier (shape {shape})")
            dims[p] = s
    return dims


def check_group(named_specs: Dict[str, tuple],
                dims: Optional[Dict[str, int]] = None) -> Dict[str, int]:
    """Check several (array, spec) pairs with shared named-dim bindings."""
    if dims is None:
        dims = {}
    for name, (x, spec) in named_specs.items():
        check(name, x, spec, dims)
    return dims


# The standard camera-batch contract produced by all four datamodules
# (reference threestudio/data/uncond.py:143-344 collate output keys).
_BATCH_CONTRACT = {
    "rays_o": "B H W 3",
    "rays_d": "B H W 3",
    "mvp_mtx": "B 4 4",
    "c2w": "B 4 4",
    "camera_positions": "B 3",
    "light_positions": "B 3",
    "elevation": "B",
    "azimuth": "B",
    "camera_distances": "B",
    # amortized extras
    "noise": "B *",
    "text_embed": "B ...",
    "pp_local": "B * *",
    "pp_uncond": "B * *",
}


def check_batch(batch: Dict) -> None:
    """Validate the standard batch contract (no-op unless enabled)."""
    if not _ENABLED:
        return
    dims: Dict[str, int] = {}
    for key, spec in _BATCH_CONTRACT.items():
        if key in batch and batch[key] is not None:
            v = batch[key]
            if not hasattr(v, "shape"):
                continue
            check(f"batch[{key}]", v, spec, dims)
