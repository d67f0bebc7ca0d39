"""Core math ops: activations, gradient tricks, contraction.

Parity targets in reference `threestudio/utils/ops.py`:
- `scale_tensor` (:52-63), activation zoo incl. `trunc_exp` custom autograd
  (:65-100) and `sigmoid-mipnerf`-style biased sigmoid,
- `perpendicular_component` (:103-113, used by perp-neg guidance),
- `contract_to_unisphere` (geometry/base.py:30-51).

All are pure jnp functions (jit/vmap/grad-safe); `trunc_exp` uses
`jax.custom_vjp` to clamp the backward exactly like the reference's custom
autograd Function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    """exp with gradient-input clamped to <=15 for stability."""
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, max=15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def shifted_softplus(x):
    return jax.nn.softplus(x - 1.0)


def biased_sigmoid(x, eps: float = 1e-3):
    """`sigmoid-mipnerf`: sigmoid stretched to (-eps, 1+eps) then... actually
    the mipnerf variant maps into (−0.001, 1.001) wide range:
    (1 + 2*eps) * sigmoid(x) − eps."""
    return (1.0 + 2.0 * eps) * jax.nn.sigmoid(x) - eps


_ACTIVATIONS = {
    "none": lambda x: x,
    "lin2srgb": lambda x: jnp.where(
        x > 0.0031308, jnp.power(jnp.clip(x, 0.0031308), 1.0 / 2.4) * 1.055 - 0.055,
        12.92 * x),
    "exp": jnp.exp,
    "trunc_exp": trunc_exp,
    "shifted_trunc_exp": lambda x: trunc_exp(x - 1.0),
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "shifted_softplus": shifted_softplus,
    "softplus": jax.nn.softplus,
    "scale_-11_01": lambda x: x * 0.5 + 0.5,
    "sigmoid-mipnerf": biased_sigmoid,
    "relu": jax.nn.relu,
}


def get_activation(name):
    """Resolve an activation by name (reference ops.py:65-100), including
    the `scale_*` / `clamp_*` / negative prefixes."""
    if name is None:
        return lambda x: x
    name = str(name).lower()
    if name in _ACTIVATIONS:
        return _ACTIVATIONS[name]
    if name.startswith("scale_"):
        scale = float(name[6:])
        return lambda x: x * scale
    if name.startswith("clamp_"):
        lo, hi = (float(v) for v in name[6:].split("_"))
        return lambda x: jnp.clip(x, lo, hi)
    if name.startswith("mul_"):
        mul = float(name[4:])
        return lambda x: x * mul
    raise ValueError(f"Unknown activation: {name}")


def scale_tensor(x, inp_scale, tgt_scale):
    """Affine rescale from inp_scale=(lo,hi) to tgt_scale=(lo,hi); scales may
    be scalars or broadcastable arrays (reference ops.py:52-63)."""
    if inp_scale is None:
        inp_scale = (0.0, 1.0)
    if tgt_scale is None:
        tgt_scale = (0.0, 1.0)
    i0, i1 = inp_scale
    t0, t1 = tgt_scale
    x = (x - i0) / (i1 - i0)
    return x * (t1 - t0) + t0


def perpendicular_component(x, y):
    """Component of x perpendicular to y, batched [B, ...] (ops.py:103-113)."""
    axes = tuple(range(1, x.ndim))
    dot_xy = jnp.sum(x * y, axis=axes, keepdims=True)
    dot_yy = jnp.sum(y * y, axis=axes, keepdims=True)
    return x - (dot_xy / jnp.maximum(dot_yy, 1e-12)) * y


def contract_to_unisphere(x, bbox, unbounded: bool = False):
    """Normalize positions into [0,1]^3 within bbox; optional mipnerf360
    contraction outside the unit sphere (reference geometry/base.py:30-51)."""
    lo, hi = bbox[0], bbox[1]
    if unbounded:
        x = scale_tensor(x, (lo, hi), (-1.0, 1.0))
        mag2 = jnp.sum(x * x, axis=-1, keepdims=True)
        mag = jnp.sqrt(jnp.maximum(mag2, 1e-12))
        x = jnp.where(mag > 1.0, (2.0 - 1.0 / mag) * (x / mag), x)
        return x / 4.0 + 0.5  # [-2,2] -> [0,1]
    return scale_tensor(x, (lo, hi), (0.0, 1.0))


def safe_normalize(v, axis=-1, eps=1e-12):
    return v * jax.lax.rsqrt(
        jnp.maximum(jnp.sum(v * v, axis=axis, keepdims=True), eps))


def dot(a, b, keepdims=True):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)
