"""Regularization losses for score-distillation systems.

Parity target: reference `threestudio/systems/scaledreamer.py:69-134` and
`custom/amortized/systems/multiprompt_radience_field_generator.py:142-216`:
orient / sparsity / opaque / z-variance / eikonal. Boolean-mask reductions
become masked means (jit-safe, fixed shapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def masked_mean(values, mask, eps: float = 1e-8):
    return jnp.sum(values * mask) / (jnp.sum(mask) + eps)


def orient_loss(weights, normal, t_dirs, opacity):
    """sum(w * relu(dot(n, d))^2) / #(opacity > 0)
    (scaledreamer.py:73-79)."""
    w = jax.lax.stop_gradient(weights)
    penal = w * jnp.clip(dot(normal, t_dirs), 0.0) ** 2
    denom = jnp.sum((opacity > 0).astype(jnp.float32)) + 1e-8
    return jnp.sum(penal) / denom


def sparsity_loss(opacity):
    """mean(sqrt(opacity^2 + 0.01)) (scaledreamer.py:81-84)."""
    return jnp.mean(jnp.sqrt(opacity ** 2 + 0.01))


def opaque_loss(opacity):
    """binary entropy of opacity, clamped (scaledreamer.py:86-90)."""
    o = jnp.clip(opacity, 1e-3, 1 - 1e-3)
    return jnp.mean(-(o * jnp.log(o) + (1 - o) * jnp.log(1 - o)))


def z_variance_loss(z_variance, opacity):
    """mean of z-variance over opaque pixels (scaledreamer.py:92-101)."""
    mask = (opacity > 0.5).astype(jnp.float32)
    return masked_mean(z_variance, mask)


def eikonal_loss(sdf_grad):
    """mean((|grad sdf| - 1)^2) (scaledreamer.py:104-112).

    eps inside the sqrt: d|x|/dx at exactly 0 is NaN, and one NaN gradient
    leaf poisons the whole param tree after the optimizer step."""
    norm = jnp.sqrt(jnp.sum(sdf_grad * sdf_grad, axis=-1) + 1e-12)
    return jnp.mean((norm - 1.0) ** 2)
