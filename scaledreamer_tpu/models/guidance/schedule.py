"""DDPM noise schedule utilities (diffusers DDPMScheduler equivalent).

Parity: SD 2.1-base scheduler config — scaled_linear betas 0.00085 -> 0.012,
1000 train timesteps (used by reference guidance via
`DDPMScheduler.from_pretrained(..., subfolder="scheduler")` and
`scheduler.add_noise`, stable_diffusion_asd_guidance.py:106-118,242-246).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def make_alphas_cumprod(num_train_timesteps: int = 1000,
                        beta_start: float = 0.00085,
                        beta_end: float = 0.012,
                        schedule: str = "scaled_linear") -> np.ndarray:
    if schedule == "scaled_linear":
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps, dtype=np.float64) ** 2
    elif schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps,
                            dtype=np.float64)
    else:
        raise ValueError(f"Unknown beta schedule: {schedule}")
    return np.cumprod(1.0 - betas).astype(np.float32)


def add_noise(alphas_cumprod: jnp.ndarray, latents: jnp.ndarray,
              noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """x_t = sqrt(abar_t) x0 + sqrt(1-abar_t) eps ; t: int [B]."""
    abar = jnp.take(alphas_cumprod, t)
    shape = (-1,) + (1,) * (latents.ndim - 1)
    sqrt_abar = jnp.sqrt(abar).reshape(shape)
    sqrt_1m = jnp.sqrt(1.0 - abar).reshape(shape)
    return sqrt_abar * latents + sqrt_1m * noise
