"""Asynchronous Score Distillation core — the paper's contribution, as pure JAX.

Parity target: reference
`threestudio/models/guidance/stable_diffusion_asd_guidance.py:211-441`:
- t ~ U[min_step, max_step]; shift = clamp(plus_ratio*(t-min_step), 0, T-t-1)
  then t+ = clamp(t + shift*[rand], 1, T-1) (get_t_plus :294-316),
- shared noise at t and t+ (:242-246),
- ONE batched UNet pass over [cond, uncond, (2B perp-neg), t+-cond] (:396-403),
- CFG + perp-neg aggregation (:405-428 with ops.perpendicular_component),
- grad = w(t) * (eps_cfg - eps_second); reparam MSE loss (:261-283).

Everything here is jit-traceable: min/max steps and grad clip are traced
scalars fed from host-side C() schedules, so annealing never retraces.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ...ops.math import perpendicular_component
from .schedule import add_noise


class ASDConfig(NamedTuple):
    guidance_scale: float = 7.5
    plus_ratio: float = 0.1
    plus_random: bool = True
    weighting_strategy: str = "sds"
    guidance_perp_neg: float = 0.0
    view_dependent_prompting: bool = True
    num_train_timesteps: int = 1000


def sample_timesteps(rng, batch_size: int, min_step, max_step):
    """t ~ U[min_step, max_step] inclusive; bounds may be traced."""
    return jax.random.randint(rng, (batch_size,), min_step, max_step + 1)


def get_t_plus(rng, t, min_step, cfg: ASDConfig):
    t_plus = cfg.plus_ratio * (t - min_step).astype(jnp.float32)
    # reference pre-clamps the shift to the remaining headroom T-t-1 BEFORE
    # the random scaling (stable_diffusion_asd_guidance.py:300-304), keeping
    # the t+ distribution uniform over the headroom near max_step.
    t_plus = jnp.clip(t_plus, 0.0,
                      (cfg.num_train_timesteps - 1 - t).astype(jnp.float32))
    if cfg.plus_random:
        t_plus = t_plus * jax.random.uniform(rng, t.shape)
    t_plus = t + t_plus.astype(jnp.int32)
    return jnp.clip(t_plus, 1, cfg.num_train_timesteps - 1)


def asd_eps(eps_model: Callable, latents_noisy, latents_noisy_second, t,
            t_plus, text_embeddings, neg_guidance_weights, cfg: ASDConfig):
    """Batched UNet pass + CFG/perp-neg aggregation (reference get_eps).

    eps_model(latents [N,H,W,4], t [N], emb [N,77,C]) -> eps [N,H,W,4].
    text_embeddings layout: [vd(B), uncond(B), (negs 2B), vd(B)].
    """
    B = latents_noisy.shape[0]
    use_perp_neg = neg_guidance_weights is not None
    num_repeats = (4 if use_perp_neg else 2)
    input_latents = jnp.concatenate(
        [latents_noisy] * num_repeats + [latents_noisy_second], axis=0)
    input_t = jnp.concatenate([t] * num_repeats + [t_plus], axis=0)
    noise_pred = jax.lax.stop_gradient(
        eps_model(input_latents, input_t, text_embeddings))

    eps_text = noise_pred[0 * B:1 * B]
    eps_uncond = noise_pred[1 * B:2 * B]
    eps_pos = eps_text - eps_uncond
    if use_perp_neg:
        eps_vd_neg = noise_pred[2 * B:4 * B]
        eps_second = noise_pred[4 * B:5 * B]
        # weights already scaled by -guidance_perp_neg by the caller
        accum = jnp.zeros_like(eps_pos)
        for i in range(2):
            e_neg = eps_vd_neg[i::2] - eps_uncond
            w = neg_guidance_weights[:, i].reshape(
                -1, *[1] * (e_neg.ndim - 1))
            accum = accum + w * perpendicular_component(e_neg, eps_pos)
        noise_pred_p = (eps_pos + accum) * cfg.guidance_scale + eps_uncond
    else:
        eps_second = noise_pred[2 * B:3 * B]
        noise_pred_p = eps_pos * cfg.guidance_scale + eps_uncond
    return noise_pred_p, eps_second


def asd_loss(rng, latents, alphas_cumprod, text_embeddings,
             neg_guidance_weights, eps_model: Callable, cfg: ASDConfig,
             min_step, max_step, grad_clip_val: Optional[jnp.ndarray] = None,
             shared_t_across_batch: bool = False):
    """Full ASD objective on latents [B, H, W, 4] -> (loss, aux dict).

    `shared_t_across_batch=True` reproduces the MVDream single-t-per-scene
    behavior (reference mvdream_asd_guidance.py:214-226).
    """
    B = latents.shape[0]
    k_noise, k_t, k_plus = jax.random.split(rng, 3)
    noise = jax.random.normal(k_noise, latents.shape)

    if shared_t_across_batch:
        t = jnp.broadcast_to(
            sample_timesteps(k_t, 1, min_step, max_step), (B,))
    else:
        t = sample_timesteps(k_t, B, min_step, max_step)
    t_plus = get_t_plus(k_plus, t, min_step, cfg)

    latents_sg = jax.lax.stop_gradient(latents)
    latents_noisy = add_noise(alphas_cumprod, latents_sg, noise, t)
    latents_noisy_second = add_noise(alphas_cumprod, latents_sg, noise, t_plus)

    noise_pred, noise_pred_second = asd_eps(
        eps_model, latents_noisy, latents_noisy_second, t, t_plus,
        text_embeddings, neg_guidance_weights, cfg)

    abar = jnp.take(alphas_cumprod, t).reshape(-1, *[1] * (latents.ndim - 1))
    if cfg.weighting_strategy == "sds":
        w = 1.0 - abar
    elif cfg.weighting_strategy == "uniform":
        w = jnp.ones_like(abar)
    elif cfg.weighting_strategy == "fantasia3d":
        w = abar ** 0.5 * (1 - abar)
    else:
        raise ValueError(
            f"Unknown weighting strategy: {cfg.weighting_strategy}")

    grad = w * (noise_pred - noise_pred_second)
    grad = jnp.nan_to_num(grad)
    if grad_clip_val is not None:
        grad = jnp.clip(grad, -grad_clip_val, grad_clip_val)

    target = jax.lax.stop_gradient(latents - grad)
    loss = 0.5 * jnp.sum((latents - target) ** 2) / B
    aux = {
        "grad_norm": jnp.linalg.norm(grad),
        "timesteps": t,
        "timesteps_plus": t_plus,
    }
    return loss, aux
