"""`mvdream-asynchronous-score-distillation-guidance`.

Parity target: reference
`threestudio/models/guidance/mvdream_asd_guidance.py:26-312`:
- MVDream `sd-v2.1-base-4view` = SD2.1 UNet + camera-embed MLP +
  cross-view 3D self-attention (models/diffusion/unet.py with
  num_frames=4, camera_dim=16; replaces the 4.1k-LoC vendored torch LDM,
  SURVEY.md §2.3 N10),
- camera condition = c2w with unit-normalized translation, flattened 16-d
  (extern/mvdream/camera_utils.py:45-57),
- SINGLE shared timestep across all views/scenes per step (:214-226),
- UNet batch [cond, uncond, t+-cond] (no perp-neg), 256² encode path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ... import register
from ...core.base import BaseObject
from ...core.schedule import C
from .schedule import add_noise, make_alphas_cumprod
from .sd_asd import resize_bilinear


def normalize_camera(c2w):
    """Unit-normalize camera translation; -> [B, 16]
    (mvdream camera_utils.py:45-57)."""
    c2w = c2w.reshape(-1, 4, 4)
    t = c2w[:, :3, 3]
    t = t / (jnp.linalg.norm(t, axis=1, keepdims=True) + 1e-8)
    c2w = c2w.at[:, :3, 3].set(t)
    return c2w.reshape(-1, 16)


@register("mvdream-asynchronous-score-distillation-guidance")
class MVDreamAsdGuidance(BaseObject):
    @dataclass
    class Config:
        model_name: str = "sd-v2.1-base-4view"
        ckpt_path: Optional[str] = None
        guidance_scale: float = 50.0
        grad_clip: Optional[Any] = None
        half_precision_weights: bool = True
        min_step_percent: Any = 0.02
        max_step_percent: Any = 0.98
        weighting_strategy: str = "sds"
        plus_ratio: float = 0.1
        plus_random: bool = False
        view_dependent_prompting: bool = False
        camera_condition_type: str = "rotation"
        n_view: int = 4
        image_size: int = 256
        latent_size: int = 32
        recon_loss: bool = False
        recon_std_rescale: float = 0.5
        # scaled-down overrides for tests/dryruns
        unet_block_channels: Optional[list] = None
        vae_block_channels: Optional[list] = None
        cross_attention_dim: int = 1024

    cfg: Config

    def configure(self) -> None:
        from ..diffusion.unet import UNet2DConditionModel, UNetConfig
        from ..diffusion.vae import AutoencoderKL, VAEConfig

        dtype = jnp.bfloat16 if self.cfg.half_precision_weights else jnp.float32
        unet_kwargs = {
            "dtype": dtype,
            "cross_attention_dim": self.cfg.cross_attention_dim,
            "num_frames": self.cfg.n_view,
            "camera_dim": 16,
        }
        if self.cfg.unet_block_channels is not None:
            unet_kwargs["block_out_channels"] = tuple(
                self.cfg.unet_block_channels)
        vae_kwargs = {"dtype": dtype}
        if self.cfg.vae_block_channels is not None:
            vae_kwargs["block_out_channels"] = tuple(
                self.cfg.vae_block_channels)
        self.unet = UNet2DConditionModel(UNetConfig(**unet_kwargs))
        self.vae = AutoencoderKL(VAEConfig(**vae_kwargs))
        self.alphas_cumprod = jnp.asarray(make_alphas_cumprod())
        self.num_train_timesteps = 1000
        self.params = None

    def init_params(self, rng: jax.Array, param_dtype=jnp.bfloat16):
        import logging
        import os
        logger = logging.getLogger(__name__)
        from .sd_asd import _host_random_like
        k1, k2 = jax.random.split(rng)
        latent = jax.ShapeDtypeStruct(
            (self.cfg.n_view, self.cfg.latent_size, self.cfg.latent_size, 4),
            jnp.float32)
        t = jax.ShapeDtypeStruct((self.cfg.n_view,), jnp.int32)
        ctx = jax.ShapeDtypeStruct(
            (self.cfg.n_view, 77, self.cfg.cross_attention_dim), jnp.float32)
        cam = jax.ShapeDtypeStruct((self.cfg.n_view, 16), jnp.float32)
        img = jax.ShapeDtypeStruct(
            (1, self.cfg.image_size, self.cfg.image_size, 3), jnp.float32)
        unet_shapes = jax.eval_shape(
            lambda *a: self.unet.init(*a[:-1], camera=a[-1]),
            k1, latent, t, ctx, cam)
        vae_shapes = jax.eval_shape(
            self.vae.init, {"params": k2}, img, jax.random.PRNGKey(0))
        self.params = {
            "unet": _host_random_like(unet_shapes["params"], param_dtype),
            "vae": _host_random_like(vae_shapes["params"], param_dtype)}
        ckpt = self.cfg.ckpt_path
        if ckpt and os.path.exists(str(ckpt)):
            import flax.serialization as ser
            with open(ckpt, "rb") as f:
                self.params = ser.from_bytes(self.params, f.read())
            logger.info("Loaded MVDream weights from %s", ckpt)
        else:
            logger.warning("No MVDream weights found (%s); random init "
                           "(offline mode).", ckpt)
        return self.params

    # ------------------------------------------------------------------
    def get_latents(self, params, rng, rgb_BHWC, rgb_as_latents=False):
        if rgb_as_latents:
            return resize_bilinear(rgb_BHWC, self.cfg.latent_size,
                                   self.cfg.latent_size)
        rgb256 = resize_bilinear(rgb_BHWC, self.cfg.image_size,
                                 self.cfg.image_size)
        return self.vae.apply({"params": params["vae"]}, rgb256 * 2.0 - 1.0,
                              rng, method=self.vae.encode_sample)

    def __call__(self, params, rng, rgb, prompt_utils, elevation, azimuth,
                 camera_distances, min_step_percent, max_step_percent,
                 c2w=None, fovy=None, grad_clip_val=None,
                 rgb_as_latents: bool = False, **kwargs):
        B = rgb.shape[0]
        k_enc, k_noise, k_t, k_plus = jax.random.split(rng, 4)
        latents = self.get_latents(params, k_enc, rgb, rgb_as_latents)
        noise = jax.random.normal(k_noise, latents.shape)

        min_step = (self.num_train_timesteps
                    * min_step_percent).astype(jnp.int32)
        max_step = (self.num_train_timesteps
                    * max_step_percent).astype(jnp.int32)

        text_embeddings = prompt_utils.get_text_embeddings(
            elevation, azimuth, camera_distances,
            self.cfg.view_dependent_prompting)
        text_B = text_embeddings.shape[0] // 2
        reps = B // text_B
        vd = jnp.repeat(text_embeddings[:text_B], reps, axis=0) \
            if reps > 1 else text_embeddings[:text_B]
        uncond = jnp.repeat(text_embeddings[text_B:], reps, axis=0) \
            if reps > 1 else text_embeddings[text_B:]
        emb = jnp.concatenate([vd, uncond, vd], axis=0)

        # SINGLE t for the whole batch (reference :214-226)
        _t = jax.random.randint(k_t, (1,), min_step, max_step + 1)
        t = jnp.broadcast_to(_t, (B,))
        t_plus_s = self.cfg.plus_ratio * (_t - min_step).astype(jnp.float32)
        # pre-clamp shift to the headroom T-t-1 before random scaling
        # (reference mvdream_asd_guidance.py get_t_plus)
        t_plus_s = jnp.clip(
            t_plus_s, 0.0,
            (self.num_train_timesteps - 1 - _t).astype(jnp.float32))
        if self.cfg.plus_random:
            t_plus_s = t_plus_s * jax.random.uniform(k_plus, (1,))
        t_plus = jnp.clip(_t + t_plus_s.astype(jnp.int32), 1,
                          self.num_train_timesteps - 1)
        t_plus = jnp.broadcast_to(t_plus, (B,))

        latents_sg = jax.lax.stop_gradient(latents)
        x_t = add_noise(self.alphas_cumprod, latents_sg, noise, t)
        x_tp = add_noise(self.alphas_cumprod, latents_sg, noise, t_plus)

        model_in = jnp.concatenate([x_t, x_t, x_tp], axis=0)
        t_in = jnp.concatenate([t, t, t_plus], axis=0)
        if c2w is not None and self.cfg.camera_condition_type == "rotation":
            camera = normalize_camera(c2w)
            camera = jnp.tile(camera, (3, 1))
        else:
            camera = None

        eps = jax.lax.stop_gradient(self.unet.apply(
            {"params": params["unet"]}, model_in, t_in, emb, camera=camera))
        eps_text, eps_uncond, eps_second = jnp.split(eps, 3, axis=0)
        eps_first = eps_uncond + self.cfg.guidance_scale * (
            eps_text - eps_uncond)

        abar = jnp.take(self.alphas_cumprod, t).reshape(-1, 1, 1, 1)
        if self.cfg.weighting_strategy == "sds":
            w = 1.0 - abar
        elif self.cfg.weighting_strategy == "uniform":
            w = jnp.ones_like(abar)
        elif self.cfg.weighting_strategy == "fantasia3d":
            w = abar ** 0.5 * (1 - abar)
        else:
            raise ValueError(self.cfg.weighting_strategy)

        grad = jnp.nan_to_num(w * (eps_first - eps_second))
        if grad_clip_val is not None:
            grad = jnp.clip(grad, -grad_clip_val, grad_clip_val)
        target = jax.lax.stop_gradient(latents - grad)
        loss = 0.5 * jnp.sum((latents - target) ** 2) / B
        return {"loss_asd": loss, "grad_norm": jnp.linalg.norm(grad),
                "min_step": min_step, "max_step": max_step}

    def schedule_scalars(self, epoch: int, global_step: int) -> dict:
        out = {
            "min_step_percent": float(
                C(self.cfg.min_step_percent, epoch, global_step)),
            "max_step_percent": float(
                C(self.cfg.max_step_percent, epoch, global_step)),
        }
        if self.cfg.grad_clip is not None:
            out["grad_clip_val"] = float(
                C(self.cfg.grad_clip, epoch, global_step))
        return out
