"""`stable-diffusion-asynchronous-score-distillation-guidance`.

Parity target: reference
`threestudio/models/guidance/stable_diffusion_asd_guidance.py:24-441`.
Wraps the Flax SD2.1 UNet + VAE (models/diffusion) around the pure ASD core
(guidance/asd.py). The guidance owns a frozen parameter pytree that the
system passes into its single jitted train step; min/max step and grad clip
arrive as traced scalars from host-side C() schedules (reference
update_step :430-441).

Weights: loaded from a converted orbax/msgpack checkpoint when
`pretrained_model_name_or_path` points at one (see
scripts/convert_sd_checkpoint.py); otherwise random-initialized (offline
mode — identical compute graph, so benchmarks are unaffected).
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ... import register
from ...core.base import BaseObject
from ...core.schedule import C
from .asd import ASDConfig, asd_loss
from .schedule import make_alphas_cumprod

logger = logging.getLogger(__name__)


def _host_random_like(shapes, param_dtype, scale: float = 0.02):
    """NumPy-random params matching an eval_shape pytree (offline init).
    Norm scales -> 1, biases -> 0, weights -> N(0, scale) — keeps
    activations O(1) through deep stacks so offline benchmarking is
    numerically sane."""
    rng = np.random.default_rng(0)

    def mk(path, s):
        name = str(getattr(path[-1], "key", ""))
        if name == "scale":
            arr = np.ones(s.shape, np.float32)
        elif name == "bias":
            arr = np.zeros(s.shape, np.float32)
        else:
            arr = (rng.standard_normal(s.shape) * scale).astype(np.float32)
        return jnp.asarray(arr, dtype=param_dtype)

    return jax.tree_util.tree_map_with_path(mk, shapes)


def resize_bilinear(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """NHWC bilinear resize (F.interpolate align_corners=False equivalent)."""
    B, H, W, C = x.shape
    if (H, W) == (h, w):
        return x
    return jax.image.resize(x, (B, h, w, C), method="bilinear")


@register("stable-diffusion-asynchronous-score-distillation-guidance")
class SDAsdGuidance(BaseObject):
    @dataclass
    class Config:
        pretrained_model_name_or_path: str = "pretrained/stable-diffusion-2-1-base"
        enable_memory_efficient_attention: bool = False
        enable_sequential_cpu_offload: bool = False
        enable_attention_slicing: bool = False
        enable_channels_last_format: bool = True
        guidance_scale: float = 7.5
        grad_clip: Optional[Any] = None
        half_precision_weights: bool = True
        min_step_percent: Any = 0.02
        max_step_percent: Any = 0.98
        weighting_strategy: str = "sds"
        plus_ratio: float = 0.1
        plus_random: bool = False
        view_dependent_prompting: bool = True
        guidance_perp_neg: float = 0.0
        image_size: int = 512
        latent_size: int = 64
        # scaled-down architecture overrides (tests / multichip dryruns);
        # None = SD2.1-base
        unet_block_channels: Optional[list] = None
        vae_block_channels: Optional[list] = None
        cross_attention_dim: int = 1024

    cfg: Config

    def configure(self) -> None:
        from ..diffusion.unet import UNet2DConditionModel, UNetConfig
        from ..diffusion.vae import AutoencoderKL, VAEConfig

        dtype = jnp.bfloat16 if self.cfg.half_precision_weights else jnp.float32
        unet_kwargs = {"dtype": dtype,
                       "cross_attention_dim": self.cfg.cross_attention_dim}
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
        self.use_perp_neg = self.cfg.guidance_perp_neg != 0
        self.asd_cfg = ASDConfig(
            guidance_scale=self.cfg.guidance_scale,
            plus_ratio=self.cfg.plus_ratio,
            plus_random=self.cfg.plus_random,
            weighting_strategy=self.cfg.weighting_strategy,
            guidance_perp_neg=self.cfg.guidance_perp_neg,
            view_dependent_prompting=self.cfg.view_dependent_prompting,
            num_train_timesteps=self.num_train_timesteps,
        )
        self.params = None  # set by init_params / load_params

    # ------------------------------------------------------------------
    def init_params(self, rng: jax.Array, param_dtype=jnp.bfloat16):
        """Initialize (or load) frozen UNet+VAE params."""
        ckpt = os.path.join(str(self.cfg.pretrained_model_name_or_path),
                            "flax_params.msgpack")
        if os.path.exists(ckpt):
            import flax.serialization as ser
            with open(ckpt, "rb") as f:
                raw = f.read()
            template = self._random_params(rng, param_dtype)
            self.params = ser.from_bytes(template, raw)
            logger.info("Loaded SD weights from %s", ckpt)
        else:
            logger.warning(
                "No converted SD weights at %s; using random init "
                "(offline mode).", ckpt)
            self.params = self._random_params(rng, param_dtype)
        return self.params

    def _random_params(self, rng, param_dtype):
        # shapes come from eval_shape (pure tracing, zero compile/devices);
        # values are host-side normals — random init is only used in offline
        # mode where values don't matter, so this avoids compiling the huge
        # init programs on-device.
        k1, k2 = jax.random.split(rng)
        latent = jax.ShapeDtypeStruct(
            (1, self.cfg.latent_size, self.cfg.latent_size, 4), jnp.float32)
        t = jax.ShapeDtypeStruct((1,), jnp.int32)
        ctx = jax.ShapeDtypeStruct((1, 77, self.cfg.cross_attention_dim),
                                   jnp.float32)
        img = jax.ShapeDtypeStruct(
            (1, self.cfg.image_size, self.cfg.image_size, 3), jnp.float32)
        unet_shapes = jax.eval_shape(self.unet.init, k1, latent, t, ctx)
        vae_shapes = jax.eval_shape(
            self.vae.init, {"params": k2}, img, jax.random.PRNGKey(0))
        return {"unet": _host_random_like(unet_shapes["params"], param_dtype),
                "vae": _host_random_like(vae_shapes["params"], param_dtype)}

    # ------------------------------------------------------------------
    def get_latents(self, params, rng, rgb_BHWC, rgb_as_latents=False):
        if rgb_as_latents:
            return resize_bilinear(rgb_BHWC, self.cfg.latent_size,
                                   self.cfg.latent_size)
        rgb512 = resize_bilinear(rgb_BHWC, self.cfg.image_size,
                                 self.cfg.image_size)
        return self.vae.apply({"params": params["vae"]}, rgb512 * 2.0 - 1.0,
                              rng, method=self.vae.encode_sample)

    def decode_latents(self, params, latents):
        img = self.vae.apply({"params": params["vae"]}, latents,
                             method=self.vae.decode)
        return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

    def __call__(self, params, rng, rgb, prompt_utils, elevation, azimuth,
                 camera_distances, min_step_percent, max_step_percent,
                 grad_clip_val=None, rgb_as_latents: bool = False, **kwargs):
        """Pure ASD loss. rgb [B,H,W,3]; traced scalars for annealing.

        Returns dict(loss_asd=..., grad_norm=..., min_step=..., max_step=...).
        """
        B = rgb.shape[0]
        k_enc, k_asd = jax.random.split(rng)
        latents = self.get_latents(params, k_enc, rgb,
                                   rgb_as_latents=rgb_as_latents)

        min_step = (self.num_train_timesteps * min_step_percent).astype(jnp.int32)
        max_step = (self.num_train_timesteps * max_step_percent).astype(jnp.int32)

        if self.use_perp_neg:
            text_embeddings, neg_w = prompt_utils.get_text_embeddings_perp_neg(
                elevation, azimuth, camera_distances,
                self.cfg.view_dependent_prompting)
            neg_w = neg_w * (-1.0) * self.cfg.guidance_perp_neg
        else:
            text_embeddings = prompt_utils.get_text_embeddings(
                elevation, azimuth, camera_distances,
                self.cfg.view_dependent_prompting)
            neg_w = None
        # append the t+ conditional branch (same vd-cond embeddings)
        text_embeddings = jnp.concatenate(
            [text_embeddings, text_embeddings[:B]], axis=0)

        def eps_model(latents_in, t_in, emb_in):
            return self.unet.apply({"params": params["unet"]}, latents_in,
                                   t_in, emb_in)

        loss, aux = asd_loss(
            k_asd, latents, self.alphas_cumprod, text_embeddings, neg_w,
            eps_model, self.asd_cfg, min_step, max_step, grad_clip_val)
        return {"loss_asd": loss, "grad_norm": aux["grad_norm"],
                "min_step": min_step, "max_step": max_step}

    # host-side schedule evaluation (reference update_step :430-441)
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
