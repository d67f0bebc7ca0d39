"""AutoencoderKL (SD VAE) in Flax — NHWC, bf16.

Replaces diffusers' torch `AutoencoderKL` used by the reference guidance
(`stable_diffusion_asd_guidance.py:98,169-194`; SURVEY.md §2.3 N9).
Encoder: 512x512x3 -> 64x64x8 (mean||logvar) -> sample * 0.18215.
Decoder: inverse. Mid blocks carry a single self-attention at 64x64x512.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215
    dtype: jnp.dtype = jnp.bfloat16


class VAEResnet(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        residual = x
        h = nn.GroupNorm(num_groups=32, use_fast_variance=False, dtype=jnp.float32, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.GroupNorm(num_groups=32, use_fast_variance=False, dtype=jnp.float32, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               name="conv_shortcut")(residual)
        return h + residual


class VAEAttention(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(num_groups=32, use_fast_variance=False, dtype=jnp.float32, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        attn = jnp.einsum("bld,bsd->bls", q, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn / math.sqrt(C), axis=-1).astype(self.dtype)
        h = jnp.einsum("bls,bsd->bld", attn, v)
        h = nn.Dense(C, dtype=self.dtype, name="to_out_0")(h)
        return x + h.reshape(B, H, W, C)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dtype = cfg.dtype
        x = x.astype(dtype)
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=dtype, name="conv_in")(x)
        n = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = VAEResnet(ch, dtype=dtype,
                              name=f"down_{i}_resnets_{j}")(h)
            if i != n - 1:
                # asymmetric padding (0,1) per side as in diffusers
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=dtype, name=f"down_{i}_downsample")(h)
        ch = cfg.block_out_channels[-1]
        h = VAEResnet(ch, dtype=dtype, name="mid_resnets_0")(h)
        h = VAEAttention(ch, dtype=dtype, name="mid_attention")(h)
        h = VAEResnet(ch, dtype=dtype, name="mid_resnets_1")(h)
        h = nn.GroupNorm(num_groups=32, use_fast_variance=False, dtype=jnp.float32,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                    dtype=jnp.float32, name="conv_out")(h)
        # diffusers quant_conv (1x1 on mean||logvar)
        h = nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=jnp.float32,
                    name="quant_conv")(h)
        return h.astype(jnp.float32)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        dtype = cfg.dtype
        z = nn.Conv(cfg.latent_channels, (1, 1), dtype=jnp.float32,
                    name="post_quant_conv")(z)
        z = z.astype(dtype)
        ch = cfg.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=dtype, name="conv_in")(z)
        h = VAEResnet(ch, dtype=dtype, name="mid_resnets_0")(h)
        h = VAEAttention(ch, dtype=dtype, name="mid_attention")(h)
        h = VAEResnet(ch, dtype=dtype, name="mid_resnets_1")(h)
        n = len(cfg.block_out_channels)
        for i, ch in enumerate(reversed(cfg.block_out_channels)):
            for j in range(cfg.layers_per_block + 1):
                h = VAEResnet(ch, dtype=dtype, name=f"up_{i}_resnets_{j}")(h)
            if i != n - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), method="nearest")
                h = nn.Conv(ch, (3, 3), padding=1, dtype=dtype,
                            name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(num_groups=32, use_fast_variance=False, dtype=jnp.float32,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.in_channels, (3, 3), padding=1, dtype=jnp.float32,
                    name="conv_out")(h)
        return h.astype(jnp.float32)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)

    def encode_moments(self, x):
        """x [B,H,W,3] in [-1,1] -> (mean, logvar) each [B,h,w,4]."""
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode_sample(self, x, rng):
        """Posterior sample * scaling_factor (reference encode_images)."""
        mean, logvar = self.encode_moments(x)
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(rng, mean.shape)
        return z * self.cfg.scaling_factor

    def decode(self, z):
        """z scaled latents -> image [B,H,W,3] in [-1,1]."""
        return self.decoder(z / self.cfg.scaling_factor)

    def __call__(self, x, rng):
        z = self.encode_sample(x, rng)
        return self.decode(z)
