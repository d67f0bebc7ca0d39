"""Stable Diffusion 2.1-base UNet in Flax — TPU-native (NHWC, bf16, remat).

Replaces the torch/diffusers `UNet2DConditionModel` the reference loads at
`threestudio/models/guidance/stable_diffusion_asd_guidance.py:68-71`
(SURVEY.md §2.3 N9), and — with `num_frames > 1` and `camera_dim > 0` — the
vendored MVDream `MultiViewUNetModel` (`extern/mvdream/ldm/modules/
diffusionmodules/openaimodel.py:937-943,1197-1200`; SURVEY.md §2.3 N10):

- camera conditioning: MLP(camera_dim -> time_embed_dim) ADDED to the time
  embedding (openaimodel.py:1197-1200),
- 3D self-attention: the view axis is flattened into the sequence for attn1
  ((b f) l c -> b (f l) c, `extern/mvdream/ldm/modules/attention.py:343-411`).

Design notes for TPU:
- NHWC layout end-to-end (XLA's preferred conv layout on TPU).
- bf16 compute / fp32 softmax accumulations; params can be bf16 or fp32.
- `nn.remat` on attention blocks bounds activation memory so the whole
  5B-batch guidance pass fits alongside rendering (SURVEY.md §7.3-6).
- SD 2.x uses linear (not conv) projections in transformer blocks
  (use_linear_projection=True).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    attention_head_dim: int = 64
    # MVDream extensions
    num_frames: int = 1           # views fused in 3D self-attention
    camera_dim: int = 0           # 0 = no camera conditioning
    dtype: jnp.dtype = jnp.bfloat16


def timestep_embedding(t: jnp.ndarray, dim: int,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal embedding, diffusers get_timestep_embedding convention
    (flip_sin_to_cos=True for SD)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class TimeEmbedding(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, emb):
        emb = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(emb)
        return emb


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, temb):
        residual = x
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, use_fast_variance=False, dtype=jnp.float32, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, use_fast_variance=False, dtype=jnp.float32, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               name="conv_shortcut")(residual)
        return h + residual


class Attention(nn.Module):
    query_dim: int
    heads: int
    head_dim: int
    context_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.head_dim
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        B, L, _ = q.shape
        S = k.shape[1]
        q = q.reshape(B, L, self.heads, self.head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(B, S, self.heads, self.head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, S, self.heads, self.head_dim).transpose(0, 2, 1, 3)
        from ...ops.attention import multi_head_attention
        out = multi_head_attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, inner).astype(self.dtype)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out_0")(out)


class FeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        # GEGLU
        h = nn.Dense(inner * 2, dtype=self.dtype, name="net_0_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # diffusers GEGLU uses exact (erf) gelu, not the tanh approximation
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    heads: int
    head_dim: int
    context_dim: int
    num_frames: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context):
        # self-attention; MVDream 3D mode flattens the view axis into the
        # sequence ((b f) l c -> b (f l) c, mvdream attention.py:343-411)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm1")(x)
        if self.num_frames > 1:
            BF, L, C = h.shape
            B = BF // self.num_frames
            h3 = h.reshape(B, self.num_frames * L, C)
            h3 = Attention(self.dim, self.heads, self.head_dim,
                           dtype=self.dtype, name="attn1")(h3)
            h = h3.reshape(BF, L, C)
        else:
            h = Attention(self.dim, self.heads, self.head_dim,
                          dtype=self.dtype, name="attn1")(h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")(x)
        x = x + Attention(self.dim, self.heads, self.head_dim,
                          context_dim=self.context_dim, dtype=self.dtype,
                          name="attn2")(h, context)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm3")(x)
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h)
        return x


class Transformer2D(nn.Module):
    channels: int
    heads: int
    head_dim: int
    context_dim: int
    depth: int = 1
    num_frames: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        residual = x
        h = nn.GroupNorm(num_groups=32, use_fast_variance=False, dtype=jnp.float32, name="norm")(x)
        h = h.reshape(B, H * W, C)
        h = nn.Dense(self.channels, dtype=self.dtype, name="proj_in")(h)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                self.channels, self.heads, self.head_dim, self.context_dim,
                num_frames=self.num_frames, dtype=self.dtype,
                name=f"transformer_blocks_{i}")(h, context)
        h = nn.Dense(self.channels, dtype=self.dtype, name="proj_out")(h)
        return h.reshape(B, H, W, C) + residual


class Downsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


class UNet2DConditionModel(nn.Module):
    """SD2.1-base UNet (+ optional MVDream multiview extensions)."""
    cfg: UNetConfig

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 camera=None):
        """sample [B,H,W,4] NHWC; timesteps [B]; context [B,77,C];
        camera [B, camera_dim] (MVDream flattened c2w)."""
        cfg = self.cfg
        dtype = cfg.dtype
        ch0 = cfg.block_out_channels[0]
        temb_dim = ch0 * 4

        t_emb = timestep_embedding(timesteps, ch0)
        temb = TimeEmbedding(temb_dim, dtype=dtype, name="time_embedding")(t_emb)
        if cfg.camera_dim > 0:
            assert camera is not None, "camera conditioning expected"
            cam = TimeEmbedding(temb_dim, dtype=dtype,
                                name="camera_embedding")(
                camera.astype(jnp.float32))
            temb = temb + cam  # mvdream openaimodel.py:1197-1200

        context = encoder_hidden_states.astype(dtype)
        sample = sample.astype(dtype)

        h = nn.Conv(ch0, (3, 3), padding=1, dtype=dtype, name="conv_in")(sample)
        skips = [h]

        Block = nn.remat(Transformer2D, static_argnums=())

        # down
        n_blocks = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            is_final = i == n_blocks - 1
            has_attn = not is_final
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(ch, dtype=dtype,
                                name=f"down_{i}_resnets_{j}")(h, temb)
                if has_attn:
                    heads = max(1, ch // cfg.attention_head_dim)
                    h = Block(
                        ch, heads, cfg.attention_head_dim,
                        cfg.cross_attention_dim, num_frames=cfg.num_frames,
                        dtype=dtype, name=f"down_{i}_attentions_{j}")(h, context)
                skips.append(h)
            if not is_final:
                h = Downsample(ch, dtype=dtype,
                               name=f"down_{i}_downsample")(h)
                skips.append(h)

        # mid
        ch = cfg.block_out_channels[-1]
        h = ResnetBlock(ch, dtype=dtype, name="mid_resnets_0")(h, temb)
        h = Block(ch, max(1, ch // cfg.attention_head_dim), cfg.attention_head_dim,
                  cfg.cross_attention_dim, num_frames=cfg.num_frames,
                  dtype=dtype, name="mid_attentions_0")(h, context)
        h = ResnetBlock(ch, dtype=dtype, name="mid_resnets_1")(h, temb)

        # up
        for i, ch in enumerate(reversed(cfg.block_out_channels)):
            block_idx = n_blocks - 1 - i
            has_attn = block_idx != n_blocks - 1
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock(ch, dtype=dtype,
                                name=f"up_{i}_resnets_{j}")(h, temb)
                if has_attn:
                    heads = max(1, ch // cfg.attention_head_dim)
                    h = Block(
                        ch, heads, cfg.attention_head_dim,
                        cfg.cross_attention_dim, num_frames=cfg.num_frames,
                        dtype=dtype, name=f"up_{i}_attentions_{j}")(h, context)
            if i != n_blocks - 1:
                h = Upsample(ch, dtype=dtype, name=f"up_{i}_upsample")(h)

        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, use_fast_variance=False, dtype=jnp.float32,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=jnp.float32,
                    name="conv_out")(h)
        return h.astype(jnp.float32)
