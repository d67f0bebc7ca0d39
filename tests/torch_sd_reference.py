"""Minimal torch implementation of the diffusers SD2.1 UNet/VAE-encoder.

Golden reference for validating scripts/convert_sd_checkpoint.py + the Flax
port (VERDICT r1 item 3): diffusers itself is not installed in this image,
so this mirrors the exact architecture and STATE-DICT KEY LAYOUT of
diffusers' UNet2DConditionModel (SD2.1-base config:
use_linear_projection=True, GEGLU feed-forward, flip_sin_to_cos time
embedding) and AutoencoderKL encoder. A randomly-initialized instance is
converted with the shipped converter and compared against the Flax forward
on fixed inputs — catching layout transposes, key-mapping errors, and
architectural drift in either implementation.

Reference provenance: architecture transcribed from the diffusers public
model cards / the reference's runtime dependency
(threestudio/models/guidance/stable_diffusion_asd_guidance.py:68-71 loads
stabilityai/stable-diffusion-2-1-base via StableDiffusionPipeline).
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class ResnetBlock2D(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, in_ch, eps=1e-5)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_ch, out_ch)
        self.norm2 = nn.GroupNorm(32, out_ch, eps=1e-5)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (nn.Conv2d(in_ch, out_ch, 1)
                              if in_ch != out_ch else None)

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        res = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return h + res


class CrossAttention(nn.Module):
    def __init__(self, query_dim, context_dim, heads, head_dim):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(context_dim, inner, bias=False)
        self.to_v = nn.Linear(context_dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim)])

    def forward(self, x, context=None):
        context = x if context is None else context
        B, L, _ = x.shape
        S = context.shape[1]
        H, D = self.heads, self.head_dim
        q = self.to_q(x).view(B, L, H, D).transpose(1, 2)
        k = self.to_k(context).view(B, S, H, D).transpose(1, 2)
        v = self.to_v(context).view(B, S, H, D).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(D), dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, L, H * D)
        return self.to_out[0](out)


class GEGLUFeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult

        class _Proj(nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = nn.Linear(dim, inner * 2)

            def forward(self, x):
                h, gate = self.proj(x).chunk(2, dim=-1)
                return h * F.gelu(gate)

        # diffusers layout: ff.net.0.proj / ff.net.2
        self.net = nn.ModuleList([_Proj(), nn.Identity(),
                                  nn.Linear(inner, dim)])

    def forward(self, x):
        return self.net[2](self.net[0](x))


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim, context_dim, heads, head_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = CrossAttention(dim, dim, heads, head_dim)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = CrossAttention(dim, context_dim, heads, head_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = GEGLUFeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        return x


class Transformer2DModel(nn.Module):
    """use_linear_projection=True variant (SD2.1)."""

    def __init__(self, ch, context_dim, heads, head_dim, depth=1):
        super().__init__()
        self.norm = nn.GroupNorm(32, ch, eps=1e-6)
        self.proj_in = nn.Linear(ch, ch)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(ch, context_dim, heads, head_dim)
             for _ in range(depth)])
        self.proj_out = nn.Linear(ch, ch)

    def forward(self, x, context):
        B, C, H, W = x.shape
        res = x
        h = self.norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        h = self.proj_in(h)
        for blk in self.transformer_blocks:
            h = blk(h, context)
        h = self.proj_out(h)
        return h.reshape(B, H, W, C).permute(0, 3, 1, 2) + res


class Downsample2D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class _Block(nn.Module):
    """Container matching diffusers down/up block key layout."""

    def __init__(self):
        super().__init__()


class TimeEmbedding(nn.Module):
    def __init__(self, in_dim, dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


def timestep_embedding(t, dim, max_period=10000.0):
    half = dim // 2
    freqs = torch.exp(-math.log(max_period)
                      * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None, :]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TorchUNet(nn.Module):
    """diffusers UNet2DConditionModel (SD2.1 config family), key-compatible."""

    def __init__(self, in_channels=4, out_channels=4,
                 block_out_channels=(320, 640, 1280, 1280),
                 layers_per_block=2, cross_attention_dim=1024,
                 attention_head_dim=64):
        super().__init__()
        boc = list(block_out_channels)
        n = len(boc)
        temb = boc[0] * 4
        self.layers_per_block = layers_per_block
        self.block_out_channels = boc
        self.conv_in = nn.Conv2d(in_channels, boc[0], 3, padding=1)
        self.time_embedding = TimeEmbedding(boc[0], temb)

        def heads(ch):
            return max(1, ch // attention_head_dim)

        self.down_blocks = nn.ModuleList()
        ch = boc[0]
        skip_chs = [boc[0]]
        for i, out_ch in enumerate(boc):
            blk = _Block()
            is_final = i == n - 1
            resnets, attns = nn.ModuleList(), nn.ModuleList()
            for j in range(layers_per_block):
                resnets.append(ResnetBlock2D(ch, out_ch, temb))
                ch = out_ch
                if not is_final:
                    attns.append(Transformer2DModel(
                        out_ch, cross_attention_dim, heads(out_ch),
                        attention_head_dim))
                skip_chs.append(ch)
            blk.resnets = resnets
            if not is_final:
                blk.attentions = attns
                blk.downsamplers = nn.ModuleList([Downsample2D(out_ch)])
                skip_chs.append(out_ch)
            self.down_blocks.append(blk)

        mid = _Block()
        mid.resnets = nn.ModuleList([ResnetBlock2D(ch, ch, temb),
                                     ResnetBlock2D(ch, ch, temb)])
        mid.attentions = nn.ModuleList([Transformer2DModel(
            ch, cross_attention_dim, heads(ch), attention_head_dim)])
        self.mid_block = mid

        self.up_blocks = nn.ModuleList()
        for i, out_ch in enumerate(reversed(boc)):
            blk = _Block()
            block_idx = n - 1 - i
            has_attn = block_idx != n - 1
            resnets, attns = nn.ModuleList(), nn.ModuleList()
            for j in range(layers_per_block + 1):
                skip = skip_chs.pop()
                resnets.append(ResnetBlock2D(ch + skip, out_ch, temb))
                ch = out_ch
                if has_attn:
                    attns.append(Transformer2DModel(
                        out_ch, cross_attention_dim, heads(out_ch),
                        attention_head_dim))
            blk.resnets = resnets
            if has_attn:
                blk.attentions = attns
            if i != n - 1:
                blk.upsamplers = nn.ModuleList([Upsample2D(out_ch)])
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(32, boc[0], eps=1e-5)
        self.conv_out = nn.Conv2d(boc[0], out_channels, 3, padding=1)

    def forward(self, sample, timesteps, encoder_hidden_states):
        temb = self.time_embedding(
            timestep_embedding(timesteps, self.block_out_channels[0]))
        h = self.conv_in(sample)
        skips = [h]
        n = len(self.block_out_channels)
        for i, blk in enumerate(self.down_blocks):
            is_final = i == n - 1
            for j, res in enumerate(blk.resnets):
                h = res(h, temb)
                if not is_final:
                    h = blk.attentions[j](h, encoder_hidden_states)
                skips.append(h)
            if not is_final:
                h = blk.downsamplers[0](h)
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, encoder_hidden_states)
        h = self.mid_block.resnets[1](h, temb)
        for i, blk in enumerate(self.up_blocks):
            has_attn = hasattr(blk, "attentions")
            for j, res in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = res(h, temb)
                if has_attn:
                    h = blk.attentions[j](h, encoder_hidden_states)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


# ----------------------------------------------------------------- VAE


class VAEResnet(nn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.norm1 = nn.GroupNorm(32, in_ch, eps=1e-6)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm2 = nn.GroupNorm(32, out_ch, eps=1e-6)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (nn.Conv2d(in_ch, out_ch, 1)
                              if in_ch != out_ch else None)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        return h + (x if self.conv_shortcut is None
                    else self.conv_shortcut(x))


class VAEAttention(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.group_norm = nn.GroupNorm(32, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(C), dim=-1)
        h = self.to_out[0](attn @ v)
        return x + h.reshape(B, H, W, C).permute(0, 3, 1, 2)


class VAEDownsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class TorchVAEEncoder(nn.Module):
    """diffusers AutoencoderKL encoder + quant_conv, key-compatible
    (encoder.* / quant_conv.* prefixes)."""

    def __init__(self, in_channels=3, latent_channels=4,
                 block_out_channels=(128, 256, 512, 512),
                 layers_per_block=2):
        super().__init__()
        boc = list(block_out_channels)
        n = len(boc)

        enc = _Block()
        enc.conv_in = nn.Conv2d(in_channels, boc[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        ch = boc[0]
        for i, out_ch in enumerate(boc):
            blk = _Block()
            resnets = nn.ModuleList()
            for j in range(layers_per_block):
                resnets.append(VAEResnet(ch, out_ch))
                ch = out_ch
            blk.resnets = resnets
            if i != n - 1:
                blk.downsamplers = nn.ModuleList([VAEDownsample(out_ch)])
            enc.down_blocks.append(blk)
        mid = _Block()
        mid.resnets = nn.ModuleList([VAEResnet(ch, ch), VAEResnet(ch, ch)])
        mid.attentions = nn.ModuleList([VAEAttention(ch)])
        enc.mid_block = mid
        enc.conv_norm_out = nn.GroupNorm(32, ch, eps=1e-6)
        enc.conv_out = nn.Conv2d(ch, 2 * latent_channels, 3, padding=1)
        self.encoder = enc
        self.quant_conv = nn.Conv2d(2 * latent_channels,
                                    2 * latent_channels, 1)

    def forward(self, x):
        e = self.encoder
        h = e.conv_in(x)
        for blk in e.down_blocks:
            for res in blk.resnets:
                h = res(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
        h = e.mid_block.resnets[0](h)
        h = e.mid_block.attentions[0](h)
        h = e.mid_block.resnets[1](h)
        h = e.conv_out(F.silu(e.conv_norm_out(h)))
        return self.quant_conv(h)
