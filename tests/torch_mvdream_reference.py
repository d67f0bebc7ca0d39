"""Minimal torch MVDream MultiViewUNetModel with LDM state-dict layout.

Golden reference for scripts/convert_mvdream_checkpoint.py + the Flax
multiview UNet: mirrors the vendored MVDream model's architecture AND key
naming (reference extern/mvdream/ldm/modules/diffusionmodules/
openaimodel.py MultiViewUNetModel, attention.py SpatialTransformer3D /
BasicTransformerBlock3D) at a configurable tiny size, so a random
checkpoint can be converted and compared output-for-output:

- time_embed.0/2 + camera_embed.0/2 Sequentials (openaimodel.py:930-943),
- input_blocks / middle_block / output_blocks module numbering,
- ResBlock in_layers.0/2, emb_layers.1, out_layers.0/3, skip_connection,
- SpatialTransformer3D with use_linear=True (sd-v2.1-base-4view config)
  and the cross-view self-attention flatten (b f) l c -> b (f l) c
  (attention.py:348-351).
"""

from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t, dim, max_period=10000.0):
    half = dim // 2
    freqs = torch.exp(-math.log(max_period)
                      * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None, :]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class LDMResBlock(nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch):
        super().__init__()
        self.in_layers = nn.Sequential(
            nn.GroupNorm(32, in_ch, eps=1e-5), nn.SiLU(),
            nn.Conv2d(in_ch, out_ch, 3, padding=1))
        self.emb_layers = nn.Sequential(nn.SiLU(),
                                        nn.Linear(temb_ch, out_ch))
        self.out_layers = nn.Sequential(
            nn.GroupNorm(32, out_ch, eps=1e-5), nn.SiLU(), nn.Dropout(0.0),
            nn.Conv2d(out_ch, out_ch, 3, padding=1))
        self.skip_connection = (nn.Conv2d(in_ch, out_ch, 1)
                                if in_ch != out_ch else nn.Identity())

    def forward(self, x, emb):
        h = self.in_layers(x)
        h = h + self.emb_layers(emb)[:, :, None, None]
        h = self.out_layers(h)
        return h + self.skip_connection(x)


class LDMCrossAttention(nn.Module):
    def __init__(self, query_dim, context_dim, heads, head_dim):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(context_dim, inner, bias=False)
        self.to_v = nn.Linear(context_dim, inner, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, query_dim),
                                    nn.Dropout(0.0))

    def forward(self, x, context=None):
        context = x if context is None else context
        B, L, _ = x.shape
        S = context.shape[1]
        H, D = self.heads, self.head_dim
        q = self.to_q(x).view(B, L, H, D).transpose(1, 2)
        k = self.to_k(context).view(B, S, H, D).transpose(1, 2)
        v = self.to_v(context).view(B, S, H, D).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(D), dim=-1)
        return self.to_out((attn @ v).transpose(1, 2).reshape(B, L, H * D))


class LDMGEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class LDMFeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        inner = dim * mult
        self.net = nn.Sequential(LDMGEGLU(dim, inner), nn.Dropout(0.0),
                                 nn.Linear(inner, dim))

    def forward(self, x):
        return self.net(x)


class BasicTransformerBlock3D(nn.Module):
    def __init__(self, dim, context_dim, heads, head_dim):
        super().__init__()
        self.attn1 = LDMCrossAttention(dim, dim, heads, head_dim)
        self.ff = LDMFeedForward(dim)
        self.attn2 = LDMCrossAttention(dim, context_dim, heads, head_dim)
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)

    def forward(self, x, context, num_frames=1):
        BF, L, C = x.shape
        B = BF // num_frames
        x = x.reshape(B, num_frames * L, C)
        x = self.attn1(self.norm1(x)) + x
        x = x.reshape(BF, L, C)
        x = self.attn2(self.norm2(x), context) + x
        x = self.ff(self.norm3(x)) + x
        return x


class SpatialTransformer3D(nn.Module):
    """use_linear=True variant."""

    def __init__(self, ch, context_dim, heads, head_dim, depth=1):
        super().__init__()
        self.norm = nn.GroupNorm(32, ch, eps=1e-6)
        self.proj_in = nn.Linear(ch, ch)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock3D(ch, context_dim, heads, head_dim)
             for _ in range(depth)])
        self.proj_out = nn.Linear(ch, ch)

    def forward(self, x, context, num_frames=1):
        B, C, H, W = x.shape
        res = x
        h = self.norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        h = self.proj_in(h)
        for blk in self.transformer_blocks:
            h = blk(h, context, num_frames)
        h = self.proj_out(h)
        return h.reshape(B, H, W, C).permute(0, 3, 1, 2) + res


class LDMDownsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.op = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.op(x)


class LDMUpsample(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class TorchMultiViewUNet(nn.Module):
    """openaimodel MultiViewUNetModel, LDM key layout (tiny-configurable)."""

    def __init__(self, in_channels=4, out_channels=4,
                 block_out_channels=(32, 32, 64, 64), layers_per_block=2,
                 context_dim=48, head_dim=8, camera_dim=16, num_frames=4):
        super().__init__()
        boc = list(block_out_channels)
        n = len(boc)
        temb = boc[0] * 4
        self.model_channels = boc[0]
        self.num_frames = num_frames
        self.layers_per_block = layers_per_block

        self.time_embed = nn.Sequential(
            nn.Linear(boc[0], temb), nn.SiLU(), nn.Linear(temb, temb))
        self.camera_embed = nn.Sequential(
            nn.Linear(camera_dim, temb), nn.SiLU(), nn.Linear(temb, temb))

        def heads(ch):
            return max(1, ch // head_dim)

        self.input_blocks = nn.ModuleList(
            [nn.ModuleList([nn.Conv2d(in_channels, boc[0], 3, padding=1)])])
        ch = boc[0]
        skip_chs = [ch]
        for i, out_ch in enumerate(boc):
            is_final = i == n - 1
            for j in range(layers_per_block):
                mods = nn.ModuleList([LDMResBlock(ch, out_ch, temb)])
                ch = out_ch
                if not is_final:
                    mods.append(SpatialTransformer3D(
                        out_ch, context_dim, heads(out_ch), head_dim))
                self.input_blocks.append(mods)
                skip_chs.append(ch)
            if not is_final:
                self.input_blocks.append(
                    nn.ModuleList([LDMDownsample(out_ch)]))
                skip_chs.append(out_ch)

        self.middle_block = nn.ModuleList([
            LDMResBlock(ch, ch, temb),
            SpatialTransformer3D(ch, context_dim, heads(ch), head_dim),
            LDMResBlock(ch, ch, temb)])

        self.output_blocks = nn.ModuleList()
        for i, out_ch in enumerate(reversed(boc)):
            block_idx = n - 1 - i
            has_attn = block_idx != n - 1
            for j in range(layers_per_block + 1):
                skip = skip_chs.pop()
                mods = nn.ModuleList([LDMResBlock(ch + skip, out_ch, temb)])
                ch = out_ch
                if has_attn:
                    mods.append(SpatialTransformer3D(
                        out_ch, context_dim, heads(out_ch), head_dim))
                if j == layers_per_block and i != n - 1:
                    mods.append(LDMUpsample(out_ch))
                self.output_blocks.append(mods)

        self.out = nn.Sequential(
            nn.GroupNorm(32, boc[0], eps=1e-5), nn.SiLU(),
            nn.Conv2d(boc[0], out_channels, 3, padding=1))

    def _run(self, mods, h, emb, context):
        for m in mods:
            if isinstance(m, LDMResBlock):
                h = m(h, emb)
            elif isinstance(m, SpatialTransformer3D):
                h = m(h, context, self.num_frames)
            else:
                h = m(h)
        return h

    def forward(self, x, timesteps, context, camera):
        emb = self.time_embed(timestep_embedding(timesteps,
                                                 self.model_channels))
        emb = emb + self.camera_embed(camera)  # openaimodel.py:1200
        h = x
        skips = []
        for mods in self.input_blocks:
            h = self._run(mods, h, emb, context)
            skips.append(h)
        h = self._run(self.middle_block, h, emb, context)
        for mods in self.output_blocks:
            h = torch.cat([h, skips.pop()], dim=1)
            h = self._run(mods, h, emb, context)
        return self.out(h)
