"""`patch-renderer`: memory-saving wrapper — low-res global pass + one
random full-res patch.

Parity target: reference `threestudio/models/renderers/patch_renderer.py:15-106`
(unused by shipped configs but part of the registry surface). The random
patch origin comes from the "sampling" rng stream with dynamic_slice, so the
whole thing stays one jitted program.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ... import find, register
from ...core.config import parse_structured


@register("patch-renderer")
class PatchRenderer(nn.Module):
    @dataclass
    class Config:
        patch_size: int = 128
        base_renderer_type: str = ""
        base_renderer: dict = field(default_factory=dict)
        global_detach: bool = False
        global_downsample: int = 4
        radius: float = 1.0

    cfg: "PatchRenderer.Config"
    geometry: nn.Module
    material: nn.Module
    background: nn.Module

    @property
    def min_init_hw(self) -> int:
        # param init (BaseSystem.init_rays) may spatially cap the rays;
        # this renderer dynamic-slices a full patch out of them, so the
        # init rays must be at least patch_size on each spatial axis
        return self.cfg.patch_size

    def setup(self):
        base_cls = find(self.cfg.base_renderer_type)
        self.base_renderer = base_cls(
            cfg=parse_structured(base_cls.Config, self.cfg.base_renderer),
            geometry=self.geometry, material=self.material,
            background=self.background)

    def __call__(self, rays_o, rays_d, light_positions=None, bg_color=None,
                 train: bool = True, **kwargs):
        B, H, W, _ = rays_o.shape
        if not train:
            return self.base_renderer(rays_o, rays_d,
                                      light_positions=light_positions,
                                      bg_color=bg_color, train=train,
                                      **kwargs)
        ds = self.cfg.global_downsample
        g_o = jax.image.resize(rays_o, (B, H // ds, W // ds, 3), "bilinear")
        g_d = jax.image.resize(rays_d, (B, H // ds, W // ds, 3), "bilinear")
        out_global = self.base_renderer(
            g_o, g_d, light_positions=light_positions, bg_color=bg_color,
            train=train, **kwargs)

        PS = self.cfg.patch_size
        key = self.make_rng("sampling")
        kx, ky = jax.random.split(key)
        px = jax.random.randint(kx, (), 0, max(W - PS, 1))
        py = jax.random.randint(ky, (), 0, max(H - PS, 1))
        p_o = jax.lax.dynamic_slice(rays_o, (0, py, px, 0), (B, PS, PS, 3))
        p_d = jax.lax.dynamic_slice(rays_d, (0, py, px, 0), (B, PS, PS, 3))
        out_patch = self.base_renderer(
            p_o, p_d, light_positions=light_positions, bg_color=bg_color,
            train=train, **kwargs)

        rgb_ndim = out_patch["comp_rgb"].ndim
        patch_hw = out_patch["comp_rgb"].shape[1:3]
        out = dict(out_global)
        for k, v in out_patch.items():
            gv = out_global.get(k)
            if (gv is None or not hasattr(v, "ndim") or v.ndim != rgb_ndim
                    or v.shape[1:3] != patch_hw):
                continue
            up = jax.image.resize(gv, (B, H, W, gv.shape[-1]), "bilinear")
            if self.cfg.global_detach:
                up = jax.lax.stop_gradient(up)
            out[k] = jax.lax.dynamic_update_slice(up, v, (0, py, px, 0))
        return out
