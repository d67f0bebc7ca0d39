"""`mvdream-random-multiview-camera-datamodule`.

Parity target: reference `threestudio/data/uncond_multiview.py:30-258`:
n_view copies per scene sharing elevation/distance/fov, azimuth spread
evenly over the range per scene; relative radius (distance scaled by
1/tan(fov/2)); zoom range shrinking fov after distance is fixed.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np

from .. import register
from ..core.base import BaseObject
from ..core.config import parse_structured
from .cameras import (camera_position_from_spherical, get_mvp_matrix,
                      get_projection_matrix, get_ray_directions, get_rays,
                      look_at_c2w, normalize)
from .uncond import (RandomCameraDataModuleConfig, RandomCameraDataset,
                     RandomCameraIterableDataset)


@dataclass
class RandomMultiviewCameraDataModuleConfig(RandomCameraDataModuleConfig):
    relative_radius: bool = True
    n_view: int = 1
    zoom_range: Tuple[float, float] = (1.0, 1.0)


class RandomMultiviewCameraIterableDataset(RandomCameraIterableDataset):
    def __init__(self, cfg, rng=None):
        super().__init__(cfg, rng=rng)
        self.zoom_range = cfg.zoom_range

    def _repeat(self, v):
        return np.repeat(v, self.cfg.n_view, axis=0)

    def collate(self, _batch=None) -> dict:
        n_view = self.cfg.n_view
        assert self.batch_size % n_view == 0
        rb = self.batch_size // n_view  # real (scene) batch size
        B = self.batch_size

        # elevation shared per scene (reference :47-76)
        lo, hi = self.elevation_range
        if self.rng.random() < 0.5:
            elevation_deg = self._repeat(
                self.rng.random(rb).astype(np.float32) * (hi - lo) + lo)
            elevation = np.deg2rad(elevation_deg)
        else:
            lo_p = (lo + 90.0) / 180.0
            hi_p = (hi + 90.0) / 180.0
            u = self.rng.random(rb).astype(np.float32)
            elevation = self._repeat(
                np.arcsin(2 * (u * (hi_p - lo_p) + lo_p) - 1.0))
            elevation_deg = np.rad2deg(elevation)

        # azimuth spread evenly across views per scene (reference :79-88)
        a_lo, a_hi = self.azimuth_range
        azimuth_deg = ((self.rng.random(rb).astype(np.float32).reshape(-1, 1)
                        + np.arange(n_view).reshape(1, -1)).reshape(-1)
                       / n_view * (a_hi - a_lo) + a_lo)
        azimuth = np.deg2rad(azimuth_deg)

        fovy_deg = self._repeat(self._uniform(rb, *self.fovy_range))
        fovy = np.deg2rad(fovy_deg)
        camera_distances = self._repeat(
            self._uniform(rb, *self.camera_distance_range))
        if self.cfg.relative_radius:
            camera_distances = camera_distances / np.tan(0.5 * fovy)
        zoom = self._repeat(self._uniform(rb, *self.zoom_range))
        fovy = fovy * zoom
        fovy_deg = fovy_deg * zoom

        camera_positions = camera_position_from_spherical(
            elevation, azimuth, camera_distances)
        center = np.zeros((B, 3), dtype=np.float32)
        up = np.tile(np.array([0, 0, 1], np.float32), (B, 1))
        camera_positions = camera_positions + self._repeat(
            (self.rng.random((rb, 3)).astype(np.float32) * 2 - 1)
            * self.cfg.camera_perturb)
        center = center + self._repeat(
            self.rng.standard_normal((rb, 3)).astype(np.float32)
            * self.cfg.center_perturb)
        up = up + self._repeat(
            self.rng.standard_normal((rb, 3)).astype(np.float32)
            * self.cfg.up_perturb)

        light_distances = self._repeat(
            self._uniform(rb, *self.cfg.light_distance_range))
        light_positions = self._sample_lights(camera_positions,
                                              light_distances)

        c2w = look_at_c2w(camera_positions, center, up)
        focal = 0.5 * self.height / np.tan(0.5 * fovy)
        directions = np.tile(self.directions_unit_focal[None],
                             (B, 1, 1, 1)).copy()
        directions[..., :2] /= focal[:, None, None, None]
        rays_o, rays_d = get_rays(directions, c2w, keepdim=True,
                                  normalize_d=self.cfg.rays_d_normalize)
        proj = get_projection_matrix(fovy, self.width / self.height,
                                     0.1, 1000.0)
        mvp_mtx = get_mvp_matrix(c2w, proj)

        return {
            "rays_o": rays_o,
            "rays_d": rays_d,
            "mvp_mtx": mvp_mtx,
            "camera_positions": camera_positions,
            "c2w": c2w,
            "light_positions": light_positions,
            "elevation": elevation_deg,
            "azimuth": azimuth_deg,
            "camera_distances": camera_distances,
            "height": self.height,
            "width": self.width,
            "fovy": fovy.astype(np.float32),
            "proj_mtx": proj,
        }


@register("mvdream-random-multiview-camera-datamodule")
class RandomMultiviewCameraDataModule(BaseObject):
    @dataclass
    class Config(RandomMultiviewCameraDataModuleConfig):
        pass

    def __init__(self, cfg=None, seed: int = 0):
        self.cfg = parse_structured(self.Config, cfg)
        self.seed = seed
        self.train_dataset = None
        self.val_dataset = None
        self.test_dataset = None

    def setup(self, stage=None):
        if stage in (None, "fit"):
            self.train_dataset = RandomMultiviewCameraIterableDataset(
                self.cfg, rng=np.random.default_rng(self.seed))
        if stage in (None, "fit", "validate"):
            self.val_dataset = RandomCameraDataset(self.cfg, "val")
        if stage in (None, "test", "predict"):
            self.test_dataset = RandomCameraDataset(self.cfg, "test")

    def train_batch(self):
        return self.train_dataset.collate()
