"""Random-camera data module (`random-camera-datamodule`).

Behavior-parity rebuild of reference `threestudio/data/uncond.py:27-518`:
per-step random elevation (uniform-angle or uniform-on-sphere), batch-uniform
azimuth, distance/fov sampling, camera/center/up perturbations, two light
sampling strategies (dreamfusion / magic3d), resolution milestones,
progressive view widening, and deterministic circular eval cameras.

TPU-native differences:
- pure NumPy host-side sampling seeded by an explicit ``np.random.Generator``
  (per-process seed folding replaces torch global RNG; reference launch.py:171);
- fixed output shapes per resolution milestone, so the jitted step compiles
  once per milestone;
- no torch DataLoader: ``next_batch()`` is called directly by the trainer
  (the reference runs num_workers=0 anyway).
"""

from __future__ import annotations

import bisect
import math
from dataclasses import dataclass, field
from typing import Any, List, Tuple

import numpy as np

from .. import register
from ..core.base import BaseObject, Updateable
from ..core.config import parse_structured
from .cameras import (
    camera_position_from_spherical,
    get_mvp_matrix,
    get_projection_matrix,
    get_ray_directions,
    get_rays,
    intrinsic_from_fovy,
    look_at_c2w,
    normalize,
)


@dataclass
class RandomCameraDataModuleConfig:
    height: Any = 64
    width: Any = 64
    batch_size: Any = 1
    resolution_milestones: List[int] = field(default_factory=list)
    eval_height: int = 512
    eval_width: int = 512
    eval_batch_size: int = 1
    n_val_views: int = 1
    n_test_views: int = 120
    elevation_range: Tuple[float, float] = (-10, 90)
    azimuth_range: Tuple[float, float] = (-180, 180)
    camera_distance_range: Tuple[float, float] = (1, 1.5)
    fovy_range: Tuple[float, float] = (40, 70)
    camera_perturb: float = 0.1
    center_perturb: float = 0.2
    up_perturb: float = 0.02
    light_position_perturb: float = 1.0
    light_distance_range: Tuple[float, float] = (0.8, 1.5)
    eval_elevation_deg: float = 15.0
    eval_camera_distance: float = 1.5
    eval_fovy_deg: float = 70.0
    light_sample_strategy: str = "dreamfusion"
    batch_uniform_azimuth: bool = True
    progressive_until: int = 0
    rays_d_normalize: bool = True


def _as_list(v):
    return [v] if isinstance(v, int) else list(v)


class RandomCameraIterableDataset(Updateable):
    """Infinite per-step camera sampler (ref uncond.py:62-344)."""

    def __init__(self, cfg: RandomCameraDataModuleConfig,
                 rng: np.random.Generator | None = None) -> None:
        self.cfg = cfg
        self.rng = rng or np.random.default_rng(0)
        self.heights = _as_list(cfg.height)
        self.widths = _as_list(cfg.width)
        self.batch_sizes = _as_list(cfg.batch_size)
        assert len(self.heights) == len(self.widths) == len(self.batch_sizes)
        if len(self.heights) == 1:
            self.resolution_milestones = [-1]
        else:
            assert len(self.heights) == len(cfg.resolution_milestones) + 1
            self.resolution_milestones = [-1] + list(cfg.resolution_milestones)
        self.directions_unit_focals = [
            get_ray_directions(H=h, W=w, focal=1.0)
            for h, w in zip(self.heights, self.widths)
        ]
        self.height = self.heights[0]
        self.width = self.widths[0]
        self.batch_size = self.batch_sizes[0]
        self.directions_unit_focal = self.directions_unit_focals[0]
        self.elevation_range = list(cfg.elevation_range)
        self.azimuth_range = list(cfg.azimuth_range)
        self.camera_distance_range = list(cfg.camera_distance_range)
        self.fovy_range = list(cfg.fovy_range)

    def update_step(self, epoch: int, global_step: int,
                    on_load_weights: bool = False):
        idx = bisect.bisect_right(self.resolution_milestones, global_step) - 1
        self.height = self.heights[idx]
        self.width = self.widths[idx]
        self.batch_size = self.batch_sizes[idx]
        self.directions_unit_focal = self.directions_unit_focals[idx]
        self._progressive_view(global_step)

    def _progressive_view(self, global_step: int):
        r = min(1.0, global_step / (self.cfg.progressive_until + 1))
        self.elevation_range = [
            (1 - r) * self.cfg.eval_elevation_deg + r * self.cfg.elevation_range[0],
            (1 - r) * self.cfg.eval_elevation_deg + r * self.cfg.elevation_range[1],
        ]
        self.azimuth_range = [
            r * self.cfg.azimuth_range[0],
            r * self.cfg.azimuth_range[1],
        ]

    # --- sampling pieces -------------------------------------------------
    def _sample_elevation(self, B: int):
        lo, hi = self.elevation_range
        if self.rng.random() < 0.5:
            elevation_deg = self.rng.random(B).astype(np.float32) * (hi - lo) + lo
            elevation = np.deg2rad(elevation_deg)
        else:
            # uniform on the sphere via inverse-CDF over sin(elevation)
            lo_r, hi_r = np.deg2rad([lo, hi])
            u = self.rng.random(B).astype(np.float32)
            elevation = np.arcsin(u * (np.sin(hi_r) - np.sin(lo_r)) + np.sin(lo_r))
            elevation_deg = np.rad2deg(elevation)
        return elevation_deg.astype(np.float32), elevation.astype(np.float32)

    def _sample_azimuth(self, B: int):
        lo, hi = self.azimuth_range
        if self.cfg.batch_uniform_azimuth:
            azimuth_deg = (self.rng.random(B).astype(np.float32)
                           + np.arange(B)) / B * (hi - lo) + lo
        else:
            azimuth_deg = self.rng.random(B).astype(np.float32) * (hi - lo) + lo
        return azimuth_deg.astype(np.float32), np.deg2rad(azimuth_deg).astype(np.float32)

    def _uniform(self, B, lo, hi):
        return (self.rng.random(B) * (hi - lo) + lo).astype(np.float32)

    def _sample_lights(self, camera_positions, light_distances):
        B = camera_positions.shape[0]
        strat = self.cfg.light_sample_strategy
        if strat == "dreamfusion":
            d = normalize(camera_positions + self.rng.standard_normal(
                (B, 3)).astype(np.float32) * self.cfg.light_position_perturb)
            return (d * light_distances[:, None]).astype(np.float32)
        if strat == "magic3d":
            local_z = normalize(camera_positions)
            local_x = normalize(np.stack(
                [local_z[:, 1], -local_z[:, 0], np.zeros_like(local_z[:, 0])], -1))
            local_y = normalize(np.cross(local_z, local_x))
            rot = np.stack([local_x, local_y, local_z], axis=-1)
            az = self.rng.random(B).astype(np.float32) * 2 * np.pi - np.pi
            el = self.rng.random(B).astype(np.float32) * np.pi / 3 + np.pi / 6
            local_pos = camera_position_from_spherical(el, az, light_distances)
            return np.einsum("bij,bj->bi", rot, local_pos).astype(np.float32)
        raise ValueError(f"Unknown light sample strategy: {strat}")

    def collate(self, _batch=None) -> dict:
        B = self.batch_size
        elevation_deg, elevation = self._sample_elevation(B)
        azimuth_deg, azimuth = self._sample_azimuth(B)
        camera_distances = self._uniform(B, *self.camera_distance_range)
        camera_positions = camera_position_from_spherical(
            elevation, azimuth, camera_distances)

        center = np.zeros((B, 3), dtype=np.float32)
        up = np.tile(np.array([0, 0, 1], dtype=np.float32), (B, 1))
        camera_positions = camera_positions + (
            self.rng.random((B, 3)).astype(np.float32) * 2 - 1
        ) * self.cfg.camera_perturb
        center = center + self.rng.standard_normal((B, 3)).astype(
            np.float32) * self.cfg.center_perturb
        up = up + self.rng.standard_normal((B, 3)).astype(
            np.float32) * self.cfg.up_perturb

        fovy_deg = self._uniform(B, *self.fovy_range)
        fovy = np.deg2rad(fovy_deg)
        light_distances = self._uniform(B, *self.cfg.light_distance_range)
        light_positions = self._sample_lights(camera_positions, light_distances)

        c2w = look_at_c2w(camera_positions, center, up)
        focal = 0.5 * self.height / np.tan(0.5 * fovy)
        directions = np.tile(self.directions_unit_focal[None], (B, 1, 1, 1))
        directions = directions.copy()
        directions[..., :2] /= focal[:, None, None, None]
        rays_o, rays_d = get_rays(directions, c2w, keepdim=True,
                                  normalize_d=self.cfg.rays_d_normalize)
        proj = get_projection_matrix(fovy, self.width / self.height, 0.01, 100.0)
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


class RandomCameraDataset:
    """Deterministic circular eval cameras (ref uncond.py:347-467)."""

    def __init__(self, cfg: RandomCameraDataModuleConfig, split: str) -> None:
        self.cfg = cfg
        self.split = split
        self.n_views = cfg.n_val_views if split == "val" else cfg.n_test_views
        azimuth_deg = (
            np.linspace(0, 360.0, self.n_views + 1)[: self.n_views]
            if split == "val" else np.linspace(0, 360.0, self.n_views)
        ).astype(np.float32)
        elevation_deg = np.full(self.n_views, cfg.eval_elevation_deg, np.float32)
        camera_distances = np.full(
            self.n_views, cfg.eval_camera_distance, np.float32)
        elevation = np.deg2rad(elevation_deg)
        azimuth = np.deg2rad(azimuth_deg)
        camera_positions = camera_position_from_spherical(
            elevation, azimuth, camera_distances)
        center = np.zeros_like(camera_positions)
        up = np.tile(np.array([0, 0, 1], np.float32), (self.n_views, 1))
        fovy_deg = np.full(self.n_views, cfg.eval_fovy_deg, np.float32)
        fovy = np.deg2rad(fovy_deg)
        light_positions = camera_positions.copy()

        c2w = look_at_c2w(camera_positions, center, up)
        H, W = cfg.eval_height, cfg.eval_width
        focal = 0.5 * H / np.tan(0.5 * fovy)
        directions_unit = get_ray_directions(H, W, focal=1.0)
        directions = np.tile(directions_unit[None], (self.n_views, 1, 1, 1)).copy()
        directions[..., :2] /= focal[:, None, None, None]
        rays_o, rays_d = get_rays(directions, c2w, keepdim=True)
        proj = get_projection_matrix(fovy, W / H, 0.01, 100.0)
        mvp_mtx = get_mvp_matrix(c2w, proj)

        self.batches = [
            {
                "index": i,
                "rays_o": rays_o[i:i + 1],
                "rays_d": rays_d[i:i + 1],
                "mvp_mtx": mvp_mtx[i:i + 1],
                "c2w": c2w[i:i + 1],
                "camera_positions": camera_positions[i:i + 1],
                "light_positions": light_positions[i:i + 1],
                "elevation": elevation_deg[i:i + 1],
                "azimuth": azimuth_deg[i:i + 1],
                "camera_distances": camera_distances[i:i + 1],
                "height": H,
                "width": W,
                "fovy": fovy[i:i + 1],
                "proj_mtx": proj[i:i + 1],
            }
            for i in range(self.n_views)
        ]

    def __len__(self):
        return self.n_views

    def __getitem__(self, i):
        return self.batches[i]

    def __iter__(self):
        return iter(self.batches)


@register("random-camera-datamodule")
class RandomCameraDataModule(BaseObject):
    """Datamodule facade mirroring the reference registration surface
    (ref uncond.py:470-518) minus the torch DataLoader machinery."""

    @dataclass
    class Config(RandomCameraDataModuleConfig):
        pass

    def __init__(self, cfg=None, seed: int = 0):
        self.cfg = parse_structured(self.Config, cfg)
        self.seed = seed
        self.train_dataset = None
        self.val_dataset = None
        self.test_dataset = None

    def setup(self, stage: str | None = None):
        if stage in (None, "fit"):
            self.train_dataset = RandomCameraIterableDataset(
                self.cfg, rng=np.random.default_rng(self.seed))
        if stage in (None, "fit", "validate"):
            self.val_dataset = RandomCameraDataset(self.cfg, "val")
        if stage in (None, "test", "predict"):
            self.test_dataset = RandomCameraDataset(self.cfg, "test")

    def train_batch(self):
        return self.train_dataset.collate()
