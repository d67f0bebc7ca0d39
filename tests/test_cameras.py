"""Camera/ray math tests against closed-form expectations (SURVEY.md §4a)."""

import numpy as np
import pytest

from scaledreamer_tpu.core.config import parse_structured
from scaledreamer_tpu.data.cameras import (
    camera_position_from_spherical, get_mvp_matrix, get_projection_matrix,
    get_ray_directions, get_rays, look_at_c2w)
from scaledreamer_tpu.data.uncond import (
    RandomCameraDataModuleConfig, RandomCameraDataset,
    RandomCameraIterableDataset)


def test_ray_directions_center_pixel():
    H = W = 4
    d = get_ray_directions(H, W, focal=1.0)
    assert d.shape == (4, 4, 3)
    # all z components are -1 (camera looks down -z)
    assert np.allclose(d[..., 2], -1.0)
    # pixel centers: top-left pixel has x = (0.5 - 2)/1 = -1.5, y = +1.5
    assert np.allclose(d[0, 0], [-1.5, 1.5, -1.0])
    # symmetry
    assert np.allclose(d[0, 0, 0], -d[0, -1, 0])
    assert np.allclose(d[0, 0, 1], -d[-1, 0, 1])


def test_look_at_c2w_axes():
    # camera at +x looking at origin, up +z -> lookat = -x
    eye = np.array([[2.0, 0.0, 0.0]], dtype=np.float32)
    center = np.zeros((1, 3), np.float32)
    up = np.array([[0.0, 0.0, 1.0]], np.float32)
    c2w = look_at_c2w(eye, center, up)
    # camera -z axis (third column negated) should point at origin
    assert np.allclose(-c2w[0, :3, 2], [-1, 0, 0], atol=1e-6)
    assert np.allclose(c2w[0, :3, 3], eye[0])
    # rotation is orthonormal
    R = c2w[0, :3, :3]
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_get_rays_through_center():
    eye = np.array([[0.0, 0.0, 2.0]], dtype=np.float32)
    c2w = look_at_c2w(eye, np.zeros((1, 3), np.float32),
                      np.array([[0, 1, 0]], np.float32))
    H = W = 3
    d = get_ray_directions(H, W, focal=100.0)  # narrow fov
    rays_o, rays_d = get_rays(np.tile(d[None], (1, 1, 1, 1)), c2w, keepdim=True)
    assert rays_o.shape == (1, 3, 3, 3)
    # center ray points from +z toward origin = -z
    center_dir = rays_d[0, 1, 1]
    assert np.allclose(center_dir, [0, 0, -1], atol=1e-2)
    assert np.allclose(np.linalg.norm(rays_d, axis=-1), 1.0, atol=1e-6)


def test_spherical_camera_positions():
    # elevation 0, azimuth 0 -> +x
    p = camera_position_from_spherical(
        np.array([0.0]), np.array([0.0]), np.array([2.0]))
    assert np.allclose(p, [[2, 0, 0]], atol=1e-6)
    # elevation 90 -> +z
    p = camera_position_from_spherical(
        np.array([np.pi / 2]), np.array([0.0]), np.array([1.5]))
    assert np.allclose(p, [[0, 0, 1.5]], atol=1e-6)


def test_projection_and_mvp():
    fovy = np.array([np.deg2rad(60.0)], np.float32)
    proj = get_projection_matrix(fovy, 1.0, 0.01, 100.0)
    assert proj.shape == (1, 4, 4)
    assert proj[0, 0, 0] == pytest.approx(1.0 / np.tan(np.deg2rad(30.0)), rel=1e-5)
    assert proj[0, 3, 2] == -1.0
    eye = np.array([[0, 0, 3.0]], np.float32)
    c2w = look_at_c2w(eye, np.zeros((1, 3), np.float32),
                      np.array([[0, 1, 0]], np.float32))
    mvp = get_mvp_matrix(c2w, proj)
    # origin projects to screen center with positive depth
    pt = mvp[0] @ np.array([0, 0, 0, 1.0])
    assert pt[3] > 0
    assert np.allclose(pt[:2] / pt[3], 0.0, atol=1e-5)


def _mk_dataset(**kw):
    cfg = parse_structured(RandomCameraDataModuleConfig, kw)
    return RandomCameraIterableDataset(cfg, rng=np.random.default_rng(0))


def test_random_camera_collate_shapes():
    ds = _mk_dataset(height=32, width=32, batch_size=4)
    b = ds.collate()
    assert b["rays_o"].shape == (4, 32, 32, 3)
    assert b["rays_d"].shape == (4, 32, 32, 3)
    assert b["c2w"].shape == (4, 4, 4)
    assert b["mvp_mtx"].shape == (4, 4, 4)
    assert b["light_positions"].shape == (4, 3)
    assert np.allclose(np.linalg.norm(b["rays_d"], axis=-1), 1.0, atol=1e-5)


def test_random_camera_ranges():
    ds = _mk_dataset(batch_size=64, elevation_range=(10, 20),
                     azimuth_range=(-30, 30),
                     camera_distance_range=(1.0, 1.1), progressive_until=0)
    for _ in range(5):
        b = ds.collate()
        assert (b["elevation"] >= 10 - 1e-5).all() and (b["elevation"] <= 20 + 1e-5).all()
        assert (b["azimuth"] >= -30 - 1e-4).all() and (b["azimuth"] <= 30 + 1e-4).all()


def test_batch_uniform_azimuth_covers_range():
    ds = _mk_dataset(batch_size=8, azimuth_range=(-180, 180))
    b = ds.collate()
    az = np.sort(b["azimuth"])
    # each of the 8 strata contains exactly one sample
    edges = np.linspace(-180, 180, 9)
    counts, _ = np.histogram(az, bins=edges)
    assert (counts == 1).all()


def test_resolution_milestones():
    ds = _mk_dataset(height=[32, 64], width=[32, 64], batch_size=[4, 2],
                     resolution_milestones=[100])
    ds.update_step(0, 0)
    assert ds.height == 32 and ds.batch_size == 4
    ds.update_step(0, 100)
    assert ds.height == 64 and ds.batch_size == 2
    b = ds.collate()
    assert b["rays_o"].shape == (2, 64, 64, 3)


def test_progressive_view_narrows_ranges():
    ds = _mk_dataset(elevation_range=(-10, 90), azimuth_range=(-180, 180),
                     progressive_until=1000, eval_elevation_deg=15.0)
    ds.update_step(0, 0)
    lo, hi = ds.elevation_range
    assert abs(lo - 15.0) < 0.1 and abs(hi - 15.0) < 0.2
    ds.update_step(0, 10_000)
    assert ds.elevation_range == [-10, 90]


def test_magic3d_light_strategy():
    ds = _mk_dataset(batch_size=16, light_sample_strategy="magic3d")
    b = ds.collate()
    assert b["light_positions"].shape == (16, 3)
    assert np.isfinite(b["light_positions"]).all()


def test_eval_dataset_circular():
    cfg = parse_structured(RandomCameraDataModuleConfig,
                           {"n_test_views": 8, "eval_height": 16,
                            "eval_width": 16})
    ds = RandomCameraDataset(cfg, "test")
    assert len(ds) == 8
    az = np.array([b["azimuth"][0] for b in ds])
    assert az[0] == 0.0
    assert np.all(np.diff(az) > 0)
    b = ds[0]
    assert b["rays_o"].shape == (1, 16, 16, 3)
