"""Camera and ray math, vectorized host-side (NumPy).

Behavior parity with reference `threestudio/utils/ops.py:183-301`
(get_ray_directions / get_rays / get_projection_matrix / get_mvp_matrix) in
the same world convention: right-handed, x back / y right / z up; camera
looks down -z; elevation in (-90, 90) deg, azimuth from +x toward +y.

These run on host CPU per step (they are O(H*W) adds), producing fixed-shape
float32 batches that the single jitted TPU train step consumes — camera
randomness therefore never causes a retrace.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np


def normalize(v: np.ndarray, axis: int = -1, eps: float = 1e-12) -> np.ndarray:
    return v / np.maximum(np.linalg.norm(v, axis=axis, keepdims=True), eps)


def get_ray_directions(
    H: int,
    W: int,
    focal: Union[float, Tuple[float, float]] = 1.0,
    principal: Optional[Tuple[float, float]] = None,
    use_pixel_centers: bool = True,
) -> np.ndarray:
    """Per-pixel ray directions in camera coords, shape [H, W, 3].

    Camera convention: x right (+i), y up (-j), looking along -z.
    """
    center = 0.5 if use_pixel_centers else 0.0
    if isinstance(focal, (int, float)):
        fx = fy = float(focal)
        cx, cy = W / 2, H / 2
    else:
        fx, fy = focal
        assert principal is not None
        cx, cy = principal
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32) + center,
        np.arange(H, dtype=np.float32) + center,
        indexing="xy",
    )
    return np.stack([(i - cx) / fx, -(j - cy) / fy, -np.ones_like(i)], axis=-1)


def get_rays(
    directions: np.ndarray,
    c2w: np.ndarray,
    keepdim: bool = False,
    normalize_d: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Rotate camera-space directions into world space.

    directions: [..., 3]; c2w: [..., 4, 4] broadcastable batch.
    Supports ([HW,3],[4,4]) | ([H,W,3],[4,4] or [B,4,4]) | ([B,H,W,3],[B,4,4]).
    """
    if directions.ndim == 2:
        if c2w.ndim == 2:
            c2w = c2w[None]
        rays_d = np.einsum("nj,bij->bni" if c2w.shape[0] > 1 else "nj,bij->ni",
                           directions, c2w[..., :3, :3])
        rays_d = rays_d.reshape(-1, 3)
        rays_o = np.broadcast_to(c2w[..., :3, 3].reshape(-1, 3)[0], rays_d.shape)
    elif directions.ndim == 3:
        if c2w.ndim == 2:
            rays_d = np.einsum("hwj,ij->hwi", directions, c2w[:3, :3])
            rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape)
        else:
            rays_d = np.einsum("hwj,bij->bhwi", directions, c2w[:, :3, :3])
            rays_o = np.broadcast_to(c2w[:, None, None, :3, 3], rays_d.shape)
    elif directions.ndim == 4:
        assert c2w.ndim == 3
        rays_d = np.einsum("bhwj,bij->bhwi", directions, c2w[:, :3, :3])
        rays_o = np.broadcast_to(c2w[:, None, None, :3, 3], rays_d.shape)
    else:
        raise ValueError(f"Bad directions ndim: {directions.ndim}")
    if normalize_d:
        rays_d = normalize(rays_d)
    rays_o = np.ascontiguousarray(rays_o, dtype=np.float32)
    rays_d = rays_d.astype(np.float32)
    if not keepdim:
        rays_o, rays_d = rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)
    return rays_o, rays_d


def get_projection_matrix(
    fovy: np.ndarray, aspect_wh: float, near: float, far: float
) -> np.ndarray:
    """OpenGL-style projection, y flipped (reference ops.py:273-287)."""
    fovy = np.atleast_1d(np.asarray(fovy, dtype=np.float32))
    B = fovy.shape[0]
    proj = np.zeros((B, 4, 4), dtype=np.float32)
    proj[:, 0, 0] = 1.0 / (np.tan(fovy / 2.0) * aspect_wh)
    proj[:, 1, 1] = -1.0 / np.tan(fovy / 2.0)
    proj[:, 2, 2] = -(far + near) / (far - near)
    proj[:, 2, 3] = -2.0 * far * near / (far - near)
    proj[:, 3, 2] = -1.0
    return proj


def get_mvp_matrix(c2w: np.ndarray, proj: np.ndarray) -> np.ndarray:
    """proj @ w2c, with w2c computed from the rigid inverse of c2w."""
    R_t = np.swapaxes(c2w[:, :3, :3], 1, 2)
    w2c = np.zeros_like(c2w)
    w2c[:, :3, :3] = R_t
    w2c[:, :3, 3] = -np.einsum("bij,bj->bi", R_t, c2w[:, :3, 3])
    w2c[:, 3, 3] = 1.0
    return proj @ w2c


def camera_position_from_spherical(
    elevation: np.ndarray, azimuth: np.ndarray, distance: np.ndarray
) -> np.ndarray:
    """Spherical → cartesian in the x-back/y-right/z-up convention ([B,3])."""
    return np.stack(
        [
            distance * np.cos(elevation) * np.cos(azimuth),
            distance * np.cos(elevation) * np.sin(azimuth),
            distance * np.sin(elevation),
        ],
        axis=-1,
    ).astype(np.float32)


def look_at_c2w(
    camera_positions: np.ndarray, center: np.ndarray, up: np.ndarray
) -> np.ndarray:
    """Build [B,4,4] camera-to-world from eye/center/up (ref uncond.py:299-312)."""
    lookat = normalize(center - camera_positions)
    right = normalize(np.cross(lookat, up))
    up_ortho = normalize(np.cross(right, lookat))
    B = camera_positions.shape[0]
    c2w = np.zeros((B, 4, 4), dtype=np.float32)
    c2w[:, :3, 0] = right
    c2w[:, :3, 1] = up_ortho
    c2w[:, :3, 2] = -lookat
    c2w[:, :3, 3] = camera_positions
    c2w[:, 3, 3] = 1.0
    return c2w


def intrinsic_from_fovy(fovy: np.ndarray, H: int, W: int) -> np.ndarray:
    """[B,3,3] pinhole intrinsics from vertical fov in radians."""
    fovy = np.atleast_1d(fovy)
    B = fovy.shape[0]
    focal = 0.5 * H / np.tan(0.5 * fovy)
    K = np.zeros((B, 3, 3), dtype=np.float32)
    K[:, 0, 0] = focal
    K[:, 1, 1] = focal
    K[:, 0, 2] = W / 2
    K[:, 1, 2] = H / 2
    K[:, 2, 2] = 1.0
    return K
