"""grid_sample equivalents: bilinear/trilinear sampling of feature grids.

Replaces `torch.nn.functional.grid_sample` used by the reference's
plane/voxel sampling (`custom/amortized/models/geometry/utils.py:82-111`)
with vectorized gather + lerp (XLA lowers to TPU dynamic-gather; the lerp
fuses). Conventions match torch grid_sample(align_corners=False,
padding_mode="zeros"): coords in [-1, 1], -1/+1 at the *edges* of the corner
pixels.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _unnormalize(coord, size: int, align_corners: bool):
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample_2d(image, grid, align_corners: bool = False):
    """image [B, H, W, C]; grid [B, N, 2] (x, y in [-1,1]) -> [B, N, C]."""
    B, H, W, C = image.shape
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1
    fx, fy = x - x0, y - y0

    out = 0.0
    for (jx, jy, w) in (
        (x0, y0, (1 - fx) * (1 - fy)),
        (x1, y0, fx * (1 - fy)),
        (x0, y1, (1 - fx) * fy),
        (x1, y1, fx * fy),
    ):
        # vectorized across batch via take with flat indices
        valid = (jx >= 0) & (jx < W) & (jy >= 0) & (jy < H)
        jxc = jnp.clip(jx, 0, W - 1)
        jyc = jnp.clip(jy, 0, H - 1)
        flat = image.reshape(B, H * W, C)
        idx = jyc * W + jxc
        v = jnp.take_along_axis(flat, idx[..., None], axis=1)
        out = out + v * (w * valid)[..., None]
    return out


def grid_sample_3d(volume, grid, align_corners: bool = False):
    """volume [B, D, H, W, C]; grid [B, N, 3] (x->W, y->H, z->D in [-1,1])
    -> [B, N, C]. Torch convention: grid last dim is (x, y, z)."""
    B, D, H, W, C = volume.shape
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)
    z = _unnormalize(grid[..., 2], D, align_corners)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    fx, fy, fz = x - x0, y - y0, z - z0
    flat = volume.reshape(B, D * H * W, C)
    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                jx, jy, jz = x0 + dx, y0 + dy, z0 + dz
                w = (jnp.where(dx, fx, 1 - fx)
                     * jnp.where(dy, fy, 1 - fy)
                     * jnp.where(dz, fz, 1 - fz))
                valid = ((jx >= 0) & (jx < W) & (jy >= 0) & (jy < H)
                         & (jz >= 0) & (jz < D))
                jxc = jnp.clip(jx, 0, W - 1)
                jyc = jnp.clip(jy, 0, H - 1)
                jzc = jnp.clip(jz, 0, D - 1)
                idx = (jzc * H + jyc) * W + jxc
                v = jnp.take_along_axis(flat, idx[..., None], axis=1)
                out = out + v * (w * valid)[..., None]
    return out


def _upsample_matrix(n: int, factor: int) -> np.ndarray:
    """[n*factor, n] constant align-corners linear-interp matrix.

    Each output row has <=2 nonzeros (the 1D lerp weights). Expressing the
    axis interpolation as a matmul instead of a gather-lerp keeps both the
    forward AND the backward on the MXU/VPU (the gather formulation's
    backward is a scatter-add over the voxel — the per-row scatter floor on
    TPU, and a scalar loop on the XLA:CPU AOT path used by the test relay).
    The extra FLOPs are negligible: O(n) per output element at n<=128.
    """
    out_n = n * factor
    m = np.zeros((out_n, n), np.float32)
    if out_n == 1 or n == 1:
        m[:, 0] = 1.0
        return m
    c = np.arange(out_n) * (n - 1) / (out_n - 1)
    i0 = np.floor(c).astype(np.int64)
    i1 = np.minimum(i0 + 1, n - 1)
    f = (c - i0).astype(np.float32)
    m[np.arange(out_n), i0] += 1.0 - f
    m[np.arange(out_n), i1] += f
    return m


def upsample_3d_align_corners(x, factor: int = 2):
    """Trilinear x2 upsample with align_corners=True semantics
    (reference SmoothUpsample, stylegan_3dconv_modules.py:118-125).
    x: [B, D, H, W, C]."""
    B, D, H, W, C = x.shape
    md = jnp.asarray(_upsample_matrix(D, factor))
    mh = jnp.asarray(_upsample_matrix(H, factor))
    mw = jnp.asarray(_upsample_matrix(W, factor))
    x = jnp.einsum("od,bdhwc->bohwc", md, x)
    x = jnp.einsum("oh,bdhwc->bdowc", mh, x)
    x = jnp.einsum("ow,bdhwc->bdhoc", mw, x)
    return x
