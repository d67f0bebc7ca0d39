"""Differentiable software rasterizer (nvdiffrast-equivalent, pure XLA).

The reference binds nvdiffrast (CUDA/OpenGL) for mesh-stage rendering and
texture baking (reference threestudio/utils/rasterize.py:7-78 —
`rasterize`, `interpolate`; SURVEY.md §2.3 N3). TPU-native replacement:

- brute-force coverage with a z-buffer, scanned over triangle chunks so the
  [pixels, chunk] working set stays bounded (VPU-friendly, fixed shapes),
- the winner search is discrete (stop-gradient), then barycentrics are
  RECOMPUTED differentiably for the winning triangle — the same gradient
  model as nvdiffrast's rasterize+interpolate (gradients flow to vertex
  positions through barycentric interpolation; no edge/antialias gradients),
- perspective-correct attribute interpolation via 1/w weighting.

Convention: clip-space verts (x, y, z, w) with NDC = xyz/w in [-1, 1];
pixel (0, 0) is the TOP-LEFT of the image and +y_ndc maps to INCREASING
row (matching this framework's camera/projection matrices — verified
against the volume renderers on an off-center object: the data layer's
projection negates y so world-up lands at NDC -y / image top).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class RasterOut(NamedTuple):
    tri_id: jnp.ndarray   # [H, W] int32, -1 = no coverage
    bary: jnp.ndarray     # [H, W, 3] perspective-correct, differentiable
    z: jnp.ndarray        # [H, W] NDC depth of the hit (1 where miss)
    mask: jnp.ndarray     # [H, W] bool coverage


def _screen_xy(v_clip: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """[V, 4] clip -> [V, 2] pixel coords (x right, y down)."""
    w = v_clip[:, 3:4]
    ndc = v_clip[:, :2] / jnp.where(jnp.abs(w) > 1e-12, w, 1e-12)
    x = (ndc[:, 0] * 0.5 + 0.5) * W
    y = (ndc[:, 1] * 0.5 + 0.5) * H
    return jnp.stack([x, y], axis=-1)


def _edge(a, b, p):
    """Signed area*2 of (a, b, p); a,b [C,2], p [P,1,2] -> [P,C]."""
    return ((b[:, 0] - a[:, 0]) * (p[..., 1] - a[:, 1])
            - (b[:, 1] - a[:, 1]) * (p[..., 0] - a[:, 0]))


def rasterize(v_clip: jnp.ndarray, faces: jnp.ndarray,
              face_valid: jnp.ndarray, H: int, W: int,
              chunk: int = 1024) -> RasterOut:
    """Rasterize triangles into an H x W buffer.

    v_clip [V, 4]; faces [F, 3] int32; face_valid [F] bool. F is padded to a
    multiple of `chunk` internally. Differentiable through `bary` and `z`
    for the winning triangle (winner selection itself is stop-gradient).
    """
    F = faces.shape[0]
    n_chunks = max(1, -(-F // chunk))
    pad = n_chunks * chunk - F
    if pad:
        faces = jnp.concatenate(
            [faces, jnp.zeros((pad, 3), faces.dtype)], axis=0)
        face_valid = jnp.concatenate(
            [face_valid, jnp.zeros((pad,), bool)], axis=0)

    P = H * W
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5)
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5)
    px = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"),
                   axis=-1).reshape(P, 1, 2)  # [P, 1, 2]

    sxy = jax.lax.stop_gradient(_screen_xy(v_clip, H, W))       # [V, 2]
    wv = jax.lax.stop_gradient(v_clip[:, 3])
    zv = jax.lax.stop_gradient(
        v_clip[:, 2] / jnp.where(jnp.abs(v_clip[:, 3]) > 1e-12,
                                 v_clip[:, 3], 1e-12))

    faces_c = faces.reshape(n_chunks, chunk, 3)
    valid_c = face_valid.reshape(n_chunks, chunk)

    def body(carry, xs_c):
        best_z, best_tri = carry
        fch, vch, base = xs_c
        ids = fch.reshape(-1)
        a = jnp.take(sxy, fch[:, 0], axis=0)   # [C, 2]
        b = jnp.take(sxy, fch[:, 1], axis=0)
        c = jnp.take(sxy, fch[:, 2], axis=0)
        za = jnp.take(zv, fch[:, 0])
        zb = jnp.take(zv, fch[:, 1])
        zc = jnp.take(zv, fch[:, 2])
        wa = jnp.take(wv, fch[:, 0])
        wb = jnp.take(wv, fch[:, 1])
        wc = jnp.take(wv, fch[:, 2])

        area = ((b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
                - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0]))    # [C]
        w0 = _edge(b, c, px)   # [P, C]
        w1 = _edge(c, a, px)
        w2 = _edge(a, b, px)
        same = jnp.sign(area)[None, :]
        inside = ((w0 * same >= 0) & (w1 * same >= 0) & (w2 * same >= 0)
                  & (jnp.abs(area)[None, :] > 1e-12)
                  & vch[None, :]
                  & (wa > 1e-9)[None, :] & (wb > 1e-9)[None, :]
                  & (wc > 1e-9)[None, :])
        inv_area = 1.0 / jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
        b0 = w0 * inv_area[None, :]
        b1 = w1 * inv_area[None, :]
        b2 = w2 * inv_area[None, :]
        zint = b0 * za[None, :] + b1 * zb[None, :] + b2 * zc[None, :]
        zint = jnp.where(inside & (zint > -1.0) & (zint < 1.0), zint,
                         jnp.inf)
        ci = jnp.argmin(zint, axis=1)                       # [P]
        cz = jnp.take_along_axis(zint, ci[:, None], axis=1)[:, 0]
        better = cz < best_z
        best_z = jnp.where(better, cz, best_z)
        best_tri = jnp.where(better, base * chunk + ci, best_tri)
        return (best_z, best_tri), None

    init = (jnp.full((P,), jnp.inf), jnp.full((P,), -1, jnp.int32))
    (best_z, best_tri), _ = jax.lax.scan(
        body, init, (faces_c, valid_c, jnp.arange(n_chunks)))

    mask = best_tri >= 0
    tri = jnp.maximum(best_tri, 0)

    # differentiable barycentrics for the winner
    f = jnp.take(faces, tri, axis=0)                        # [P, 3]
    va = jnp.take(v_clip, f[:, 0], axis=0)                  # [P, 4]
    vb = jnp.take(v_clip, f[:, 1], axis=0)
    vc = jnp.take(v_clip, f[:, 2], axis=0)

    def sxy_d(v):
        w = jnp.where(jnp.abs(v[:, 3]) > 1e-12, v[:, 3], 1e-12)
        return jnp.stack([(v[:, 0] / w * 0.5 + 0.5) * W,
                          (v[:, 1] / w * 0.5 + 0.5) * H], axis=-1)

    pa, pb, pc = sxy_d(va), sxy_d(vb), sxy_d(vc)            # [P, 2]
    p = px.reshape(P, 2)

    def edge_d(e0, e1, q):
        return ((e1[:, 0] - e0[:, 0]) * (q[:, 1] - e0[:, 1])
                - (e1[:, 1] - e0[:, 1]) * (q[:, 0] - e0[:, 0]))

    area = edge_d(pa, pb, pc)
    inv_area = 1.0 / jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
    b0 = edge_d(pb, pc, p) * inv_area
    b1 = edge_d(pc, pa, p) * inv_area
    b2 = edge_d(pa, pb, p) * inv_area
    # perspective correction: weight by 1/w_clip
    iw = jnp.stack([b0 / jnp.maximum(va[:, 3], 1e-9),
                    b1 / jnp.maximum(vb[:, 3], 1e-9),
                    b2 / jnp.maximum(vc[:, 3], 1e-9)], axis=-1)
    bary = iw / jnp.maximum(jnp.sum(iw, axis=-1, keepdims=True), 1e-12)
    bary = bary * mask[:, None].astype(bary.dtype)

    zhit = (bary[:, 0] * va[:, 2] / jnp.maximum(va[:, 3], 1e-9)
            + bary[:, 1] * vb[:, 2] / jnp.maximum(vb[:, 3], 1e-9)
            + bary[:, 2] * vc[:, 2] / jnp.maximum(vc[:, 3], 1e-9))
    zhit = jnp.where(mask, zhit, 1.0)

    return RasterOut(tri_id=best_tri.reshape(H, W),
                     bary=bary.reshape(H, W, 3),
                     z=zhit.reshape(H, W),
                     mask=mask.reshape(H, W))


def interpolate(attr: jnp.ndarray, rast: RasterOut,
                faces: jnp.ndarray) -> jnp.ndarray:
    """Interpolate per-vertex attributes at covered pixels.

    attr [V, C] -> [H, W, C] (zeros where miss) — reference
    rasterize.py interpolate (dr.interpolate)."""
    H, W = rast.tri_id.shape
    tri = jnp.maximum(rast.tri_id.reshape(-1), 0)
    f = jnp.take(faces, tri, axis=0)                        # [P, 3]
    a = jnp.take(attr, f[:, 0], axis=0)
    b = jnp.take(attr, f[:, 1], axis=0)
    c = jnp.take(attr, f[:, 2], axis=0)
    bar = rast.bary.reshape(-1, 3)
    out = (bar[:, :1] * a + bar[:, 1:2] * b + bar[:, 2:3] * c)
    out = out * rast.mask.reshape(-1, 1).astype(out.dtype)
    return out.reshape(H, W, -1)
