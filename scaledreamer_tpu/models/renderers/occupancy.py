"""Dense occupancy grid — TPU-native stand-in for nerfacc.OccGridEstimator.

Parity target: nerfacc `OccGridEstimator(roi_aabb, resolution=32)` +
`update_every_n_steps` (reference nerf_volume_renderer.py:60-67,430-444).

Instead of ragged sample streams pruned by a binary grid (CUDA-friendly,
XLA-hostile), the grid here is a [res³] float EMA of density evals that
(a) masks densities of samples landing in empty cells, and (b) reshapes the
per-ray sample CDF so a *fixed* number of samples concentrates in occupied
space — the dense-shape equivalent of empty-space skipping (SURVEY.md §7.1
"fixed shapes everywhere").

The grid lives in TrainState.extra (a pytree leaf), updated by a jitted
`update_occgrid` called by the trainer every `update_every_n_steps`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class OccGridState(NamedTuple):
    occs: jnp.ndarray       # [res**3] float EMA of max density*step
    resolution: jnp.ndarray  # scalar int (static in practice)
    radius: jnp.ndarray      # scalar float


def init_occgrid(resolution: int = 32, radius: float = 1.0) -> OccGridState:
    return OccGridState(
        occs=jnp.ones((resolution ** 3,), jnp.float32),  # start fully occupied
        resolution=jnp.asarray(resolution, jnp.int32),
        radius=jnp.asarray(radius, jnp.float32),
    )


def _cell_centers(resolution: int, radius: float) -> jnp.ndarray:
    lin = (jnp.arange(resolution, dtype=jnp.float32) + 0.5) / resolution
    g = jnp.stack(jnp.meshgrid(lin, lin, lin, indexing="ij"), axis=-1)
    return (g.reshape(-1, 3) * 2.0 - 1.0) * radius


def update_occgrid(state: OccGridState, density_fn, rng: jax.Array,
                   resolution: int, radius: float, render_step_size: float,
                   ema_decay: float = 0.95) -> OccGridState:
    """One nerfacc-style grid update: jittered cell-center density eval,
    EMA-max with decay (nerfacc semantics: occs = max(occs*decay, alpha))."""
    centers = _cell_centers(resolution, radius)
    jitter = (jax.random.uniform(rng, centers.shape) - 0.5) * (2 * radius / resolution)
    pts = centers + jitter
    sigma = density_fn(pts)[..., 0]  # [res^3]
    alpha = 1.0 - jnp.exp(-sigma * render_step_size)
    occs = jnp.maximum(state.occs * ema_decay, alpha)
    return state._replace(occs=occs)


def occgrid_binaries(state: OccGridState, occ_threshold: float = 0.01):
    """nerfacc binarization: threshold = min(mean(occs), occ_thre)."""
    thresh = jnp.minimum(jnp.mean(state.occs), occ_threshold)
    return (state.occs > thresh).astype(jnp.float32)


def query_occupancy(state: OccGridState, positions: jnp.ndarray,
                    resolution: int, radius: float,
                    occ_threshold: float = 0.01) -> jnp.ndarray:
    """Binary occupancy at world positions [..., 3] -> [...] in {0,1}.
    Out-of-bbox positions return 0."""
    binaries = occgrid_binaries(state, occ_threshold)
    u = (positions / radius + 1.0) / 2.0  # [0,1]
    inside = jnp.all((u >= 0.0) & (u < 1.0), axis=-1)
    cell = jnp.clip((u * resolution).astype(jnp.int32), 0, resolution - 1)
    idx = (cell[..., 0] * resolution + cell[..., 1]) * resolution + cell[..., 2]
    return jnp.where(inside, jnp.take(binaries, idx), 0.0)
