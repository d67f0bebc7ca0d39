"""Multi-resolution hash-grid positional encoding (tiny-cuda-nn equivalent).

TPU-native replacement for the CUDA `tcnn.Encoding` HashGrid used throughout
the reference (threestudio/models/networks.py:55-64,326-333; SURVEY.md §2.3
N1). Same algorithm family as InstantNGP (Müller et al. 2022):

- L levels with geometric resolution growth N_l = floor(N_0 * s^l),
- per level: 8-corner spatial hash -> feature gather -> trilinear interp,
- dense (collision-free) addressing for levels whose grid fits the table,
- concatenated [L * F] output.

Design notes for TPU:
- The table is a single [L, T, F] array so one jitted program handles all
  levels (static Python loop over L, unrolled by XLA; every gather is a
  batched `take` the TPU lowers to dynamic-gather).
- Gradients flow to the table via XLA's gather-transpose (scatter-add),
  which is deterministic on TPU — the reference's CUDA kernel is atomically
  non-deterministic, so this is a strict improvement.
- The progressive band mask (networks.py ProgressiveBandHashGrid) is a
  per-level scalar multiplier passed as a traced input -> no retrace during
  annealing.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Spatial-hash primes (Teschner et al., as in InstantNGP).
_PRIMES = (1, 2654435761, 805459861)


@dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.447269237440378
    n_input_dims: int = 3

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def n_output_dims(self) -> int:
        return self.n_levels * self.n_features_per_level

    def level_resolution(self, level: int) -> int:
        return int(np.floor(self.base_resolution * self.per_level_scale ** level))


def hashgrid_config_from_tcnn(cfg: dict, n_input_dims: int = 3) -> HashGridConfig:
    """Build from a tcnn-style json config dict (the YAML surface the
    reference exposes via `pos_encoding_config`)."""
    return HashGridConfig(
        n_levels=cfg.get("n_levels", 16),
        n_features_per_level=cfg.get("n_features_per_level", 2),
        log2_hashmap_size=cfg.get("log2_hashmap_size", 19),
        base_resolution=cfg.get("base_resolution", 16),
        per_level_scale=cfg.get("per_level_scale", 1.447269237440378),
        n_input_dims=n_input_dims,
    )


def init_hashgrid(key: jax.Array, cfg: HashGridConfig,
                  dtype=jnp.float32) -> jax.Array:
    """Table init U(-1e-4, 1e-4), matching tcnn's hashgrid initialization."""
    shape = (cfg.n_levels, cfg.table_size, cfg.n_features_per_level)
    return jax.random.uniform(key, shape, dtype=dtype, minval=-1e-4, maxval=1e-4)


def _corner_indices(grid_i: jnp.ndarray, res: int, table_size: int,
                    dense: bool) -> jnp.ndarray:
    """Indices of the 8 cell corners into the level table.

    grid_i: [..., 3] int32 lower-corner coords. Returns [..., 8] int32.
    """
    offsets = jnp.asarray(
        [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
        dtype=jnp.int32)  # [8, 3]
    corners = grid_i[..., None, :] + offsets  # [..., 8, 3]
    if dense:
        # collision-free: row-major index over an (res+1)^3 grid
        stride = res + 1
        idx = (corners[..., 0] * stride + corners[..., 1]) * stride + corners[..., 2]
    else:
        c = corners.astype(jnp.uint32)
        idx = (c[..., 0] * np.uint32(_PRIMES[0])
               ^ c[..., 1] * np.uint32(_PRIMES[1])
               ^ c[..., 2] * np.uint32(_PRIMES[2]))
        idx = (idx & np.uint32(table_size - 1)).astype(jnp.int32)
    return idx


def hashgrid_encode(table: jnp.ndarray, x: jnp.ndarray, cfg: HashGridConfig,
                    level_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Encode positions x in [0,1]^3 -> [..., L*F] features.

    table: [L, T, F]. level_mask: optional [L] multiplier (progressive bands).
    """
    orig_shape = x.shape[:-1]
    x = x.reshape(-1, cfg.n_input_dims)
    outs = []
    for level in range(cfg.n_levels):
        res = cfg.level_resolution(level)
        dense = (res + 1) ** 3 <= cfg.table_size
        pos = x * res  # tcnn convention: scale by res, cell [0, res)
        grid_f = jnp.floor(pos)
        w = pos - grid_f  # [N, 3] in [0,1)
        grid_i = jnp.clip(grid_f.astype(jnp.int32), 0, res)
        idx = _corner_indices(grid_i, res, cfg.table_size, dense)  # [N, 8]
        feats = jnp.take(table[level], idx, axis=0)  # [N, 8, F]
        # trilinear weights for the (i,j,k) corner enumeration order
        wx, wy, wz = w[..., 0:1], w[..., 1:2], w[..., 2:3]
        cw = jnp.stack([
            (1 - wx) * (1 - wy) * (1 - wz),
            (1 - wx) * (1 - wy) * wz,
            (1 - wx) * wy * (1 - wz),
            (1 - wx) * wy * wz,
            wx * (1 - wy) * (1 - wz),
            wx * (1 - wy) * wz,
            wx * wy * (1 - wz),
            wx * wy * wz,
        ], axis=-2)  # [N, 8, 1]
        out = jnp.sum(feats * cw, axis=-2)  # [N, F]
        if level_mask is not None:
            out = out * level_mask[level]
        outs.append(out)
    y = jnp.concatenate(outs, axis=-1)
    return y.reshape(*orig_shape, cfg.n_output_dims)


def progressive_level_mask(cfg: HashGridConfig, global_step: float,
                           start_level: int, start_step: int,
                           update_steps: int) -> np.ndarray:
    """Host-side progressive band mask (reference networks.py:131-167):
    `start_level` levels active at start_step, +1 level every update_steps."""
    n_active = start_level + max(
        0, (int(global_step) - start_step) // max(1, update_steps))
    mask = np.zeros(cfg.n_levels, dtype=np.float32)
    mask[: min(cfg.n_levels, max(0, n_active))] = 1.0
    return mask
