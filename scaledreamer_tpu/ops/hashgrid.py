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
    # "Linear" = trilinear over 8 cell corners (tcnn default, reference
    # parity); "Simplex" = barycentric over the 4 vertices of the Kuhn
    # tetrahedron containing the point — HALF the table gathers per lookup
    # (the dominant TPU cost, ~7 ns/row measured), same continuity class
    # (C0, piecewise-linear instead of -trilinear). TPU-first extension of
    # tcnn's interpolation option surface.
    interpolation: str = "Linear"
    # When False, the custom VJPs return ZERO gradients w.r.t. the query
    # positions x and skip the table re-gathers + second-derivative terms
    # that only feed them (~30% of backward gather traffic). Every query
    # path in this framework provably never differentiates w.r.t. x: ray
    # sample positions are functions of non-differentiated ray inputs and
    # stop-gradient t-values (ops/render.py importance_sampling), and
    # isosurface grid vertices are constants (spatial derivatives for
    # normals/eikonal come from the FORWARD `with_grad` outputs, not the
    # VJP). Keep True if x ever carries gradients.
    compute_x_grad: bool = True
    # Dense-level cell packing: for levels whose dense grid fits the table,
    # repack the level into [stride^3, 8F] rows holding ALL 8 corner
    # features of each cell (built from the canonical table with pure
    # shifted slices — zero gathers), so every lookup costs ONE gathered
    # row instead of 8 (gather cost is per ROW, width-independent —
    # measured). Numerically identical to unpacked for x in [0, 1);
    # at exactly x = 1.0 packed clamps to the last cell (more correct than
    # the unpacked path's out-of-region read).
    dense_cell_packing: bool = False
    # Packing cutoff: above this many dense cells the backward's
    # matrix-valued scatter (cost grows with num_segments, ~0.3 us/segment
    # measured) loses to the unpacked simplex scalar scatter (~7 ns/row),
    # so big dense levels stay on the scan path. 150k keeps res<=48 packed
    # and unpacks res=70 at the default 2^19 table (measured -50 ms/step).
    packing_max_entries: int = 150_000

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
        interpolation=cfg.get("interpolation", "Linear"),
        # framework default: geometry/background query positions never carry
        # gradients (see HashGridConfig.compute_x_grad)
        compute_x_grad=cfg.get("compute_x_grad", False),
        dense_cell_packing=cfg.get("dense_cell_packing", False),
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


_CORNER_OFFSETS = [(i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)]


def _level_constants(cfg: HashGridConfig):
    """Per-level (resolution, dense?) as host arrays."""
    res = np.asarray([cfg.level_resolution(l) for l in range(cfg.n_levels)],
                     np.int32)
    dense = np.asarray([(int(r) + 1) ** 3 <= cfg.table_size for r in res],
                       bool)
    return res, dense


def _packed_level_list(cfg: HashGridConfig):
    """Levels that use the cell-packed layout: dense AND small enough that
    the packed backward's matrix scatter beats the scan path (see
    packing_max_entries)."""
    if not cfg.dense_cell_packing:
        return []
    res, dense = _level_constants(cfg)
    return [l for l in range(cfg.n_levels)
            if dense[l] and (int(res[l]) + 1) ** 3 <= cfg.packing_max_entries]


def _corner_weight_1d(w, corner):
    """Trilinear weight of one corner as a 1-D [N] array."""
    dx, dy, dz = corner
    ax = w[:, 0] if dx else 1.0 - w[:, 0]
    ay = w[:, 1] if dy else 1.0 - w[:, 1]
    az = w[:, 2] if dz else 1.0 - w[:, 2]
    return ax * ay * az


def _corner_index_1d(grid_i, corner, res, dense_flag, table_size: int):
    """Table row index of one corner, 1-D [N] int32 (dense or hash).

    All-1-D design note: TPU tiles buffers (8, 128); any materialized
    [N, small] tensor pads 16-64x. Keeping every per-corner quantity 1-D
    keeps the whole encode/backward unpadded (see memory
    tpu-tiling-padding-pitfall)."""
    dx, dy, dz = corner
    cx = grid_i[:, 0] + dx
    cy = grid_i[:, 1] + dy
    cz = grid_i[:, 2] + dz
    stride = res + 1
    dense_idx = (cx * stride + cy) * stride + cz
    cu = (cx.astype(jnp.uint32), cy.astype(jnp.uint32),
          cz.astype(jnp.uint32))
    hash_idx = (cu[0] * np.uint32(_PRIMES[0])
                ^ cu[1] * np.uint32(_PRIMES[1])
                ^ cu[2] * np.uint32(_PRIMES[2]))
    hash_idx = (hash_idx & np.uint32(table_size - 1)).astype(jnp.int32)
    return jnp.where(dense_flag, dense_idx, hash_idx)


def _corner_weights(w):
    """[N, 3] fractional coords -> [N, 8] trilinear weights, (i,j,k) order."""
    wx, wy, wz = w[..., 0:1], w[..., 1:2], w[..., 2:3]
    return jnp.concatenate([
        (1 - wx) * (1 - wy) * (1 - wz),
        (1 - wx) * (1 - wy) * wz,
        (1 - wx) * wy * (1 - wz),
        (1 - wx) * wy * wz,
        wx * (1 - wy) * (1 - wz),
        wx * (1 - wy) * wz,
        wx * wy * (1 - wz),
        wx * wy * wz,
    ], axis=-1)  # [N, 8]


def _offset_index_1d(grid_i, off, res, dense_flag, table_size: int):
    """Table row index for per-point integer corner offsets [N, 3]."""
    cx = grid_i[:, 0] + off[:, 0]
    cy = grid_i[:, 1] + off[:, 1]
    cz = grid_i[:, 2] + off[:, 2]
    stride = res + 1
    dense_idx = (cx * stride + cy) * stride + cz
    cu = (cx.astype(jnp.uint32), cy.astype(jnp.uint32),
          cz.astype(jnp.uint32))
    hash_idx = (cu[0] * np.uint32(_PRIMES[0])
                ^ cu[1] * np.uint32(_PRIMES[1])
                ^ cu[2] * np.uint32(_PRIMES[2]))
    hash_idx = (hash_idx & np.uint32(table_size - 1)).astype(jnp.int32)
    return jnp.where(dense_flag, dense_idx, hash_idx)


def _simplex_parts(w):
    """Kuhn-simplex decomposition of the unit cell at fractional coords w.

    w [N, 3] -> (offsets: list of 4 [N, 3] int32 corner offsets,
    lambdas: list of 4 [N] barycentric weights, onehots: list of 3 [N, 3]
    rank-indicator vectors oh_j with oh_j[n, a] = 1 iff axis a has the j-th
    largest fractional coordinate). The interpolant is continuous across
    cell and simplex boundaries (standard simplex/tetrahedral interpolation;
    4 table rows per lookup instead of trilinear's 8).
    """
    # descending ranks via 6 comparisons (beats an argsort kernel per
    # level; the <=/< asymmetry makes ranks a permutation even under ties,
    # matching stable argsort's first-index-wins)
    a, b, c = w[:, 0], w[:, 1], w[:, 2]
    r0 = (a < b).astype(jnp.int32) + (a < c).astype(jnp.int32)
    r1 = (b <= a).astype(jnp.int32) + (b < c).astype(jnp.int32)
    r2 = (c <= a).astype(jnp.int32) + (c <= b).astype(jnp.int32)
    ranks = jnp.stack([r0, r1, r2], axis=-1)        # [N, 3]
    oh1 = (ranks == 0).astype(w.dtype)
    oh2 = (ranks == 1).astype(w.dtype)
    oh3 = (ranks == 2).astype(w.dtype)
    u1 = jnp.sum(w * oh1, axis=-1)
    u2 = jnp.sum(w * oh2, axis=-1)
    u3 = jnp.sum(w * oh3, axis=-1)
    offs = [jnp.zeros_like(oh1, jnp.int32),
            oh1.astype(jnp.int32),
            (oh1 + oh2).astype(jnp.int32),
            jnp.ones_like(oh1, jnp.int32)]
    lams = [1.0 - u1, u1 - u2, u2 - u3, u3]
    return offs, lams, [oh1, oh2, oh3]


def _cell_offsets_flat(res: int):
    stride = res + 1
    return [(dx * stride + dy) * stride + dz
            for (dx, dy, dz) in _CORNER_OFFSETS]


def _pack_dense_level(tab_l, res: int, F: int):
    """Canonical dense level [T, F] -> cell-packed [stride^3, 8, F].

    packed[cell, k] = tab[cell + flat_offset_k]: 8 shifted SLICES of the
    dense region — no gathers. Cost: one sweep over the level (<25 MB for
    the finest packable level), amortized over millions of lookups."""
    stride = res + 1
    Tc = stride ** 3
    offs = _cell_offsets_flat(res)
    region = jnp.pad(tab_l[:Tc], ((0, offs[-1]), (0, 0)))
    return jnp.stack(
        [jax.lax.slice_in_dim(region, o, o + Tc, axis=0) for o in offs],
        axis=1)  # [Tc, 8, F]


def _unpack_dense_grad(packed_grad, res: int, F: int, T: int):
    """[Tc, 8, F] packed cotangents -> [T, F] canonical table grads
    (the transpose of _pack_dense_level: shifted slice-adds)."""
    stride = res + 1
    Tc = stride ** 3
    offs = _cell_offsets_flat(res)
    out = jnp.zeros((T + offs[-1], F), packed_grad.dtype)
    for k, o in enumerate(offs):
        out = out.at[o:o + Tc].add(packed_grad[:, k])
    return out[:T]


def _cell_and_w(x, res: int):
    """Cell base index [N] + fractional coords [N, 3] for cell packing
    (base clamped to res-1 so every lookup is one in-region row)."""
    stride = res + 1
    pos = x * res
    base = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, res - 1)
    w = jnp.clip(pos - base.astype(jnp.float32), 0.0, 1.0)
    cell = (base[:, 0] * stride + base[:, 1]) * stride + base[:, 2]
    return cell, w


def _packed_corner_weights(w, cfg: HashGridConfig):
    """[N, 8] weights over the packed corner slots for either
    interpolation (simplex scatters its 4 barycentric weights onto the
    corresponding corner slots)."""
    if cfg.interpolation == "Simplex":
        offs, lams, _ = _simplex_parts(w)
        cw = 0.0
        for o, lam in zip(offs, lams):
            slot = o[:, 0] * 4 + o[:, 1] * 2 + o[:, 2]
            cw = cw + lam[:, None] * jax.nn.one_hot(slot, 8, dtype=w.dtype)
        return cw
    return _corner_weights(w)


def _level_lookup(table_l, x, level: int, cfg: HashGridConfig):
    """One level's (idx [N, 8], weights [N, 8], feats-interp [N, F])."""
    res = cfg.level_resolution(level)
    dense = (res + 1) ** 3 <= cfg.table_size
    pos = x * res
    grid_f = jnp.floor(pos)
    w = pos - grid_f
    grid_i = jnp.clip(grid_f.astype(jnp.int32), 0, res)
    idx = _corner_indices(grid_i, res, cfg.table_size, dense)  # [N, 8]
    cw = _corner_weights(w)  # [N, 8]
    feats = jnp.take(table_l, idx, axis=0)  # [N, 8, F]
    out = jnp.einsum("ncf,nc->nf", feats, cw)
    return idx, cw, out


def _encode_impl(table, x, cfg: HashGridConfig, level_mask):
    """Forward encode: unrolled levels, 2-D row-gather (fastest measured
    layout on TPU). Per-corner indices are built from 1-D arithmetic (no
    [N, 8, 3] corner tensor — see tpu-tiling-padding-pitfall). table
    [L, T, F]; x [N, 3] in [0,1] -> [N, L*F]."""
    T = cfg.table_size
    simplex = cfg.interpolation == "Simplex"
    res_np, dense_np = _level_constants(cfg)
    packed_set = set(_packed_level_list(cfg))
    outs = []
    for level in range(cfg.n_levels):
        res_l = int(res_np[level])
        dense = bool(dense_np[level])
        if level in packed_set:
            # ONE gathered row per point: packed [Tc, 8F] built by slicing
            F = cfg.n_features_per_level
            packed = _pack_dense_level(table[level], res_l, F)
            cell, w = _cell_and_w(x, res_l)
            feats = jnp.take(packed.reshape(-1, 8 * F), cell,
                             axis=0).reshape(-1, 8, F)
            cw = _packed_corner_weights(w, cfg)
            out = jnp.einsum("ncf,nc->nf", feats, cw)
            if level_mask is not None:
                out = out * level_mask[level]
            outs.append(out)
            continue
        pos = x * res_l
        grid_f = jnp.floor(pos)
        w = pos - grid_f
        grid_i = jnp.clip(grid_f.astype(jnp.int32), 0, res_l)
        if simplex:
            offs, lams, _ = _simplex_parts(w)
            idx = jnp.stack([
                _offset_index_1d(grid_i, o, res_l, dense, T)
                for o in offs], axis=-1)               # [N, 4]
            cw = jnp.stack(lams, axis=-1)              # [N, 4]
        else:
            idx = jnp.stack([
                _corner_index_1d(grid_i, corner, res_l, dense, T)
                for corner in _CORNER_OFFSETS], axis=-1)  # [N, 8]
            cw = _corner_weights(w)                        # [N, 8]
        feats = jnp.take(table[level], idx, axis=0)    # [N, C, F]
        out = jnp.einsum("ncf,nc->nf", feats, cw)
        if level_mask is not None:
            out = out * level_mask[level]
        outs.append(out)
    return jnp.concatenate(outs, axis=-1)


def _encode_fwd(table, x, cfg, level_mask):
    return _encode_impl(table, x, cfg, level_mask), (table, x, level_mask)


def _encode_bwd(cfg, res_saved, g):
    """Custom backward, all-1-D + level-scanned:
    - table grads via segment_sum over flat (row*F + f) indices (measured
      2.4x faster than XLA scatter-add on TPU),
    - point grads via the analytic trilinear derivative.
    Residuals are just (table, x, mask) — nothing padded survives."""
    table, x, level_mask = res_saved
    N = x.shape[0]
    F = cfg.n_features_per_level
    T = cfg.table_size
    res_np, dense_np = _level_constants(cfg)
    mask_arr = (jnp.asarray(level_mask, jnp.float32) if level_mask is not None
                else jnp.ones((cfg.n_levels,), jnp.float32))
    tab_flat = table.reshape(cfg.n_levels, T * F)
    g_by_level = g.T.reshape(cfg.n_levels, F, N)  # [L, F, N]

    simplex = cfg.interpolation == "Simplex"

    def level_body(_, xs):
        tab_l, g_l, res, dense_flag, m = xs
        pos = x * res.astype(jnp.float32)
        grid_f = jnp.floor(pos)
        w = pos - grid_f
        grid_i = jnp.clip(grid_f.astype(jnp.int32), 0, res)
        gm = [g_l[f] * m for f in range(F)]  # [N] each
        gx = jnp.zeros((N,), jnp.float32)
        gy = jnp.zeros((N,), jnp.float32)
        gz = jnp.zeros((N,), jnp.float32)
        # Batched table gradient: ONE flat-key segment_sum per level over
        # all (corner, feature) contributions — 1 scatter launch instead of
        # 8*F (the sorted-scatter launches dominate the backward; trace-
        # profiled). All operands stay 1-D (no lane padding).
        keys, vals = [], []
        if simplex:
            offs, lams, ohs = _simplex_parts(w)
            fbar = []  # per-corner sum_f feat*g (for x-grads)
            for ci in range(4):
                idx = _offset_index_1d(grid_i, offs[ci], res, dense_flag, T)
                base = idx * F
                fb = jnp.zeros((N,), jnp.float32)
                for f in range(F):
                    keys.append(base + f)
                    vals.append(lams[ci] * gm[f])
                    if cfg.compute_x_grad:
                        fb = fb + jnp.take(tab_l, base + f) * gm[f]
                fbar.append(fb)
            if cfg.compute_x_grad:
                # d enc/d w_{p_j} = f_j - f_{j-1} (piecewise linear)
                for j, oh in enumerate(ohs, start=1):
                    d = fbar[j] - fbar[j - 1]
                    gx = gx + oh[:, 0] * d
                    gy = gy + oh[:, 1] * d
                    gz = gz + oh[:, 2] * d
        else:
            for corner in _CORNER_OFFSETS:
                dx, dy, dz = corner
                ax = w[:, 0] if dx else 1.0 - w[:, 0]
                ay = w[:, 1] if dy else 1.0 - w[:, 1]
                az = w[:, 2] if dz else 1.0 - w[:, 2]
                cw = ax * ay * az
                idx = _corner_index_1d(grid_i, corner, res, dense_flag, T)
                base = idx * F
                fg = jnp.zeros((N,), jnp.float32)
                for f in range(F):
                    keys.append(base + f)
                    vals.append(cw * gm[f])
                    if cfg.compute_x_grad:
                        feat = jnp.take(tab_l, base + f)
                        fg = fg + feat * gm[f]
                if cfg.compute_x_grad:
                    sx, sy, sz = (1.0 if dx else -1.0, 1.0 if dy else -1.0,
                                  1.0 if dz else -1.0)
                    gx = gx + fg * sx * (ay * az)
                    gy = gy + fg * sy * (ax * az)
                    gz = gz + fg * sz * (ax * ay)
        tg = jax.ops.segment_sum(jnp.concatenate(vals),
                                 jnp.concatenate(keys),
                                 num_segments=T * F)
        scale = res.astype(jnp.float32)
        return None, (tg, jnp.stack([gx, gy, gz]) * scale)

    packed_levels = _packed_level_list(cfg)
    scan_levels = [l for l in range(cfg.n_levels) if l not in packed_levels]

    if scan_levels:
        sel = np.asarray(scan_levels)
        _, (tgs, xg) = jax.lax.scan(
            level_body, None,
            (tab_flat[sel], g_by_level[sel], jnp.asarray(res_np[sel]),
             jnp.asarray(dense_np[sel]), mask_arr[jnp.asarray(sel)]))
        x_grad = jnp.sum(xg, axis=0).T  # [Ls, 3, N] -> [N, 3]
    else:
        tgs = jnp.zeros((0, T * F), jnp.float32)
        x_grad = jnp.zeros((N, 3), jnp.float32)

    level_grads = {l: tgs[i] for i, l in enumerate(scan_levels)}
    for l in packed_levels:
        # cell-packed dense level: segment_sum into packed rows by cell id,
        # then unshift back to the canonical layout (pure slice-adds)
        res_l = int(res_np[l])
        Tc = (res_l + 1) ** 3
        cell, w = _cell_and_w(x, res_l)
        cw = _packed_corner_weights(w, cfg)                 # [N, 8]
        m = mask_arr[l]
        # matrix-valued scatter: ONE segment row of 8F lanes per point
        # instead of 8F scalar rows (sorted-scatter cost is per ROW —
        # measured 117 -> 35..114 ms/level on v5e)
        gT = (g_by_level[l] * m).T                          # [N, F]
        data = (cw[:, :, None] * gT[:, None, :]).reshape(N, 8 * F)
        packed_grad = jax.ops.segment_sum(
            data, cell, num_segments=Tc).reshape(Tc, 8, F)
        level_grads[l] = _unpack_dense_grad(
            packed_grad, res_l, F, T).reshape(T * F)
        if cfg.compute_x_grad:
            F8 = 8 * F
            packed = _pack_dense_level(table[l], res_l, F)
            feats = jnp.take(packed.reshape(-1, F8), cell,
                             axis=0).reshape(N, 8, F)
            gl = g_by_level[l] * m                           # [F, N]
            fbar8 = jnp.einsum("nkf,fn->nk", feats, gl)      # [N, 8]
            dxw, dyw, dzw = _packed_weight_derivs(w, cfg)    # [N, 8] each
            scale = float(res_l)
            x_grad = x_grad + scale * jnp.stack([
                jnp.sum(fbar8 * dxw, -1), jnp.sum(fbar8 * dyw, -1),
                jnp.sum(fbar8 * dzw, -1)], axis=-1)

    table_grad = jnp.stack(
        [level_grads[l] for l in range(cfg.n_levels)]).reshape(
        cfg.n_levels, T, F)
    return table_grad, x_grad, None


def _packed_weight_derivs(w, cfg: HashGridConfig):
    """d(packed corner weights)/d(w_axis), each [N, 8]."""
    if cfg.interpolation == "Simplex":
        offs, _, ohs = _simplex_parts(w)
        slots = [o[:, 0] * 4 + o[:, 1] * 2 + o[:, 2] for o in offs]
        onehots = [jax.nn.one_hot(s, 8, dtype=w.dtype) for s in slots]
        outs = []
        for axis in range(3):
            d = 0.0
            # d lam_j/d w_{p_k}: lam profile (1-u1, u1-u2, u2-u3, u3)
            for k in range(3):
                sel = ohs[k][:, axis:axis + 1]  # axis has rank k+1?
                d = d + sel * (onehots[k + 1] - onehots[k])
            outs.append(d)
        return outs
    wx, wy, wz = w[:, 0:1], w[:, 1:2], w[:, 2:3]
    ax = jnp.concatenate([-(1 - wy) * (1 - wz), -(1 - wy) * wz,
                          -wy * (1 - wz), -wy * wz,
                          (1 - wy) * (1 - wz), (1 - wy) * wz,
                          wy * (1 - wz), wy * wz], axis=-1)
    ay = jnp.concatenate([-(1 - wx) * (1 - wz), -(1 - wx) * wz,
                          (1 - wx) * (1 - wz), (1 - wx) * wz,
                          -wx * (1 - wz), -wx * wz,
                          wx * (1 - wz), wx * wz], axis=-1)
    az = jnp.concatenate([-(1 - wx) * (1 - wy), (1 - wx) * (1 - wy),
                          -(1 - wx) * wy, (1 - wx) * wy,
                          -wx * (1 - wy), wx * (1 - wy),
                          -wx * wy, wx * wy], axis=-1)
    return ax, ay, az


def _packed_weight_second_derivs(w, cfg: HashGridConfig):
    """Cross second derivatives d^2(corner weight)/(dw_i dw_j), [N, 8]
    each, pairs (xy, xz, yz). Zero for Simplex (piecewise linear)."""
    if cfg.interpolation == "Simplex":
        z = jnp.zeros((w.shape[0], 8), w.dtype)
        return z, z, z
    wx, wy, wz = w[:, 0:1], w[:, 1:2], w[:, 2:3]

    def parts(corner):
        dx, dy, dz = corner
        sx = 1.0 if dx else -1.0
        sy = 1.0 if dy else -1.0
        sz = 1.0 if dz else -1.0
        ax = wx if dx else 1.0 - wx
        ay = wy if dy else 1.0 - wy
        az = wz if dz else 1.0 - wz
        return (sx * sy * az, sx * sz * ay, sy * sz * ax)

    cols = [parts(c) for c in _CORNER_OFFSETS]
    dxy = jnp.concatenate([c[0] for c in cols], axis=-1)
    dxz = jnp.concatenate([c[1] for c in cols], axis=-1)
    dyz = jnp.concatenate([c[2] for c in cols], axis=-1)
    return dxy, dxz, dyz


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(2,))
def _hashgrid_encode_flat(table, x, cfg, level_mask):
    return _encode_impl(table, x, cfg, level_mask)


_hashgrid_encode_flat.defvjp(_encode_fwd, _encode_bwd)


def hashgrid_encode(table: jnp.ndarray, x: jnp.ndarray, cfg: HashGridConfig,
                    level_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Encode positions x in [0,1]^3 -> [..., L*F] features.

    table: [L, T, F]. level_mask: optional [L] multiplier (progressive bands).
    Custom VJP: segment-sum table gradients + analytic point gradients.
    """
    orig_shape = x.shape[:-1]
    x = x.reshape(-1, cfg.n_input_dims)
    y = _hashgrid_encode_flat(table, x, cfg, level_mask)
    return y.reshape(*orig_shape, cfg.n_output_dims)


# ---------------------------------------------------------------------------
# Fused encode + spatial gradient: ONE gather serves both the features and
# d(features)/d(x). Used by the `analytic` normal paths so normals add no
# extra table gathers (gathers are the TPU bottleneck at ~23 ns/row).
# ---------------------------------------------------------------------------


def _axis_weight_parts(w, corner):
    """Per-axis (value, sign) pairs for one corner's trilinear weight."""
    dx, dy, dz = corner
    ax = w[:, 0] if dx else 1.0 - w[:, 0]
    ay = w[:, 1] if dy else 1.0 - w[:, 1]
    az = w[:, 2] if dz else 1.0 - w[:, 2]
    sx = 1.0 if dx else -1.0
    sy = 1.0 if dy else -1.0
    sz = 1.0 if dz else -1.0
    return (ax, ay, az), (sx, sy, sz)


def _encode_with_grad_impl(table, x, cfg: HashGridConfig, level_mask):
    """-> (enc [N, L*F], denc ([N, L*F],)*3 — d enc / d x per axis)."""
    T = cfg.table_size
    simplex = cfg.interpolation == "Simplex"
    res_np, dense_np = _level_constants(cfg)
    packed_set = set(_packed_level_list(cfg))
    outs, gx_outs, gy_outs, gz_outs = [], [], [], []
    for level in range(cfg.n_levels):
        res_l = int(res_np[level])
        dense = bool(dense_np[level])
        if level in packed_set:
            F = cfg.n_features_per_level
            packed = _pack_dense_level(table[level], res_l, F)
            cell, w = _cell_and_w(x, res_l)
            feats = jnp.take(packed.reshape(-1, 8 * F), cell,
                             axis=0).reshape(-1, 8, F)
            cw = _packed_corner_weights(w, cfg)
            dxw, dyw, dzw = _packed_weight_derivs(w, cfg)
            out = jnp.einsum("ncf,nc->nf", feats, cw)
            gx = jnp.einsum("ncf,nc->nf", feats, dxw) * res_l
            gy = jnp.einsum("ncf,nc->nf", feats, dyw) * res_l
            gz = jnp.einsum("ncf,nc->nf", feats, dzw) * res_l
            if level_mask is not None:
                m = level_mask[level]
                out, gx, gy, gz = out * m, gx * m, gy * m, gz * m
            outs.append(out)
            gx_outs.append(gx)
            gy_outs.append(gy)
            gz_outs.append(gz)
            continue
        pos = x * res_l
        grid_f = jnp.floor(pos)
        w = pos - grid_f
        grid_i = jnp.clip(grid_f.astype(jnp.int32), 0, res_l)
        if simplex:
            offs, lams, ohs = _simplex_parts(w)
            idx = jnp.stack([
                _offset_index_1d(grid_i, o, res_l, dense, T)
                for o in offs], axis=-1)                  # [N, 4]
            feats = jnp.take(table[level], idx, axis=0)   # [N, 4, F]
            cw = jnp.stack(lams, axis=-1)
            out = jnp.einsum("ncf,nc->nf", feats, cw)
            # d enc/d w_{p_j} = f_j - f_{j-1}; map ranks back to axes
            diffs = [feats[:, j] - feats[:, j - 1] for j in (1, 2, 3)]
            gx = sum(oh[:, 0:1] * d for oh, d in zip(ohs, diffs)) * res_l
            gy = sum(oh[:, 1:2] * d for oh, d in zip(ohs, diffs)) * res_l
            gz = sum(oh[:, 2:3] * d for oh, d in zip(ohs, diffs)) * res_l
        else:
            idx = jnp.stack([
                _corner_index_1d(grid_i, c, res_l, dense, T)
                for c in _CORNER_OFFSETS], axis=-1)          # [N, 8]
            feats = jnp.take(table[level], idx, axis=0)       # [N, 8, F]
            cws, dxs, dys, dzs = [], [], [], []
            for c in _CORNER_OFFSETS:
                (ax, ay, az), (sx, sy, sz) = _axis_weight_parts(w, c)
                cws.append(ax * ay * az)
                dxs.append(sx * ay * az)
                dys.append(sy * ax * az)
                dzs.append(sz * ax * ay)
            cw = jnp.stack(cws, axis=-1)   # [N, 8]
            out = jnp.einsum("ncf,nc->nf", feats, cw)
            gx = jnp.einsum("ncf,nc->nf", feats, jnp.stack(dxs, -1)) * res_l
            gy = jnp.einsum("ncf,nc->nf", feats, jnp.stack(dys, -1)) * res_l
            gz = jnp.einsum("ncf,nc->nf", feats, jnp.stack(dzs, -1)) * res_l
        if level_mask is not None:
            m = level_mask[level]
            out, gx, gy, gz = out * m, gx * m, gy * m, gz * m
        outs.append(out)
        gx_outs.append(gx)
        gy_outs.append(gy)
        gz_outs.append(gz)
    return (jnp.concatenate(outs, -1), jnp.concatenate(gx_outs, -1),
            jnp.concatenate(gy_outs, -1), jnp.concatenate(gz_outs, -1))


def _ewg_fwd(table, x, cfg, level_mask):
    return _encode_with_grad_impl(table, x, cfg, level_mask), \
        (table, x, level_mask)


def _ewg_bwd(cfg, res_saved, gs):
    """Backward of (enc, denc_x, denc_y, denc_z).

    Trilinear is multilinear: d²w/dx_i² = 0; the cross second derivatives
    d²w/(dx_i dx_j) = s_i s_j a_k (k the remaining axis). All-1-D,
    level-scanned, segment-sum table grads (same design notes as
    _encode_bwd)."""
    table, x, level_mask = res_saved
    g_enc, g_gx, g_gy, g_gz = gs
    N = x.shape[0]
    F = cfg.n_features_per_level
    T = cfg.table_size
    res_np, dense_np = _level_constants(cfg)
    mask_arr = (jnp.asarray(level_mask, jnp.float32) if level_mask is not None
                else jnp.ones((cfg.n_levels,), jnp.float32))
    tab_flat = table.reshape(cfg.n_levels, T * F)

    def per_level(g):
        return g.T.reshape(cfg.n_levels, F, N)

    gl_enc = per_level(g_enc)
    gl_x = per_level(g_gx)
    gl_y = per_level(g_gy)
    gl_z = per_level(g_gz)

    simplex = cfg.interpolation == "Simplex"

    def level_body(_, xs):
        tab_l, ge, ggx, ggy, ggz, res, dense_flag, m = xs
        resf = res.astype(jnp.float32)
        pos = x * resf
        grid_f = jnp.floor(pos)
        w = pos - grid_f
        grid_i = jnp.clip(grid_f.astype(jnp.int32), 0, res)
        xg0 = jnp.zeros((N,), jnp.float32)
        xg1 = jnp.zeros((N,), jnp.float32)
        xg2 = jnp.zeros((N,), jnp.float32)
        # table grads batched into ONE flat-key segment_sum per level
        # (launch-count dominated; see _encode_bwd)
        keys, vals = [], []
        if simplex:
            offs, lams, ohs = _simplex_parts(w)
            bases = [
                _offset_index_1d(grid_i, o, res, dense_flag, T) * F
                for o in offs]
            hbar = [jnp.zeros((N,), jnp.float32) for _ in range(4)]
            for f in range(F):
                ge_f = ge[f] * m
                # rank-j cotangents on denc (g*_f carry one res factor)
                gj = [ohs[j][:, 0] * ggx[f] + ohs[j][:, 1] * ggy[f]
                      + ohs[j][:, 2] * ggz[f] for j in range(3)]
                gj = [g * m * resf for g in gj]
                # d enc/d f_cj = lam_j; d denc_{p_k}/d f_cj = +-1
                coefs = [lams[0] * ge_f - gj[0],
                         lams[1] * ge_f + gj[0] - gj[1],
                         lams[2] * ge_f + gj[1] - gj[2],
                         lams[3] * ge_f + gj[2]]
                for ci in range(4):
                    keys.append(bases[ci] + f)
                    vals.append(coefs[ci])
                    if cfg.compute_x_grad:
                        hbar[ci] = hbar[ci] + jnp.take(
                            tab_l, bases[ci] + f) * ge_f
            if cfg.compute_x_grad:
                # first-order x cotangent through enc (denc is piecewise
                # constant in x: second derivatives vanish inside a simplex)
                for j in range(3):
                    d = (hbar[j + 1] - hbar[j]) * resf
                    xg0 = xg0 + ohs[j][:, 0] * d
                    xg1 = xg1 + ohs[j][:, 1] * d
                    xg2 = xg2 + ohs[j][:, 2] * d
            tg = jax.ops.segment_sum(jnp.concatenate(vals),
                                     jnp.concatenate(keys),
                                     num_segments=T * F)
            return None, (tg, jnp.stack([xg0, xg1, xg2]))
        for corner in _CORNER_OFFSETS:
            (ax, ay, az), (sx, sy, sz) = _axis_weight_parts(w, corner)
            cw = ax * ay * az
            dwx = sx * ay * az
            dwy = sy * ax * az
            dwz = sz * ax * ay
            idx = _corner_index_1d(grid_i, corner, res, dense_flag, T)
            base = idx * F
            for f in range(F):
                ge_f = ge[f] * m
                gx_f = ggx[f] * m * resf
                gy_f = ggy[f] * m * resf
                gz_f = ggz[f] * m * resf
                # table cotangent: coefficient of feats in each output
                coef = cw * ge_f + dwx * gx_f + dwy * gy_f + dwz * gz_f
                keys.append(base + f)
                vals.append(coef)
                if not cfg.compute_x_grad:
                    continue
                feat = jnp.take(tab_l, base + f)
                # x cotangent: d(enc)/dx needs one res (chain w->x); the
                # cross second-derivative terms d(denc_i)/dx_j need res^2 —
                # g*_f already carries one res, so multiply one more
                xg0 = xg0 + feat * (dwx * ge_f * resf
                                    + (sx * sy * az * gy_f
                                       + sx * sz * ay * gz_f) * resf)
                xg1 = xg1 + feat * (dwy * ge_f * resf
                                    + (sy * sx * az * gx_f
                                       + sy * sz * ax * gz_f) * resf)
                xg2 = xg2 + feat * (dwz * ge_f * resf
                                    + (sz * sx * ay * gx_f
                                       + sz * sy * ax * gy_f) * resf)
        tg = jax.ops.segment_sum(jnp.concatenate(vals),
                                 jnp.concatenate(keys),
                                 num_segments=T * F)
        return None, (tg, jnp.stack([xg0, xg1, xg2]))

    packed_levels = _packed_level_list(cfg)
    scan_levels = [l for l in range(cfg.n_levels) if l not in packed_levels]

    if scan_levels:
        sel = np.asarray(scan_levels)
        _, (tgs, xg) = jax.lax.scan(
            level_body, None,
            (tab_flat[sel], gl_enc[sel], gl_x[sel], gl_y[sel], gl_z[sel],
             jnp.asarray(res_np[sel]), jnp.asarray(dense_np[sel]),
             mask_arr[jnp.asarray(sel)]))
        x_grad = jnp.sum(xg, axis=0).T
    else:
        tgs = jnp.zeros((0, T * F), jnp.float32)
        x_grad = jnp.zeros((N, 3), jnp.float32)

    level_grads = {l: tgs[i] for i, l in enumerate(scan_levels)}
    for l in packed_levels:
        res_l = int(res_np[l])
        resf = float(res_l)
        Tc = (res_l + 1) ** 3
        cell, w = _cell_and_w(x, res_l)
        cw = _packed_corner_weights(w, cfg)                 # [N, 8]
        dxw, dyw, dzw = _packed_weight_derivs(w, cfg)
        m = mask_arr[l]
        # matrix-valued scatter (one 8F-lane row per point; see
        # _encode_bwd): data[n,k,f] = sum of 4 outer products
        geT = (gl_enc[l] * m).T                             # [N, F]
        gxT = (gl_x[l] * m * resf).T
        gyT = (gl_y[l] * m * resf).T
        gzT = (gl_z[l] * m * resf).T
        data = (cw[:, :, None] * geT[:, None, :]
                + dxw[:, :, None] * gxT[:, None, :]
                + dyw[:, :, None] * gyT[:, None, :]
                + dzw[:, :, None] * gzT[:, None, :]).reshape(N, 8 * F)
        packed_grad = jax.ops.segment_sum(
            data, cell, num_segments=Tc).reshape(Tc, 8, F)
        level_grads[l] = _unpack_dense_grad(
            packed_grad, res_l, F, T).reshape(T * F)
        if cfg.compute_x_grad:
            packed = _pack_dense_level(table[l], res_l, F)
            feats = jnp.take(packed.reshape(-1, 8 * F), cell,
                             axis=0).reshape(N, 8, F)
            h_enc = jnp.einsum("nkf,fn->nk", feats, gl_enc[l] * m)
            h_gx = jnp.einsum("nkf,fn->nk", feats, gl_x[l] * m) * resf
            h_gy = jnp.einsum("nkf,fn->nk", feats, gl_y[l] * m) * resf
            h_gz = jnp.einsum("nkf,fn->nk", feats, gl_z[l] * m) * resf
            dxy, dxz, dyz = _packed_weight_second_derivs(w, cfg)
            x_grad = x_grad + resf * jnp.stack([
                jnp.sum(h_enc * dxw + h_gy * dxy + h_gz * dxz, -1),
                jnp.sum(h_enc * dyw + h_gx * dxy + h_gz * dyz, -1),
                jnp.sum(h_enc * dzw + h_gx * dxz + h_gy * dyz, -1)],
                axis=-1)

    table_grad = jnp.stack(
        [level_grads[l] for l in range(cfg.n_levels)]).reshape(
        cfg.n_levels, T, F)
    return table_grad, x_grad, None


@_partial(jax.custom_vjp, nondiff_argnums=(2,))
def _hashgrid_encode_with_grad_flat(table, x, cfg, level_mask):
    return _encode_with_grad_impl(table, x, cfg, level_mask)


_hashgrid_encode_with_grad_flat.defvjp(_ewg_fwd, _ewg_bwd)


def hashgrid_encode_with_grad(table, x, cfg: HashGridConfig,
                              level_mask=None):
    """Encode + spatial gradient in one gather pass.

    x [..., 3] in [0,1] -> (enc [..., L*F], denc [3, ..., L*F] where
    denc[i] = d enc / d x_i). Both outputs carry exact custom gradients
    (first-order wrt table and x; sufficient for normals + eikonal since
    the pullback goes through ONE custom VJP, no reverse-over-reverse).
    """
    orig_shape = x.shape[:-1]
    xf = x.reshape(-1, cfg.n_input_dims)
    enc, gx, gy, gz = _hashgrid_encode_with_grad_flat(table, xf, cfg,
                                                      level_mask)
    D = cfg.n_output_dims
    return (enc.reshape(*orig_shape, D),
            jnp.stack([gx, gy, gz]).reshape(3, *orig_shape, D))


_PRIMES_ND = (1, 2654435761, 805459861, 3674653429)


def hashgrid_encode_nd(table: jnp.ndarray, x: jnp.ndarray,
                       cfg: HashGridConfig,
                       level_mask: Optional[jnp.ndarray] = None):
    """Generic n-D (2-4 input dims) hash-grid encode, plain XLA autodiff.

    Used by the spatial-time (4D) encoding (reference
    threestudio/models/networks.py:68-126 TCNNEncodingSpatialTime) — an
    auxiliary component no shipped benchmark exercises, so this favors
    generality over the hand-tuned 3D custom-VJP path. x in [0,1]^D.
    """
    import itertools

    D = cfg.n_input_dims
    T = cfg.table_size
    orig_shape = x.shape[:-1]
    x = x.reshape(-1, D)
    corners = list(itertools.product((0, 1), repeat=D))
    outs = []
    for level in range(cfg.n_levels):
        res = cfg.level_resolution(level)
        dense = (res + 1) ** D <= T
        pos = x * res
        grid_f = jnp.floor(pos)
        w = pos - grid_f
        grid_i = jnp.clip(grid_f.astype(jnp.int32), 0, res)
        acc = 0.0
        for corner in corners:
            c = grid_i + jnp.asarray(corner, jnp.int32)
            if dense:
                idx = c[:, 0]
                for d in range(1, D):
                    idx = idx * (res + 1) + c[:, d]
            else:
                cu = c.astype(jnp.uint32)
                idx = cu[:, 0] * np.uint32(_PRIMES_ND[0])
                for d in range(1, D):
                    idx = idx ^ (cu[:, d] * np.uint32(_PRIMES_ND[d]))
                idx = (idx & np.uint32(T - 1)).astype(jnp.int32)
            cw = 1.0
            for d, bit in enumerate(corner):
                cw = cw * (w[:, d] if bit else 1.0 - w[:, d])
            acc = acc + jnp.take(table[level], idx, axis=0) * cw[:, None]
        if level_mask is not None:
            acc = acc * level_mask[level]
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1).reshape(
        *orig_shape, cfg.n_output_dims)


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
