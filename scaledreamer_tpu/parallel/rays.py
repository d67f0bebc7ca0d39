"""Ray-axis sharding for big eval renders (SURVEY.md §5 long-context analog).

A 512² eval camera is 262k rays × ~192 samples — too big for one chip's HBM
in a single launch and embarrassingly parallel: rays are independent and the
only shared state (params, generator space_cache, light position) is
replicated. `shard_map` over the ray axis is the volume-rendering equivalent
of context parallelism: each device renders its contiguous ray block with NO
collectives; results concatenate on the host.

Reference contrast: threestudio chunks rays sequentially on one GPU
(`chunk_batch`, threestudio/utils/ops.py:116-180; `eval_chunk_size`).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_ray_sharded_render(mesh: Mesh, chunk_fn: Callable) -> Callable:
    """Build a sharded whole-image renderer from a per-block renderer.

    chunk_fn(params, rays_o [n,3], rays_d [n,3], extra: dict) must return a
    dict of [n, C] arrays and be shape-polymorphic in n (it is traced once
    per distinct padded size). `extra` entries are replicated (light
    positions, text_embed, noise, ...).

    Returns render(params, rays_o [N,3], rays_d [N,3], extra) -> {k: [N,C]}
    with N padded internally to a multiple of the mesh size.
    """
    n_dev = int(np.prod(list(mesh.shape.values())))

    local = shard_map(
        chunk_fn, mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P()),
        out_specs=P("data"))
    jitted = jax.jit(local)

    def render(params, rays_o, rays_d, extra: Optional[Dict] = None):
        extra = extra if extra is not None else {}
        N = rays_o.shape[0]
        pad = (-N) % n_dev
        if pad:
            rays_o = jnp.concatenate(
                [rays_o, jnp.broadcast_to(rays_o[:1], (pad, 3))], axis=0)
            rays_d = jnp.concatenate(
                [rays_d, jnp.broadcast_to(rays_d[:1], (pad, 3))], axis=0)
        out = jitted(params, jnp.asarray(rays_o), jnp.asarray(rays_d), extra)
        return {k: v[:N] for k, v in out.items()}

    return render


def ray_sharded_render(mesh: Mesh, chunk_fn: Callable, params, rays_o,
                       rays_d, extra: Optional[Dict] = None):
    """One-shot convenience wrapper around `make_ray_sharded_render`."""
    return make_ray_sharded_render(mesh, chunk_fn)(
        params, rays_o, rays_d, extra)


_REPLICATION_WARNED: list = []


def shard_batch_rays(mesh: Mesh, batch: Dict, row_axis: int = 1) -> Dict:
    """Single-prompt TRAINING ray parallelism: shard pixel ROWS over 'data'.

    The reference binds B=1 single-prompt training to one GPU (its only
    parallel axis is the batch). On a TPU mesh the render itself is the
    parallel resource: rays are independent, so sharding the [B, H, W, *]
    image tensors along H partitions all per-ray geometry/render compute
    across the mesh under plain GSPMD — no shard_map, no code change in the
    train step. XLA all-gathers the small composited image before the
    (replicated) guidance UNet and psums the parameter gradients, both over
    ICI. H must be divisible by the 'data' axis size.

    Non-image arrays (prompt embeddings, noise, camera scalars) replicate.
    """
    import jax as _jax
    from jax.sharding import NamedSharding
    n_data = mesh.shape["data"]
    repl = NamedSharding(mesh, P())
    spec_rows = [None] * (row_axis + 1)
    spec_rows[row_axis] = "data"
    rows_s = NamedSharding(mesh, P(*spec_rows))
    ray_keys = ("rays_o", "rays_d")
    out = {}
    any_sharded = False
    for k, v in batch.items():
        if not isinstance(v, (np.ndarray, _jax.Array)):
            continue
        arr = np.asarray(v)
        shard_rows = (k in ray_keys and arr.ndim > row_axis + 1
                      and arr.shape[row_axis] % n_data == 0)
        any_sharded = any_sharded or shard_rows
        out[k] = _jax.device_put(arr, rows_s if shard_rows else repl)
    if not any_sharded and not _REPLICATION_WARNED:
        # warn ONCE per process: this runs every train step and the row
        # count is fixed per resolution milestone
        import logging
        shapes = {k: tuple(np.asarray(batch[k]).shape)
                  for k in ray_keys if k in batch}
        logging.getLogger(__name__).warning(
            "shard_batch_rays: ray row count is not divisible by the "
            "'data' axis (%d) — rays REPLICATED, zero ray parallelism "
            "(shapes: %s). Warned once; applies to every step at this "
            "resolution.", n_data, shapes)
        _REPLICATION_WARNED.append(True)
    return out
