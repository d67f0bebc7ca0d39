"""1-D data mesh + sharding helpers (reference: PL DDP, launch.py:233-240).

Params and frozen diffusion weights are replicated; the camera batch is
sharded over the 'data' axis. Gradients need no explicit collective: the
jitted loss is an average over the global batch, so GSPMD emits the psum
(the NCCL-allreduce-in-backward equivalent) automatically.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_data_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """Mesh over all (or the given) devices with a single 'data' axis."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim_batch_axis: int = 0) -> NamedSharding:
    spec = [None] * (ndim_batch_axis + 1)
    spec[ndim_batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def shard_batch(mesh: Mesh, batch: Dict, batch_size: int) -> Dict:
    """device_put every array: leading-dim==batch_size -> split over 'data',
    everything else replicated. Non-array entries are dropped (host-only
    metadata like prompt strings stays host-side)."""
    data_s = NamedSharding(mesh, P("data"))
    repl_s = NamedSharding(mesh, P())
    out = {}
    for k, v in batch.items():
        if not isinstance(v, (np.ndarray, jax.Array)):
            continue
        arr = np.asarray(v)
        out[k] = jax.device_put(
            arr, data_s if arr.shape[:1] == (batch_size,) else repl_s)
    return out
