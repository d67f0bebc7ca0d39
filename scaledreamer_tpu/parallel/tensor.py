"""Tensor parallelism for the frozen diffusion prior (dp x tp mesh).

The reference is DP-only (SURVEY.md §2.2) because each A100 holds the whole
fp16 UNet. On TPU the production concern is HBM headroom per chip (v5e:
16 GB) once batch/resolution grow: the UNet's attention and GEGLU matmuls
dominate both weights and activations, and they shard cleanly over a
'model' mesh axis — the classic Megatron split, expressed here purely as
GSPMD NamedShardings (no collective code; XLA inserts the all-reduces and
routes them over ICI):

- q/k/v projections and the GEGLU up-projection split their OUTPUT (head /
  hidden) dimension -> P(None, 'model') kernels, P('model') biases;
- the attention out-projection and GEGLU down-projection split their INPUT
  dimension -> P('model', None) kernels, replicated biases (their outputs
  are partial sums; GSPMD emits the psum over 'model');
- convs, norms, time embeddings stay replicated.

Per-device weight memory for the transformer stacks drops ~linearly in the
'model' axis; activations of the sharded matmuls likewise. Everything else
(generator params, optimizer state, camera batch) keeps the 1-D 'data'
semantics: batch sharded over 'data', replicated over 'model'.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# leaf module names whose Dense kernels split the OUTPUT dim
_COL_SPLIT = ("to_q", "to_k", "to_v", "net_0_proj")
# leaf module names whose Dense kernels split the INPUT dim (partial sums)
_ROW_SPLIT = ("to_out_0", "net_2")


def make_dp_tp_mesh(n_model: int,
                    devices: Optional[Sequence] = None) -> Mesh:
    """('data', 'model') mesh; n_model must divide the device count."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    assert n % n_model == 0, (n, n_model)
    grid = np.asarray(devices).reshape(n // n_model, n_model)
    return Mesh(grid, ("data", "model"))


def _spec_for(path, leaf) -> P:
    names = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    parent = names[-2] if len(names) >= 2 else ""
    leaf_name = names[-1] if names else ""
    dim = leaf.ndim
    if parent in _COL_SPLIT:
        if leaf_name == "kernel" and dim == 2:
            return P(None, "model")
        if leaf_name == "bias" and dim == 1:
            return P("model")
    if parent in _ROW_SPLIT and leaf_name == "kernel" and dim == 2:
        return P("model", None)
    return P()


def guidance_param_shardings(guidance_params, mesh: Mesh):
    """NamedSharding pytree for frozen guidance params on a dp x tp mesh.

    Attention/GEGLU Denses are Megatron-split over 'model' (see module
    docstring); every other leaf is replicated. Leaves whose split dim is
    not divisible by the 'model' axis size fall back to replicated, so tiny
    test networks and odd head counts stay valid.
    """
    n_model = mesh.shape["model"]

    def spec(path, leaf):
        s = _spec_for(path, leaf)
        for ax, name in enumerate(s):
            if name == "model" and leaf.shape[ax] % n_model != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, s)

    return jax.tree_util.tree_map_with_path(spec, guidance_params)


def shard_guidance_params(guidance_params, mesh: Mesh):
    """device_put the frozen prior onto the mesh with Megatron shardings."""
    return jax.device_put(guidance_params,
                          guidance_param_shardings(guidance_params, mesh))
