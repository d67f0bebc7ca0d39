"""Parallelism subsystem: device meshes, batch sharding, sharded eval.

The reference's distributed story is PL-DDP data parallelism plus per-rank
prompt sharding (SURVEY.md §2.2). TPU-native equivalents here:

- `make_data_mesh` / `replicated` / `data_sharding`: the 1-D 'data' mesh and
  NamedShardings used by the trainer and the driver dryrun; GSPMD inserts the
  gradient psum that DDP's backward allreduce provided.
- `shard_batch`: host batch -> device arrays, batch-dim arrays split over
  'data', everything else replicated.
- `sharded_eval_render` (rays.py): shard_map over the RAY axis for big
  (512²) eval renders — the volume-rendering analog of context parallelism
  (SURVEY.md §5 "long-context"): rays are independent, the generator's
  space_cache/params are replicated, so eval scales linearly over ICI.

- `make_dp_tp_mesh` / `guidance_param_shardings` (tensor.py): optional
  ('data', 'model') mesh with the frozen diffusion prior's attention and
  GEGLU matmuls Megatron-sharded over 'model' — per-chip HBM headroom for
  the UNet at scale, expressed purely as GSPMD NamedShardings.

Prompt-shard data parallelism lives with the data layer
(`data/multiprompt.py` `[rank::world]`), matching the reference's placement.
"""

from .mesh import (data_sharding, make_data_mesh, replicated,  # noqa: F401
                   shard_batch)
from .rays import (make_ray_sharded_render,  # noqa: F401
                   ray_sharded_render, shard_batch_rays)
from .tensor import (guidance_param_shardings,  # noqa: F401
                     make_dp_tp_mesh, shard_guidance_params)
