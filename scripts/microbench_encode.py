"""Microbench: hash-encode fwd+bwd cost for alternative level/feature
slicings at fixed parameter count and output width.

The re-slice hypothesis (ROADMAP r3 lever): output dims L*F and finest
resolution held constant, fewer levels x more features per level cuts the
per-level gather/scatter row count (cost is per ROW, width-independent up to
32 floats — memory axon-tpu-measurement). 16x2 (tcnn parity) vs 8x4 vs 4x8.

Timing anchors on a scalar readback (block_until_ready is a no-op on the
axon relay).
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scaledreamer_tpu.ops.hashgrid import (HashGridConfig, hashgrid_encode,
                                           init_hashgrid)


def scale_for(levels, base=16, finest=4096):
    return math.exp(math.log(finest / base) / (levels - 1))


def bench_cfg(name, cfg, n_points=786432, iters=8):
    key = jax.random.PRNGKey(0)
    table = init_hashgrid(key, cfg)
    x = jax.random.uniform(jax.random.fold_in(key, 1), (n_points, 3))

    @jax.jit
    def fwd(t, x):
        return jnp.sum(hashgrid_encode(t, x, cfg))

    @jax.jit
    def both(t, x):
        loss, g = jax.value_and_grad(
            lambda t: jnp.sum(hashgrid_encode(t, x, cfg) ** 2))(t)
        return loss + jnp.sum(g[..., :1]) * 0.0

    for fname, fn in (("fwd", fwd), ("fwd+bwd", both)):
        float(np.asarray(fn(table, x)))  # compile+run
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(table, x)
        float(np.asarray(out))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:26s} {fname:8s} {dt*1e3:8.2f} ms "
              f"({n_points/1e6:.2f}M pts)")


if __name__ == "__main__":
    n = int(os.environ.get("MB_POINTS", 786432))
    for L, F in ((16, 2), (8, 4), (4, 8)):
        for interp in ("Simplex",):
            cfg = HashGridConfig(
                n_levels=L, n_features_per_level=F,
                per_level_scale=scale_for(L),
                interpolation=interp, dense_cell_packing=True,
                compute_x_grad=False)
            bench_cfg(f"L{L}xF{F} {interp}", cfg, n_points=n)
