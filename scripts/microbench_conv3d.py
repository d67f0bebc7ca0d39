"""Microbench: modulated conv3d lowering strategies at workload scale.

The conv3d workload step (asd_sd_3dconv_net_50k) runs ~4.6 s while its
FLOP count (~5.4 TFLOP fwd+bwd for the synthesis pyramid) predicts well
under 0.5 s on a v5e — suspicion: XLA:TPU lowering of NDHWC 3-D
convolutions (vmapped per-sample kernels) is far off the MXU roofline.
Compares, per pyramid level (B=1, StyleGAN channel pyramid):

  vmap-conv   jax.vmap of lax.conv_general_dilated (current impl)
  grouped     one conv_general_dilated with feature_group_count=B
  slabwise    lax.map over z-slabs of an im2col einsum (bounded memory)

Timing anchors on a scalar readback (axon relay rule). Run on the chip:
  python scripts/microbench_conv3d.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=4):
    out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:28s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def main():
    B = 1
    pyramid = [(16, 512), (32, 256), (64, 128), (128, 64)]
    for res, C in pyramid:
        x = jax.random.normal(jax.random.PRNGKey(0), (B, res, res, res, C),
                              jnp.float32)
        w = jax.random.normal(jax.random.PRNGKey(1), (B, 3, 3, 3, C, C))

        def conv_one(xi, wi):
            return jax.lax.conv_general_dilated(
                xi[None], wi, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]

        vconv = jax.jit(lambda x, w: jax.vmap(conv_one)(x, w))
        flops = 2 * B * res ** 3 * 27 * C * C
        print(f"-- res {res}^3 x {C}ch  ({flops/1e9:.0f} GFLOP fwd)")
        t = timeit("vmap-conv fwd", vconv, x, w)
        print(f"   -> {flops/t/1e12:.1f} TFLOP/s")

        vgrad = jax.jit(lambda x, w: jax.grad(
            lambda w: jnp.sum(jax.vmap(conv_one)(x, w) ** 2))(w))
        timeit("vmap-conv fwd+bwd", vgrad, x, w)

        # slab-wise im2col einsum (z-slab of 8 planes at a time)
        def econv(x, w):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
            wf = w.reshape(B, 27, C, C)
            slab = 8

            def body(z0):
                pats = jnp.stack(
                    [jax.lax.dynamic_slice(
                        xp, (0, z0 + a, b, c, 0),
                        (B, slab, res, res, C))
                     for a in range(3) for b in range(3) for c in range(3)],
                    axis=-2)
                return jnp.einsum("bdhwkc,bkco->bdhwo", pats, wf)

            outs = jax.lax.map(body, jnp.arange(0, res, slab))
            return jnp.moveaxis(outs, 0, 1).reshape(B, res, res, res, C)

        ej = jax.jit(econv)
        t = timeit("slab-einsum fwd", ej, x, w)
        print(f"   -> {flops/t/1e12:.1f} TFLOP/s")
        egrad = jax.jit(lambda x, w: jax.grad(
            lambda w: jnp.sum(econv(x, w) ** 2))(w))
        timeit("slab-einsum fwd+bwd", egrad, x, w)
        d = float(jnp.abs(vconv(x, w) - ej(x, w)).max())
        print(f"   match: {d:.2e}")


if __name__ == "__main__":
    main()
