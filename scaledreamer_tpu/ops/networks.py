"""Encodings and MLP stacks as Flax linen modules.

Parity surface: reference `threestudio/models/networks.py` —
`get_encoding` (ProgressiveBandFrequency / HashGrid / ProgressiveBandHashGrid
/ CompositeEncoding include_xyz, :16-211) and `get_mlp`
(VanillaMLP bias-free ReLU, SphereInitVanillaMLP weight-norm geometric init
with softplus(beta=100), :213-349). The TCNN fused-CUDA variants (`FullyFusedMLP`)
map to plain linen MLPs — on TPU, XLA fuses the 64-wide matmul chain onto the
MXU without a hand-written kernel.

Progressive band masks are *traced inputs* (computed host-side per step via
`hashgrid.progressive_level_mask` / `frequency_mask`) so annealing never
retraces the jitted step.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .hashgrid import (HashGridConfig, hashgrid_config_from_tcnn,
                       hashgrid_encode, init_hashgrid)
from .math import get_activation


# --------------------------------------------------------------------------
# Encodings
# --------------------------------------------------------------------------
class FrequencyEncoding(nn.Module):
    """sin/cos bands, optional progressive mask (networks.py:16-52)."""
    n_input_dims: int
    n_frequencies: int
    n_masking_step: int = 0

    @property
    def n_output_dims(self):
        return self.n_input_dims * 2 * self.n_frequencies

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        freqs = 2.0 ** jnp.arange(self.n_frequencies, dtype=jnp.float32)
        if mask is None:
            mask = jnp.ones(self.n_frequencies, dtype=jnp.float32)
        out = []
        for i in range(self.n_frequencies):
            out.append(jnp.sin(freqs[i] * x) * mask[i])
            out.append(jnp.cos(freqs[i] * x) * mask[i])
        return jnp.concatenate(out, axis=-1)


def frequency_mask(n_frequencies: int, n_masking_step: int,
                   global_step: int) -> np.ndarray:
    """Host-side cosine-eased progressive frequency mask (networks.py:35-51)."""
    if n_masking_step <= 0 or global_step is None:
        return np.ones(n_frequencies, dtype=np.float32)
    ptr = global_step / n_masking_step * n_frequencies - np.arange(n_frequencies)
    return ((1.0 - np.cos(np.pi * np.clip(ptr, 0, 1))) / 2.0).astype(np.float32)


class SphericalHarmonicsEncoding(nn.Module):
    """Real SH basis up to `degree` (tcnn "SphericalHarmonics" parity).

    tcnn convention: input in [0,1]^3 is mapped to [-1,1]^3 directions; the
    basis follows the hard-coded tcnn/instant-ngp polynomial expansion.
    """
    degree: int = 3

    @property
    def n_output_dims(self):
        return self.degree ** 2

    @nn.compact
    def __call__(self, dirs01, *args, **kwargs):
        d = dirs01 * 2.0 - 1.0
        x, y, z = d[..., 0], d[..., 1], d[..., 2]
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out = [jnp.full_like(x, 0.28209479177387814)]
        if self.degree > 1:
            out += [-0.48860251190291987 * y,
                    0.48860251190291987 * z,
                    -0.48860251190291987 * x]
        if self.degree > 2:
            out += [1.0925484305920792 * xy,
                    -1.0925484305920792 * yz,
                    0.94617469575755997 * zz - 0.31539156525251999,
                    -1.0925484305920792 * xz,
                    0.54627421529603959 * (xx - yy)]
        if self.degree > 3:
            out += [
                0.59004358992664352 * y * (-3.0 * xx + yy),
                2.8906114426405538 * xy * z,
                0.45704579946446572 * y * (1.0 - 5.0 * zz),
                0.3731763325901154 * z * (5.0 * zz - 3.0),
                0.45704579946446572 * x * (1.0 - 5.0 * zz),
                1.4453057213202769 * z * (xx - yy),
                0.59004358992664352 * x * (-xx + 3.0 * yy),
            ]
        return jnp.stack(out, axis=-1)


class HashGridEncoding(nn.Module):
    """Learned multires hash grid; table is a linen param (ops/hashgrid.py)."""
    grid: HashGridConfig
    param_dtype: Any = jnp.float32

    @property
    def n_output_dims(self):
        return self.grid.n_output_dims

    @nn.compact
    def __call__(self, x, level_mask: Optional[jnp.ndarray] = None,
                 with_grad: bool = False, max_levels: Optional[int] = None):
        table = self.param(
            "table", lambda key: init_hashgrid(key, self.grid, self.param_dtype))
        if max_levels is not None and 0 < max_levels < self.grid.n_levels:
            # STATIC truncation: encode only the first `max_levels` levels
            # (coarse) and zero-fill the fine features. Unlike level_mask
            # (a traced multiplier — gathers still execute), this removes
            # the fine levels' gather rows from the program entirely.
            # Intended for proposal-pass density evals where the fine
            # detail only perturbs sample placement (renderer
            # `prop_encode_levels`); output width is unchanged so the
            # downstream heads see ProgressiveBandHashGrid-style zeros.
            import dataclasses
            cfg_k = dataclasses.replace(self.grid, n_levels=max_levels)
            lm = None if level_mask is None else level_mask[:max_levels]
            if with_grad:
                from .hashgrid import hashgrid_encode_with_grad
                enc, denc = hashgrid_encode_with_grad(
                    table[:max_levels], x, cfg_k, lm)
                pad = self.grid.n_output_dims - enc.shape[-1]
                return (jnp.pad(enc, ((0, 0), (0, pad))),
                        jnp.pad(denc, ((0, 0), (0, 0), (0, pad))))
            enc = hashgrid_encode(table[:max_levels], x, cfg_k, lm)
            return jnp.pad(
                enc, ((0, 0), (0, self.grid.n_output_dims - enc.shape[-1])))
        if with_grad:
            from .hashgrid import hashgrid_encode_with_grad
            return hashgrid_encode_with_grad(table, x, self.grid, level_mask)
        return hashgrid_encode(table, x, self.grid, level_mask)


class SpatialTimeEncoding(nn.Module):
    """4D spatial-time hash encoding (reference networks.py:68-126
    TCNNEncodingSpatialTime): a static 3D hash grid plus a 4D grid over
    (xyz, t), outputs summed. `static=True` stops gradients to the time
    table (the reference freezes its params). Evaluate with
    `frame_time` in [0, 1] (defaults to 0, the reference's static path)."""
    grid: HashGridConfig
    static: bool = True
    param_dtype: Any = jnp.float32

    @property
    def n_output_dims(self):
        return self.grid.n_output_dims

    @nn.compact
    def __call__(self, x, level_mask: Optional[jnp.ndarray] = None,
                 frame_time: float = 0.0, with_grad: bool = False):
        if with_grad:
            raise NotImplementedError(
                "fused encode+grad is not provided for spatial-time; use "
                "finite-difference normals with this encoding")
        from .hashgrid import hashgrid_encode_nd
        import dataclasses
        cfg4 = dataclasses.replace(self.grid, n_input_dims=4)
        table = self.param(
            "table", lambda key: init_hashgrid(key, self.grid,
                                               self.param_dtype))
        table_t = self.param(
            "table_time",
            lambda key: init_hashgrid(key, cfg4, self.param_dtype))
        if self.static:
            table_t = jax.lax.stop_gradient(table_t)
        enc = hashgrid_encode(table, x, self.grid, level_mask)
        t = jnp.full((*x.shape[:-1], 1), frame_time, x.dtype)
        enc_t = hashgrid_encode_nd(
            table_t, jnp.concatenate([x, t], axis=-1), cfg4, level_mask)
        return enc + enc_t


class CompositeEncoding(nn.Module):
    """Optionally prepend affine-rescaled raw xyz (networks.py:169-191)."""
    encoding: nn.Module
    include_xyz: bool = False
    xyz_scale: float = 2.0
    xyz_offset: float = -1.0
    n_input_dims: int = 3

    @property
    def n_output_dims(self):
        return (int(self.include_xyz) * self.n_input_dims
                + self.encoding.n_output_dims)

    @nn.compact
    def __call__(self, x, *args, with_grad: bool = False, **kwargs):
        if with_grad:
            enc, denc = self.encoding(x, *args, with_grad=True, **kwargs)
            if self.include_xyz:
                enc = jnp.concatenate(
                    [x * self.xyz_scale + self.xyz_offset, enc], axis=-1)
                eye = jnp.broadcast_to(
                    jnp.eye(3)[:, None, :] * self.xyz_scale,
                    (3, x.shape[0], 3))
                denc = jnp.concatenate([eye, denc], axis=-1)
            return enc, denc
        enc = self.encoding(x, *args, **kwargs)
        if not self.include_xyz:
            return enc
        return jnp.concatenate(
            [x * self.xyz_scale + self.xyz_offset, enc], axis=-1)


def get_encoding(n_input_dims: int, config: dict) -> CompositeEncoding:
    """Factory honoring the reference's `otype` config surface
    (networks.py:192-210). Input assumed in [0,1]."""
    otype = config.get("otype", "HashGrid")
    if otype == "ProgressiveBandFrequency":
        enc = FrequencyEncoding(
            n_input_dims=n_input_dims,
            n_frequencies=config.get("n_frequencies", 6),
            n_masking_step=config.get("n_masking_step", 0),
        )
    elif otype in ("HashGrid", "ProgressiveBandHashGrid"):
        enc = HashGridEncoding(grid=hashgrid_config_from_tcnn(config, n_input_dims))
    elif otype == "HashGridSpatialTime":
        enc = SpatialTimeEncoding(
            grid=hashgrid_config_from_tcnn(config, n_input_dims),
            static=config.get("static", True))
    elif otype == "SphericalHarmonics":
        enc = SphericalHarmonicsEncoding(degree=config.get("degree", 3))
    else:
        raise ValueError(f"Unknown encoding otype: {otype}")
    return CompositeEncoding(
        encoding=enc,
        include_xyz=config.get("include_xyz", False),
        xyz_scale=2.0,
        xyz_offset=-1.0,
        n_input_dims=n_input_dims,
    )


# --------------------------------------------------------------------------
# MLPs
# --------------------------------------------------------------------------
class VanillaMLP(nn.Module):
    """Bias-free ReLU MLP (networks.py:213-249). fp32 params; compute dtype
    bf16-safe since widths are small."""
    dim_out: int
    n_neurons: int = 64
    n_hidden_layers: int = 1
    output_activation: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        for _ in range(self.n_hidden_layers):
            x = nn.Dense(self.n_neurons, use_bias=False)(x)
            x = jax.nn.relu(x)
        x = nn.Dense(self.dim_out, use_bias=False)(x)
        return get_activation(self.output_activation)(x)


def _softplus100(x):
    # Softplus(beta=100): numerically = relu for |x| >~ 0.1 but smooth at 0
    return jax.nn.softplus(100.0 * x) / 100.0


class WNDense(nn.Module):
    """Weight-normalized Dense with custom direction init.

    weight = g * v / ||v||_row ; g initialized to ||v||_row so the effective
    weight at init equals v (torch weight_norm semantics).
    """
    features: int
    kernel_init: Callable

    @nn.compact
    def __call__(self, x):
        dim_in = x.shape[-1]
        v = self.param("v", self.kernel_init, (dim_in, self.features))
        g = self.param("g", lambda key, shape: jnp.linalg.norm(v, axis=0),
                       (self.features,))
        b = self.param("b", self._bias_init, (self.features,))
        norm = jnp.linalg.norm(v, axis=0, keepdims=True)
        w = v * (g[None, :] / jnp.maximum(norm, 1e-12))
        return x @ w + b

    def _bias_init(self, key, shape):
        return jnp.zeros(shape, jnp.float32)


class SphereInitVanillaMLP(nn.Module):
    """Geometric (sphere) initialization SDF MLP (networks.py:253-323):
    weight-normalized Dense layers, softplus(beta=100) activation, output
    biased to an SDF of a sphere with `sphere_init_radius`.

    Assumes the input layout [xyz(3), extra encodings...] — the first layer
    zeros the encoding columns, as in the reference (composite include_xyz).
    """
    dim_out: int
    n_neurons: int = 64
    n_hidden_layers: int = 1
    sphere_init_radius: float = 0.5
    inside_out: bool = False
    output_activation: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        def first_init(key, shape):
            dim_in, dim_out = shape
            w = jnp.zeros(shape, jnp.float32)
            sub = jax.random.normal(key, (3, dim_out)) * (
                math.sqrt(2) / math.sqrt(dim_out))
            return w.at[:3, :].set(sub)

        def mid_init(key, shape):
            return jax.random.normal(key, shape) * (
                math.sqrt(2) / math.sqrt(shape[1]))

        sign = -1.0 if self.inside_out else 1.0

        def last_init(key, shape):
            mean = sign * math.sqrt(math.pi) / math.sqrt(shape[0])
            return mean + 1e-4 * jax.random.normal(key, shape)

        h = x
        for i in range(self.n_hidden_layers):
            init = first_init if i == 0 else mid_init
            h = WNDense(features=self.n_neurons, kernel_init=init)(h)
            h = _softplus100(h)

        last = WNDense(features=self.dim_out, kernel_init=last_init,
                       name=f"layers_{self.n_hidden_layers}")
        out = last(h) + (-sign * self.sphere_init_radius)
        return get_activation(self.output_activation)(out)


def get_mlp(n_output_dims: int, config: dict) -> nn.Module:
    """Factory honoring reference `get_mlp` otypes (networks.py:336-349);
    TCNN 'FullyFusedMLP' maps to VanillaMLP (XLA fuses it on the MXU)."""
    otype = config.get("otype", "VanillaMLP")
    if otype == "SphereInitVanillaMLP":
        return SphereInitVanillaMLP(
            dim_out=n_output_dims,
            n_neurons=config.get("n_neurons", 64),
            n_hidden_layers=config.get("n_hidden_layers", 1),
            sphere_init_radius=config.get("sphere_init_radius", 0.5),
            inside_out=config.get("inside_out", False),
            output_activation=config.get("output_activation"),
        )
    if otype in ("VanillaMLP", "FullyFusedMLP", "CutlassMLP"):
        return VanillaMLP(
            dim_out=n_output_dims,
            n_neurons=config.get("n_neurons", 64),
            n_hidden_layers=config.get("n_hidden_layers", 1),
            output_activation=config.get("output_activation"),
        )
    raise ValueError(f"Unknown MLP otype: {otype}")
