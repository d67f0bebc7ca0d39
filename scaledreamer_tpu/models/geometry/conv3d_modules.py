"""StyleGAN2-style 3D convolutional generator modules (CC3D), in Flax.

Parity target: reference `custom/amortized/extern/stylegan_3dconv_modules.py`
(adapted there from CC3D networks_3d.py): equalized-lr FullyConnectedLayer,
z-normalizing MappingNetwork with text-embedding concat, modulated conv3d
with demodulation, SynthesisPrologue/Block pyramid 4³ -> img_resolution³
with smooth (align-corners trilinear) upsampling and per-layer noise, ToRGB
skip accumulation.

TPU notes: volumes are NDHWC; the per-sample modulated conv is a vmap of
`lax.conv_general_dilated` (XLA batches it into one grouped conv on the
MXU) — the reference's groups=batch trick expressed functionally.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.grid_sample import upsample_3d_align_corners


def clamp_gain(x, gain: float, clamp: float):
    return jnp.clip(x * gain, -clamp, clamp)


def normalize_2nd_moment(x, axis=-1, eps=1e-8):
    return x * jax.lax.rsqrt(jnp.mean(x * x, axis=axis, keepdims=True) + eps)


_ACT = {
    "linear": (lambda x: x, 1.0),
    "lrelu": (lambda x: jax.nn.leaky_relu(x, 0.2), math.sqrt(2)),
}


class FullyConnectedLayer(nn.Module):
    """Equalized-lr dense (stylegan_3dconv_modules.py:35-51)."""
    features: int
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init: float = 0.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        w = self.param("weight",
                       lambda k, s: jax.random.normal(k, s) / self.lr_multiplier,
                       (self.features, in_features))
        weight_gain = self.lr_multiplier / math.sqrt(in_features)
        out = x @ (w * weight_gain).T
        if self.use_bias:
            b = self.param("bias",
                           lambda k, s: jnp.full(s, self.bias_init, jnp.float32),
                           (self.features,))
            out = out + b * self.lr_multiplier
        fn, gain = _ACT[self.activation]
        return fn(out) * gain


class MappingNetwork(nn.Module):
    """z (+ text c) -> broadcast w (stylegan_3dconv_modules.py:287-344).

    w_avg / truncation: the reference registers a `w_avg` buffer but ships
    its EMA update commented out and `raise NotImplementedError` on any
    truncation_psi != 1 (stylegan_3dconv_modules.py:318-319,335-341). Here
    both are completed with proper StyleGAN2 semantics: `w_avg` is a
    gradient-frozen parameter (stop-gradient in the lerp; the EMA update is
    applied functionally by the train step — see
    systems/base.py `_apply_w_avg_ema`), and truncation is the standard
    lerp w_avg + psi * (w - w_avg) with a traced psi (C()-annealable without
    retraces).
    """
    z_dim: int
    c_dim: int
    w_dim: int
    num_ws: int
    num_layers: int = 8

    @nn.compact
    def __call__(self, z, c=None, truncation_psi=1.0,
                 return_w: bool = False, unconditional: bool = False):
        x = normalize_2nd_moment(z)
        lr_mult = 0.01 if self.c_dim == 0 else 1.0
        for i in range(self.num_layers):
            x = FullyConnectedLayer(self.w_dim, activation="lrelu",
                                    lr_multiplier=lr_mult,
                                    name=f"layers_{i}")(x)
        if self.c_dim > 0:
            # c=None is only legal on the explicitly-unconditional path
            # (the sphere shape-init pre-fit, which the reference also runs
            # without text); a missing embedding at train time must ERROR,
            # not silently skip the embed layer.
            if c is None:
                assert unconditional, (
                    "MappingNetwork: c_dim > 0 but no conditioning embedding "
                    "was provided (pass unconditional=True only for the "
                    "shape-init fit)")
            else:
                x = jnp.concatenate([x, c], axis=-1)
                x = FullyConnectedLayer(self.w_dim, name="embed")(x)
        w_avg = self.param("w_avg", nn.initializers.zeros, (self.w_dim,))
        wa = jax.lax.stop_gradient(w_avg)
        x_t = wa + truncation_psi * (x - wa)
        ws = jnp.broadcast_to(x_t[:, None, :], (x.shape[0], self.num_ws,
                                                self.w_dim))
        if return_w:
            # pre-truncation w, for the EMA buffer update (detached)
            return ws, jax.lax.stop_gradient(x)
        return ws


def modulated_conv3d(x, weight, styles, padding: int = 0,
                     demodulate: bool = True, compute_dtype=None):
    """Per-sample style-modulated conv3d (stylegan_3dconv_modules.py:64-83).

    x: [B, D, H, W, I] NDHWC; weight: [O, I, kd, kh, kw]; styles: [B, I].
    compute_dtype (e.g. bf16): the CONV runs in that dtype (MXU-native on
    TPU) while modulation + demodulation stay f32 (the rsqrt normalization
    is precision-sensitive); output is cast back to the input dtype.
    """
    B = x.shape[0]
    O, I, kd, kh, kw = weight.shape
    w = weight[None] * styles.reshape(B, 1, I, 1, 1, 1)  # [B,O,I,kd,kh,kw]
    if demodulate:
        d = jax.lax.rsqrt(jnp.sum(w * w, axis=(2, 3, 4, 5)) + 1e-8)  # [B,O]
        w = w * d.reshape(B, O, 1, 1, 1, 1)
    # DHWIO kernel layout per sample
    w = jnp.transpose(w, (0, 3, 4, 5, 2, 1))  # [B, kd, kh, kw, I, O]
    out_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)

    def conv_one(xi, wi):
        return jax.lax.conv_general_dilated(
            xi[None], wi, window_strides=(1, 1, 1),
            padding=[(padding, padding)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]

    return jax.vmap(conv_one)(x, w).astype(out_dtype)


class SynthesisLayer(nn.Module):
    """Modulated conv + upsample + noise + lrelu w/ clamp
    (stylegan_3dconv_modules.py:253-284)."""
    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    upsample: bool = False
    activation: str = "lrelu"
    conv_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, w, noise_mode: str = "random", gain: float = 1.0):
        styles = FullyConnectedLayer(self.in_channels, bias_init=1.0,
                                     name="affine")(w)
        weight = self.param(
            "weight", nn.initializers.normal(1.0),
            (self.out_channels, self.in_channels,
             self.kernel_size, self.kernel_size, self.kernel_size))
        noise_strength = self.param("noise_strength", nn.initializers.zeros,
                                    (1,))
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))

        x = modulated_conv3d(x, weight, styles,
                             padding=self.kernel_size // 2,
                             compute_dtype=self.conv_dtype)
        if self.upsample:
            x = upsample_3d_align_corners(x, 2)
        if noise_mode == "random" and self.has_rng("noise"):
            key = self.make_rng("noise")
            r = self.resolution
            noise = jax.random.normal(
                key, (x.shape[0], r, r, r, 1)) * noise_strength[0]
            x = x + noise
        fn, act_gain = _ACT[self.activation]
        return clamp_gain(fn(x + bias), act_gain * gain, 256.0 * gain)


class ToRGBLayer(nn.Module):
    """1x1 modulated conv (no demod) to output channels
    (stylegan_3dconv_modules.py:237-251)."""
    in_channels: int
    out_channels: int
    w_dim: int
    kernel_size: int = 1
    conv_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, w):
        weight_gain = 1 / math.sqrt(self.in_channels) * self.kernel_size ** 3
        styles = FullyConnectedLayer(self.in_channels, bias_init=1.0,
                                     name="affine")(w) * weight_gain
        weight = self.param(
            "weight", nn.initializers.normal(1.0),
            (self.out_channels, self.in_channels,
             self.kernel_size, self.kernel_size, self.kernel_size))
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        x = modulated_conv3d(x, weight, styles, demodulate=False,
                             compute_dtype=self.conv_dtype)
        return x + bias


class SynthesisPrologue(nn.Module):
    """Learned 4³ const volume + first conv + torgb
    (stylegan_3dconv_modules.py:176-195)."""
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    conv_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, ws, noise_mode="random"):
        const = self.param(
            "const", nn.initializers.normal(1.0),
            (self.resolution, self.resolution, self.resolution,
             self.out_channels))
        B = ws.shape[0]
        x = jnp.broadcast_to(const[None], (B, *const.shape))
        x = SynthesisLayer(self.out_channels, self.out_channels,
                           self.w_dim, self.resolution,
                           conv_dtype=self.conv_dtype,
                           name="conv1")(x, ws[:, 0], noise_mode)
        img = ToRGBLayer(self.out_channels, self.img_channels, self.w_dim,
                         conv_dtype=self.conv_dtype,
                         name="torgb")(x, ws[:, 1])
        return x, img


class SynthesisBlock(nn.Module):
    """Upsampling block: conv0(up) + conv1 + torgb skip
    (stylegan_3dconv_modules.py:198-235)."""
    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    use_const_bias: bool = False
    conv_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, img, ws, noise_mode="random"):
        x = SynthesisLayer(self.in_channels, self.out_channels, self.w_dim,
                           self.resolution, upsample=True,
                           conv_dtype=self.conv_dtype,
                           name="conv0")(x, ws[:, 0], noise_mode)
        if self.use_const_bias:
            const_bias = self.param(
                "const_bias",
                lambda k, s: jax.random.normal(k, s) / math.sqrt(
                    self.out_channels),
                (self.resolution, self.resolution, self.resolution,
                 self.out_channels))
            x = x + const_bias[None]
        x = SynthesisLayer(self.out_channels, self.out_channels, self.w_dim,
                           self.resolution, conv_dtype=self.conv_dtype,
                           name="conv1")(x, ws[:, 1], noise_mode)
        y = ToRGBLayer(self.out_channels, self.img_channels, self.w_dim,
                       conv_dtype=self.conv_dtype,
                       name="torgb")(x, ws[:, 2])
        img = upsample_3d_align_corners(img, 2) + y
        return x, img


class SynthesisNetwork3D(nn.Module):
    """4³ -> img_resolution³ pyramid (stylegan_3dconv_modules.py:117-174)."""
    w_dim: int
    img_resolution: int
    img_channels: int
    channel_multiplier: int = 1
    bias_resolution: int = 64
    # bf16 conv compute (MXU-native; modulation/demod stay f32); None = f32
    conv_dtype: Optional[str] = None
    # Proportional scale of the reference channel pyramid (512 -> parity
    # with stylegan_3dconv_modules.py:130-138). Tests shrink this so
    # "tiny" conv3d nets are actually tiny — with the default, even a 8^3
    # generator runs 512-channel conv3ds.
    channel_base: int = 512

    @property
    def block_resolutions(self):
        return [2 ** i for i in range(2, int(np.log2(self.img_resolution)) + 1)]

    @property
    def num_ws(self):
        return 2 + 3 * (len(self.block_resolutions) - 1)

    def _channels(self, res):
        base = {4: 512, 8: 512, 16: 512, 32: 256, 64: 128, 128: 64, 256: 32}
        mult = 1 if res <= 16 else self.channel_multiplier
        return max(1, base[res] * self.channel_base // 512) * mult

    @nn.compact
    def __call__(self, ws, noise_mode="random"):
        res0 = self.block_resolutions[0]
        x, img = SynthesisPrologue(
            self._channels(res0), w_dim=self.w_dim, resolution=res0,
            img_channels=self.img_channels, conv_dtype=self.conv_dtype,
            name="first_block")(ws[:, 0:2], noise_mode)
        w_idx = 1
        for i, res in enumerate(self.block_resolutions[1:]):
            block = SynthesisBlock(
                self._channels(res // 2), self._channels(res),
                w_dim=self.w_dim, resolution=res,
                img_channels=self.img_channels,
                use_const_bias=res <= self.bias_resolution,
                conv_dtype=self.conv_dtype,
                name=f"blocks_{i}")
            x, img = block(x, img, ws[:, 2 * w_idx - 1: 2 * w_idx + 2],
                           noise_mode)
            w_idx += 1
        return img


class Generator3D(nn.Module):
    """Mapping + synthesis (stylegan_3dconv_modules.py:85-115)."""
    z_dim: int = 64
    w_dim: int = 256
    c_dim: int = 1024
    num_layers: int = 2
    img_resolution: int = 128
    img_channels: int = 32
    channel_multiplier: int = 1
    bias_resolution: int = 64
    channel_base: int = 512
    conv_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, z, c=None, truncation_psi=1.0,
                 noise_mode: str = "random", return_w: bool = False,
                 unconditional: bool = False):
        synthesis = SynthesisNetwork3D(
            w_dim=self.w_dim, img_resolution=self.img_resolution,
            img_channels=self.img_channels,
            channel_multiplier=self.channel_multiplier,
            bias_resolution=self.bias_resolution,
            channel_base=self.channel_base, conv_dtype=self.conv_dtype,
            name="synthesis")
        mapping = MappingNetwork(
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim,
            num_ws=synthesis.num_ws, num_layers=self.num_layers,
            name="mapping")
        if return_w:
            ws, w = mapping(z, c, truncation_psi, return_w=True,
                            unconditional=unconditional)
            return synthesis(ws, noise_mode), w
        ws = mapping(z, c, truncation_psi, unconditional=unconditional)
        return synthesis(ws, noise_mode)
