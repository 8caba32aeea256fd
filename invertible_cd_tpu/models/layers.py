"""Shared Flax building blocks for the SD UNet and VAE (NHWC, TPU layouts).

TPU-first reimplementation of the functionality the reference gets from
diffusers' torch modules (ResnetBlock2D, Timesteps, TimestepEmbedding,
Downsample2D/Upsample2D). All convs are NHWC so XLA tiles them directly onto
the MXU; GroupNorm statistics are computed in float32 regardless of the
compute dtype.
"""
from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.quant import quant_conv_general_dilated, quant_dot_general

# Quantization-aware Dense/Conv: identical to nn.Dense/nn.Conv (same
# class, same param tree, bit-identical programs) except that inside an
# `ops.quant.quant_scope("int8")` their matmul/conv runs int8 on the MXU
# (2x bf16 peak on v5e). Every layer of the UNet/VAE stacks uses these;
# CLIP deliberately does not (text encoding is ~4% of a generate call —
# not worth any fidelity risk).
QDense = functools.partial(nn.Dense, dot_general=quant_dot_general)
QConv = functools.partial(nn.Conv, conv_general_dilated=quant_conv_general_dilated)


def sinusoidal_timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
    dtype=jnp.float32,
) -> jax.Array:
    """Sinusoidal timestep features (diffusers `Timesteps` semantics; SD uses
    flip_sin_to_cos=True, shift=0).

    Args:
      timesteps: (B,) int or float timesteps.
    Returns:
      (B, dim) embedding.
    """
    half_dim = dim // 2
    exponent = -np.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = jnp.asarray(timesteps, jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb.astype(dtype)


class _GroupNormCore(nn.Module):
    """GroupNorm with fp32 statistics but NO fp32 activation materialisation
    and NO activation relayout.

    Two layout rules, both profile-driven (tools/profile_ops.py):
      * never write an fp32 copy of the activation to HBM (the casts fuse
        into the reductions / the final elementwise);
      * never reshape the activation to (..., groups, C/groups): C/groups
        is 10 (UNet) or 4 (VAE) — putting that on the 128-wide lane dim
        relayouts the whole feature map and ran the statistics reductions
        at ~26 GB/s. Instead reduce per-CHANNEL moments over space (lane
        dim stays C), then group-sum the tiny (B, C) result and broadcast
        per-channel affine coefficients back — the big tensor is touched
        exactly twice, in its native NHWC layout.

    Variance uses E[x^2] - E[x]^2 in fp32 — for bf16 activations of O(10)
    magnitude over <=512^2 elements this is well inside the bf16 input
    quantisation error (differential-tested vs torch GroupNorm in
    tests/test_unet_vae_parity.py)."""

    groups: int
    epsilon: float

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        b = x.shape[0]
        gc = c // self.groups
        # NOTE (all measured on the real batch-16 VAE decode, r3): this
        # form is at the program's speed of light — the decode's XLA cost
        # model says 39.5 TFLOP / 60 GB, a 200.6 ms compute-bound floor,
        # and the stage measures 266 ms (75% MFU). Variants that did NOT
        # help and should not be retried: optimization_barrier before the
        # stats (300 -> 316 ms), a two-stage blocked reduction (302 ms),
        # and reducing the native NHWC axes without the (B, HW, C)
        # reshape (299 ms — XLA already folds the reshape).
        xf = x.reshape(b, -1, c).astype(jnp.float32)  # fuses into reduces
        n = xf.shape[1] * gc  # elements per group
        s1 = jnp.sum(xf, axis=1)                      # (B, C)
        s2 = jnp.sum(jnp.square(xf), axis=1)          # (B, C)
        gs1 = s1.reshape(b, self.groups, gc).sum(-1)  # (B, G) — tiny
        gs2 = s2.reshape(b, self.groups, gc).sum(-1)
        mean = gs1 / n
        var = jnp.maximum(gs2 / n - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)
        # per-channel affine: broadcast group stats back to C, fold scale
        mean_c = jnp.repeat(mean, gc, axis=1)         # (B, C)
        inv_c = jnp.repeat(inv, gc, axis=1)
        a = inv_c * scale[None, :]
        bb = bias[None, :] - mean_c * a
        bshape = (b,) + (1,) * (xf.ndim - 2) + (c,)
        y = xf * a.reshape(bshape) + bb.reshape(bshape)
        return y.reshape(x.shape).astype(x.dtype)


class GroupNorm32(nn.Module):
    """GroupNorm with float32 statistics (cast back to the compute dtype).

    Parameters live under `GroupNorm_0/{scale,bias}` — the layout the
    torch converters (`models/convert.py`) produce."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        channels = x.shape[-1]
        # Real SD channel counts are all multiples of 32; tiny test configs
        # aren't — fall back to the largest divisor <= num_groups.
        groups = self.num_groups
        while channels % groups != 0:
            groups -= 1
        return _GroupNormCore(groups, self.epsilon, name="GroupNorm_0")(x)


class TimestepEmbedding(nn.Module):
    """Two-layer MLP over timestep features, with the optional guidance
    conditioning projection (`cond_proj`) used by iCD's w-embedding
    (reference relies on diffusers `time_cond_proj_dim=512`,
    `utils/loading.py:48-50`)."""

    embed_dim: int
    cond_proj_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jax.Array, condition: Optional[jax.Array] = None):
        if condition is not None:
            if self.cond_proj_dim is None:
                raise ValueError("w-embedding passed but cond_proj_dim is unset")
            cond = QDense(
                sample.shape[-1], use_bias=False, dtype=self.dtype, name="cond_proj"
            )(condition)
            sample = sample + cond
        h = QDense(self.embed_dim, dtype=self.dtype, name="linear_1")(sample)
        h = nn.silu(h)
        h = QDense(self.embed_dim, dtype=self.dtype, name="linear_2")(h)
        return h


class ResnetBlock2D(nn.Module):
    """GN -> silu -> conv3x3 -> (+time bias) -> GN -> silu -> conv3x3 + skip.

    norm_eps: 1e-5 in the diffusers UNet, 1e-6 in the diffusers VAE."""

    out_channels: int
    use_conv_shortcut: bool = False  # SD uses 1x1 conv shortcut when C changes
    groups: int = 32
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, temb: Optional[jax.Array] = None):
        residual = x
        h = GroupNorm32(self.groups, epsilon=self.norm_eps, name="norm1",
                        dtype=self.dtype)(x)
        h = nn.silu(h)
        h = QConv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv1",
        )(h)
        if temb is not None:
            t = QDense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, None, None, :]
        h = GroupNorm32(self.groups, epsilon=self.norm_eps, name="norm2",
                        dtype=self.dtype)(h)
        h = nn.silu(h)
        h = QConv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv2",
        )(h)
        if residual.shape[-1] != self.out_channels:
            residual = QConv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(residual)
        return h + residual


class Downsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # diffusers pads asymmetrically (0,1,0,1) for stride-2 conv.
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return QConv(
            self.out_channels, (3, 3), strides=(2, 2), padding="VALID",
            dtype=self.dtype, name="conv",
        )(x)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return QConv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv",
        )(x)


class GEGLU(nn.Module):
    """Gated GELU feed-forward input projection (SD transformer FF)."""

    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = QDense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        h = GEGLU(dim * self.mult, dtype=self.dtype, name="net_0")(x)
        return QDense(dim, dtype=self.dtype, name="net_2")(h)
