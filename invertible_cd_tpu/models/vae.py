"""AutoencoderKL (SD / SDXL VAE) in Flax — latent codec, NHWC.

Replaces the diffusers VAE the reference uses for `image2latent` /
`latent2image` (reference `utils/generation.py:255-284`). Encode returns the
posterior mean (the reference always takes `.mean`, never samples); the
0.18215 / 0.13025 scaling lives in the pipelines, matching the reference's
placement (`generation.py:257,278`).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import fused_attention
from .layers import GroupNorm32, QConv, QDense, ResnetBlock2D, Upsample2D


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215

    @staticmethod
    def sd() -> "VAEConfig":
        return VAEConfig()

    @staticmethod
    def sdxl() -> "VAEConfig":
        return VAEConfig(scaling_factor=0.13025)

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(block_out_channels=(32, 32), layers_per_block=1)


class VAEAttention(nn.Module):
    """Single-head self-attention over the bottleneck feature map."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        hidden = GroupNorm32(32, epsilon=1e-6, name="group_norm", dtype=self.dtype)(x)
        hidden = hidden.reshape(b, h * w, c)
        q = QDense(c, dtype=self.dtype, name="to_q")(hidden)
        k = QDense(c, dtype=self.dtype, name="to_k")(hidden)
        v = QDense(c, dtype=self.dtype, name="to_v")(hidden)
        # Routed through fused_attention: this single d=512 head over h*w
        # tokens is exactly the shape whose XLA fallback materialises the
        # fp32 (Sq, Sk) probabilities (~1 GB at the SD1.5 batch-16
        # decode); on TPU it takes the streamed Pallas kernel instead
        # (ops/flash_attention.py).
        out = fused_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        out = QDense(c, dtype=self.dtype, name="to_out_0")(out)
        return out.reshape(b, h, w, c) + residual


class DownEncoderBlock(nn.Module):
    out_channels: int
    num_layers: int
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, norm_eps=1e-6, dtype=self.dtype, name=f"resnets_{i}")(x)
        if self.add_downsample:
            # diffusers VAE downsampler: asymmetric pad + stride-2 VALID conv.
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = QConv(
                self.out_channels, (3, 3), strides=(2, 2), padding="VALID",
                dtype=self.dtype, name="downsamplers_0",
            )(x)
        return x


class UpDecoderBlock(nn.Module):
    out_channels: int
    num_layers: int
    add_upsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, norm_eps=1e-6, dtype=self.dtype, name=f"resnets_{i}")(x)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x


class MidBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock2D(self.channels, norm_eps=1e-6, dtype=self.dtype, name="resnets_0")(x)
        x = VAEAttention(dtype=self.dtype, name="attentions_0")(x)
        x = ResnetBlock2D(self.channels, norm_eps=1e-6, dtype=self.dtype, name="resnets_1")(x)
        return x


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = QConv(
            cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv_in",
        )(x)
        n = len(cfg.block_out_channels)
        for i, ch in enumerate(cfg.block_out_channels):
            x = DownEncoderBlock(
                ch, cfg.layers_per_block, add_downsample=(i < n - 1),
                dtype=self.dtype, name=f"down_blocks_{i}",
            )(x)
        x = MidBlock(cfg.block_out_channels[-1], dtype=self.dtype, name="mid_block")(x)
        x = GroupNorm32(32, epsilon=1e-6, name="conv_norm_out", dtype=self.dtype)(x)
        x = nn.silu(x)
        x = QConv(
            2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv_out",
        )(x)
        return x


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        x = QConv(
            cfg.block_out_channels[-1], (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv_in",
        )(z)
        x = MidBlock(cfg.block_out_channels[-1], dtype=self.dtype, name="mid_block")(x)
        n = len(cfg.block_out_channels)
        for i, ch in enumerate(reversed(cfg.block_out_channels)):
            x = UpDecoderBlock(
                ch, cfg.layers_per_block + 1, add_upsample=(i < n - 1),
                dtype=self.dtype, name=f"up_blocks_{i}",
            )(x)
        x = GroupNorm32(32, epsilon=1e-6, name="conv_norm_out", dtype=self.dtype)(x)
        x = nn.silu(x)
        x = QConv(
            cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv_out",
        )(x)
        return x


class AutoencoderKL(nn.Module):
    """VAE with `encode_mean` (posterior mean) and `decode` entry points."""

    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, dtype=self.dtype)
        self.decoder = Decoder(self.cfg, dtype=self.dtype)
        self.quant_conv = QConv(
            2 * self.cfg.latent_channels, (1, 1), dtype=self.dtype, name="quant_conv"
        )
        self.post_quant_conv = QConv(
            self.cfg.latent_channels, (1, 1), dtype=self.dtype, name="post_quant_conv"
        )

    def encode_moments(self, pixels: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """pixels (B,H,W,3) in [-1,1] -> (mean, logvar), each (B,H/8,W/8,4)."""
        moments = self.quant_conv(self.encoder(pixels))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode_mean(self, pixels: jax.Array) -> jax.Array:
        return self.encode_moments(pixels)[0]

    def decode(self, latents: jax.Array) -> jax.Array:
        """latents (B,h,w,4), *unscaled* -> pixels (B,H,W,3) in [-1,1]-ish."""
        return self.decoder(self.post_quant_conv(latents))

    def __call__(self, pixels):  # for init
        mean, _ = self.encode_moments(pixels)
        return self.decode(mean)
