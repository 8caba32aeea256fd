"""UNet2DCondition in Flax — the denoiser for SD1.5 and SDXL, TPU-first.

Covers the capability surface the reference obtains from diffusers'
`UNet2DConditionModel` (reference `utils/loading.py:48-62,100-108`):
  * epsilon prediction conditioned on timestep + CLIP text context,
  * the iCD guidance w-embedding input (`time_cond_proj_dim=512`),
  * SDXL's added conditioning (pooled text embeds + time_ids), and
  * the p2p attention hook on every attention layer (see attention.py).

Design: NHWC activations, bf16 compute / fp32 params, GroupNorm in fp32.
The architecture is config-driven so one module family serves both SD1.5
(320/640/1280/1280, 8 heads, conv proj) and SDXL (320/640/1280, 5/10/20
heads, transformer depths 1/2/10, linear proj, addition embeddings).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .attention import AttnHook, Transformer2D
from .layers import (
    Downsample2D,
    GroupNorm32,
    QConv,
    QDense,
    ResnetBlock2D,
    TimestepEmbedding,
    Upsample2D,
    sinusoidal_timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Static architecture description (hashable; safe as a jit constant)."""

    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    # True where the down block at that level has cross-attention transformers.
    cross_attn_blocks: Tuple[bool, ...] = (True, True, True, False)
    layers_per_block: int = 2
    # Attention heads per level (diffusers `attention_head_dim` for SD1.5 is
    # the *number of heads* = 8; SDXL uses (5, 10, 20)).
    num_heads: Tuple[int, ...] = (8, 8, 8, 8)
    transformer_depth: Tuple[int, ...] = (1, 1, 1, 1)
    cross_attention_dim: int = 768
    use_linear_projection: bool = False
    time_cond_proj_dim: Optional[int] = None  # 512 for iCD w-embedding models
    # SDXL added conditioning: micro-conditioning time_ids + pooled text.
    addition_embed_dim: Optional[int] = None  # 2816 for SDXL
    addition_time_embed_dim: Optional[int] = None  # 256 for SDXL
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @staticmethod
    def sd15(w_embed_dim: Optional[int] = 512) -> "UNetConfig":
        return UNetConfig(time_cond_proj_dim=w_embed_dim)

    @staticmethod
    def sdxl(w_embed_dim: Optional[int] = 512) -> "UNetConfig":
        return UNetConfig(
            block_out_channels=(320, 640, 1280),
            cross_attn_blocks=(False, True, True),
            num_heads=(5, 10, 20),
            transformer_depth=(1, 2, 10),
            cross_attention_dim=2048,
            use_linear_projection=True,
            time_cond_proj_dim=w_embed_dim,
            addition_embed_dim=2816,
            addition_time_embed_dim=256,
        )

    @staticmethod
    def tiny(cross_attention_dim: int = 32, w_embed_dim: Optional[int] = 8) -> "UNetConfig":
        """Miniature config for tests and multi-chip dry runs."""
        return UNetConfig(
            block_out_channels=(32, 64),
            cross_attn_blocks=(True, False),
            layers_per_block=1,
            num_heads=(2, 2),
            transformer_depth=(1, 1),
            cross_attention_dim=cross_attention_dim,
            time_cond_proj_dim=w_embed_dim,
        )


class CrossAttnDownBlock(nn.Module):
    cfg: UNetConfig
    level: int
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, layer_counter, hook):
        cfg = self.cfg
        out_ch = cfg.block_out_channels[self.level]
        skips = []
        for i in range(cfg.layers_per_block):
            x = ResnetBlock2D(out_ch, dtype=self.dtype, name=f"resnets_{i}")(x, temb)
            if cfg.cross_attn_blocks[self.level]:
                x = Transformer2D(
                    cfg.num_heads[self.level],
                    depth=cfg.transformer_depth[self.level],
                    use_linear_projection=cfg.use_linear_projection,
                    dtype=self.dtype,
                    name=f"attentions_{i}",
                )(x, context, "down", layer_counter, hook)
            skips.append(x)
        if self.add_downsample:
            x = Downsample2D(out_ch, dtype=self.dtype, name="downsamplers_0")(x)
            skips.append(x)
        return x, skips


class UNetMidBlock(nn.Module):
    cfg: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, layer_counter, hook):
        cfg = self.cfg
        ch = cfg.block_out_channels[-1]
        x = ResnetBlock2D(ch, dtype=self.dtype, name="resnets_0")(x, temb)
        x = Transformer2D(
            cfg.num_heads[-1],
            depth=cfg.transformer_depth[-1],
            use_linear_projection=cfg.use_linear_projection,
            dtype=self.dtype,
            name="attentions_0",
        )(x, context, "mid", layer_counter, hook)
        x = ResnetBlock2D(ch, dtype=self.dtype, name="resnets_1")(x, temb)
        return x


class CrossAttnUpBlock(nn.Module):
    cfg: UNetConfig
    level: int
    add_upsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb, context, layer_counter, hook):
        cfg = self.cfg
        out_ch = cfg.block_out_channels[self.level]
        for i in range(cfg.layers_per_block + 1):
            skip = skips.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = ResnetBlock2D(out_ch, dtype=self.dtype, name=f"resnets_{i}")(x, temb)
            if cfg.cross_attn_blocks[self.level]:
                x = Transformer2D(
                    cfg.num_heads[self.level],
                    depth=cfg.transformer_depth[self.level],
                    use_linear_projection=cfg.use_linear_projection,
                    dtype=self.dtype,
                    name=f"attentions_{i}",
                )(x, context, "up", layer_counter, hook)
        if self.add_upsample:
            x = Upsample2D(out_ch, dtype=self.dtype, name="upsamplers_0")(x)
        return x


class UNet2DCondition(nn.Module):
    """The full conditional UNet.

    __call__ args:
      sample: (B, H, W, C) noisy latents (NHWC).
      timesteps: (B,) or scalar int timesteps.
      encoder_hidden_states: (B, S, cross_attention_dim) text context.
      w_cond: optional (B, time_cond_proj_dim) guidance embedding.
      added_cond: optional dict with "text_embeds" (B, 1280) and
        "time_ids" (B, 6) for SDXL.
      attn_hook: optional controller hook (see attention.AttnHook).
    Returns (B, H, W, out_channels) epsilon prediction.
    """

    cfg: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,
        timesteps: jax.Array,
        encoder_hidden_states: jax.Array,
        w_cond: Optional[jax.Array] = None,
        added_cond: Optional[dict] = None,
        attn_hook: Optional[AttnHook] = None,
    ) -> jax.Array:
        cfg = self.cfg
        b = sample.shape[0]
        timesteps = jnp.broadcast_to(jnp.asarray(timesteps), (b,))

        # Time (+ guidance) embedding.
        t_feat = sinusoidal_timestep_embedding(
            timesteps, cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos, downscale_freq_shift=cfg.freq_shift,
            dtype=self.dtype,
        )
        temb = TimestepEmbedding(
            cfg.time_embed_dim, cond_proj_dim=cfg.time_cond_proj_dim,
            dtype=self.dtype, name="time_embedding",
        )(t_feat, w_cond.astype(self.dtype) if w_cond is not None else None)

        # SDXL added conditioning (pooled text + micro-conditioning time ids).
        if cfg.addition_embed_dim is not None:
            assert added_cond is not None, "SDXL config requires added_cond"
            time_ids = added_cond["time_ids"].reshape(-1)
            tid_emb = sinusoidal_timestep_embedding(
                time_ids, cfg.addition_time_embed_dim,
                flip_sin_to_cos=cfg.flip_sin_to_cos,
                downscale_freq_shift=cfg.freq_shift, dtype=self.dtype,
            ).reshape(b, -1)
            add_feat = jnp.concatenate(
                [added_cond["text_embeds"].astype(self.dtype), tid_emb], axis=-1
            )
            temb = temb + TimestepEmbedding(
                cfg.time_embed_dim, dtype=self.dtype, name="add_embedding"
            )(add_feat)

        context = encoder_hidden_states.astype(self.dtype)
        layer_counter = [0]

        x = QConv(
            cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv_in",
        )(sample.astype(self.dtype))

        # Down path.
        skips = [x]
        num_levels = len(cfg.block_out_channels)
        for level in range(num_levels):
            x, new_skips = CrossAttnDownBlock(
                cfg, level, add_downsample=(level < num_levels - 1),
                dtype=self.dtype, name=f"down_blocks_{level}",
            )(x, temb, context, layer_counter, attn_hook)
            skips.extend(new_skips)

        # Mid.
        x = UNetMidBlock(cfg, dtype=self.dtype, name="mid_block")(
            x, temb, context, layer_counter, attn_hook
        )

        # Up path (reversed levels).
        for i, level in enumerate(reversed(range(num_levels))):
            x = CrossAttnUpBlock(
                cfg, level, add_upsample=(i < num_levels - 1),
                dtype=self.dtype, name=f"up_blocks_{i}",
            )(x, skips, temb, context, layer_counter, attn_hook)

        x = GroupNorm32(32, name="conv_norm_out", dtype=self.dtype)(x)
        x = nn.silu(x)
        x = QConv(
            cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv_out",
        )(x)
        return x.astype(jnp.float32)


def count_attention_layers(cfg: UNetConfig) -> int:
    """Total attention layers (self + cross) in traversal order — the
    reference's `controller.num_att_layers` (`utils/p2p.py:386`)."""
    n = 0
    levels = len(cfg.block_out_channels)
    for level in range(levels):
        if cfg.cross_attn_blocks[level]:
            n += cfg.layers_per_block * cfg.transformer_depth[level] * 2
    n += cfg.transformer_depth[-1] * 2  # mid
    for level in range(levels):
        if cfg.cross_attn_blocks[level]:
            n += (cfg.layers_per_block + 1) * cfg.transformer_depth[level] * 2
    return n
