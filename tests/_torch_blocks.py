"""Hand-written torch recomputations of the diffusers block semantics.

diffusers is NOT installed in this container, so these modules re-derive
each block from its published math (the reference consumes them via
`diffusers.UNet2DConditionModel` / `AutoencoderKL`, reference
`utils/loading.py:27-147`). They are the differential oracle for the
Flax models + weight converters: attribute names are chosen so that
`state_dict()` produces exactly the diffusers key layout the converters
in `invertible_cd_tpu/models/convert.py` expect.

NOT copied from diffusers — written from the block definitions:
  * ResnetBlock2D: GN -> SiLU -> conv3x3 -> (+time proj) -> GN -> SiLU -> conv3x3, skip (+1x1)
  * Timesteps: sinusoidal features, flip_sin_to_cos
  * TimestepEmbedding: (+cond_proj) -> linear_1 -> SiLU -> linear_2
  * Attention: to_q/k/v (no bias in UNet, bias in VAE), softmax(QK^T/sqrt(d))V, to_out.0
  * BasicTransformerBlock: LN -> self-attn -> LN -> cross-attn -> LN -> GEGLU FF (all residual)
  * Transformer2D: GN(eps 1e-6) -> proj_in -> blocks -> proj_out, + residual
  * Downsample2D: asymmetric (0,1,0,1) pad + stride-2 conv; Upsample2D: nearest x2 + conv3x3
  * VAE Encoder/Decoder/mid attention, quant/post_quant conv
"""
from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class Timesteps(nn.Module):
    def __init__(self, dim: int, flip_sin_to_cos: bool = True, freq_shift: float = 0.0):
        super().__init__()
        self.dim = dim
        self.flip_sin_to_cos = flip_sin_to_cos
        self.freq_shift = freq_shift

    def forward(self, t):
        half = self.dim // 2
        exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
        exponent = exponent / (half - self.freq_shift)
        freqs = torch.exp(exponent)
        args = t.float()[:, None] * freqs[None, :]
        emb = torch.cat([torch.sin(args), torch.cos(args)], dim=-1)
        if self.flip_sin_to_cos:
            emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
        return emb


class TimestepEmbedding(nn.Module):
    def __init__(self, in_dim: int, embed_dim: int, cond_proj_dim=None):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, embed_dim)
        self.linear_2 = nn.Linear(embed_dim, embed_dim)
        if cond_proj_dim is not None:
            self.cond_proj = nn.Linear(cond_proj_dim, in_dim, bias=False)
        else:
            self.cond_proj = None

    def forward(self, sample, condition=None):
        if condition is not None:
            sample = sample + self.cond_proj(condition)
        return self.linear_2(F.silu(self.linear_1(sample)))


class ResnetBlock2D(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, temb_dim=None, groups: int = 32,
                 eps: float = 1e-5):
        super().__init__()
        while in_ch % groups or out_ch % groups:
            groups -= 1
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = nn.Linear(temb_dim, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)
        else:
            self.conv_shortcut = None

    def forward(self, x, temb=None):
        residual = x
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            residual = self.conv_shortcut(residual)
        return h + residual


class Attention(nn.Module):
    def __init__(self, dim: int, heads: int, context_dim=None, qkv_bias: bool = False):
        super().__init__()
        ctx = dim if context_dim is None else context_dim
        self.heads = heads
        self.to_q = nn.Linear(dim, dim, bias=qkv_bias)
        self.to_k = nn.Linear(ctx, dim, bias=qkv_bias)
        self.to_v = nn.Linear(ctx, dim, bias=qkv_bias)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def forward(self, x, context=None):
        ctx = x if context is None else context
        b, sq, dim = x.shape
        h = self.heads
        d = dim // h
        q = self.to_q(x).view(b, sq, h, d).transpose(1, 2)
        k = self.to_k(ctx).view(b, ctx.shape[1], h, d).transpose(1, 2)
        v = self.to_v(ctx).view(b, ctx.shape[1], h, d).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(d), dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, sq, dim)
        return self.to_out[0](out)


class GEGLU(nn.Module):
    def __init__(self, dim: int, inner: int):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)


class FeedForward(nn.Module):
    def __init__(self, dim: int, mult: int = 4):
        super().__init__()
        self.net = nn.ModuleList([GEGLU(dim, dim * mult), nn.Identity(), nn.Linear(dim * mult, dim)])

    def forward(self, x):
        return self.net[2](self.net[0](x))


class BasicTransformerBlock(nn.Module):
    def __init__(self, dim: int, heads: int, context_dim: int):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = Attention(dim, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = Attention(dim, heads, context_dim=context_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = FeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff(self.norm3(x))
        return x


class Transformer2DModel(nn.Module):
    def __init__(self, dim: int, heads: int, context_dim: int, depth: int = 1,
                 use_linear_projection: bool = False, groups: int = 32):
        super().__init__()
        while dim % groups:
            groups -= 1
        self.use_linear_projection = use_linear_projection
        self.norm = nn.GroupNorm(groups, dim, eps=1e-6)
        if use_linear_projection:
            self.proj_in = nn.Linear(dim, dim)
            self.proj_out = nn.Linear(dim, dim)
        else:
            self.proj_in = nn.Conv2d(dim, dim, 1)
            self.proj_out = nn.Conv2d(dim, dim, 1)
        self.transformer_blocks = nn.ModuleList(
            [BasicTransformerBlock(dim, heads, context_dim) for _ in range(depth)]
        )

    def forward(self, x, context):
        b, c, h, w = x.shape
        residual = x
        hidden = self.norm(x)
        if self.use_linear_projection:
            hidden = hidden.permute(0, 2, 3, 1).reshape(b, h * w, c)
            hidden = self.proj_in(hidden)
        else:
            hidden = self.proj_in(hidden)
            hidden = hidden.permute(0, 2, 3, 1).reshape(b, h * w, c)
        for block in self.transformer_blocks:
            hidden = block(hidden, context)
        if self.use_linear_projection:
            hidden = self.proj_out(hidden)
            hidden = hidden.reshape(b, h, w, c).permute(0, 3, 1, 2)
        else:
            hidden = hidden.reshape(b, h, w, c).permute(0, 3, 1, 2)
            hidden = self.proj_out(hidden)
        return hidden + residual


class Downsample2D(nn.Module):
    def __init__(self, ch: int):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)

    def forward(self, x):
        x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class Upsample2D(nn.Module):
    def __init__(self, ch: int):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


# ---------------------------------------------------------------------------
# Full UNet at the package's UNetConfig geometry, diffusers state-dict naming
# ---------------------------------------------------------------------------


class DownBlock(nn.Module):
    def __init__(self, cfg, level: int, in_ch: int, temb_dim: int, add_downsample: bool):
        super().__init__()
        out_ch = cfg.block_out_channels[level]
        self.resnets = nn.ModuleList()
        self.has_attn = cfg.cross_attn_blocks[level]
        if self.has_attn:
            self.attentions = nn.ModuleList()
        ch = in_ch
        for _ in range(cfg.layers_per_block):
            self.resnets.append(ResnetBlock2D(ch, out_ch, temb_dim))
            ch = out_ch
            if self.has_attn:
                self.attentions.append(
                    Transformer2DModel(
                        out_ch, cfg.num_heads[level], cfg.cross_attention_dim,
                        depth=cfg.transformer_depth[level],
                        use_linear_projection=cfg.use_linear_projection,
                    )
                )
        if add_downsample:
            self.downsamplers = nn.ModuleList([Downsample2D(out_ch)])
        else:
            self.downsamplers = None

    def forward(self, x, temb, context):
        skips = []
        for i, resnet in enumerate(self.resnets):
            x = resnet(x, temb)
            if self.has_attn:
                x = self.attentions[i](x, context)
            skips.append(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            skips.append(x)
        return x, skips


class MidBlock(nn.Module):
    def __init__(self, cfg, temb_dim: int):
        super().__init__()
        ch = cfg.block_out_channels[-1]
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(ch, ch, temb_dim), ResnetBlock2D(ch, ch, temb_dim)]
        )
        self.attentions = nn.ModuleList(
            [Transformer2DModel(
                ch, cfg.num_heads[-1], cfg.cross_attention_dim,
                depth=cfg.transformer_depth[-1],
                use_linear_projection=cfg.use_linear_projection,
            )]
        )

    def forward(self, x, temb, context):
        x = self.resnets[0](x, temb)
        x = self.attentions[0](x, context)
        x = self.resnets[1](x, temb)
        return x


class UpBlock(nn.Module):
    def __init__(self, cfg, level: int, in_ch: int, skip_chs, temb_dim: int, add_upsample: bool):
        super().__init__()
        out_ch = cfg.block_out_channels[level]
        self.resnets = nn.ModuleList()
        self.has_attn = cfg.cross_attn_blocks[level]
        if self.has_attn:
            self.attentions = nn.ModuleList()
        ch = in_ch
        for i in range(cfg.layers_per_block + 1):
            self.resnets.append(ResnetBlock2D(ch + skip_chs[i], out_ch, temb_dim))
            ch = out_ch
            if self.has_attn:
                self.attentions.append(
                    Transformer2DModel(
                        out_ch, cfg.num_heads[level], cfg.cross_attention_dim,
                        depth=cfg.transformer_depth[level],
                        use_linear_projection=cfg.use_linear_projection,
                    )
                )
        if add_upsample:
            self.upsamplers = nn.ModuleList([Upsample2D(out_ch)])
        else:
            self.upsamplers = None

    def forward(self, x, skips, temb, context):
        for i, resnet in enumerate(self.resnets):
            x = torch.cat([x, skips.pop()], dim=1)
            x = resnet(x, temb)
            if self.has_attn:
                x = self.attentions[i](x, context)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class UNet2DConditionModel(nn.Module):
    """Mirrors invertible_cd_tpu.models.UNet2DCondition at any UNetConfig,
    with diffusers attribute naming (state_dict keys feed the converter)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        temb_dim = cfg.time_embed_dim
        c0 = cfg.block_out_channels[0]
        self.time_proj = Timesteps(c0, cfg.flip_sin_to_cos, cfg.freq_shift)
        self.time_embedding = TimestepEmbedding(c0, temb_dim, cfg.time_cond_proj_dim)
        if cfg.addition_embed_dim is not None:
            self.add_time_proj = Timesteps(
                cfg.addition_time_embed_dim, cfg.flip_sin_to_cos, cfg.freq_shift
            )
            self.add_embedding = TimestepEmbedding(cfg.addition_embed_dim, temb_dim)
        self.conv_in = nn.Conv2d(cfg.in_channels, c0, 3, padding=1)

        n = len(cfg.block_out_channels)
        self.down_blocks = nn.ModuleList()
        ch = c0
        skip_chs = [c0]
        for level in range(n):
            block = DownBlock(self.cfg, level, ch, temb_dim, add_downsample=level < n - 1)
            self.down_blocks.append(block)
            ch = cfg.block_out_channels[level]
            skip_chs.extend([ch] * cfg.layers_per_block)
            if level < n - 1:
                skip_chs.append(ch)
        self.mid_block = MidBlock(self.cfg, temb_dim)
        self.up_blocks = nn.ModuleList()
        for i, level in enumerate(reversed(range(n))):
            skips_here = [skip_chs.pop() for _ in range(cfg.layers_per_block + 1)]
            block = UpBlock(self.cfg, level, ch, skips_here, temb_dim, add_upsample=i < n - 1)
            self.up_blocks.append(block)
            ch = cfg.block_out_channels[level]
        groups = 32
        while c0 % groups:
            groups -= 1
        self.conv_norm_out = nn.GroupNorm(groups, c0, eps=1e-5)
        self.conv_out = nn.Conv2d(c0, cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, context, w_cond=None, added_cond=None):
        b = sample.shape[0]
        timesteps = torch.broadcast_to(torch.as_tensor(timesteps), (b,))
        temb = self.time_embedding(self.time_proj(timesteps), w_cond)
        if self.cfg.addition_embed_dim is not None:
            tid = self.add_time_proj(added_cond["time_ids"].reshape(-1)).reshape(b, -1)
            add_feat = torch.cat([added_cond["text_embeds"], tid], dim=-1)
            temb = temb + self.add_embedding(add_feat)
        x = self.conv_in(sample)
        skips = [x]
        for block in self.down_blocks:
            x, new = block(x, temb, context)
            skips.extend(new)
        x = self.mid_block(x, temb, context)
        for block in self.up_blocks:
            x = block(x, skips, temb, context)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


# ---------------------------------------------------------------------------
# VAE (AutoencoderKL), diffusers state-dict naming
# ---------------------------------------------------------------------------


class VAEAttention(nn.Module):
    def __init__(self, ch: int, groups: int = 32):
        super().__init__()
        while ch % groups:
            groups -= 1
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        b, c, h, w = x.shape
        residual = x
        hidden = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(hidden), self.to_k(hidden), self.to_v(hidden)
        attn = torch.softmax(q @ k.transpose(-1, -2) / math.sqrt(c), dim=-1)
        out = self.to_out[0](attn @ v)
        return out.reshape(b, h, w, c).permute(0, 3, 1, 2) + residual


class VAEDownBlock(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, num_layers: int, add_downsample: bool):
        super().__init__()
        self.resnets = nn.ModuleList()
        ch = in_ch
        for _ in range(num_layers):
            self.resnets.append(ResnetBlock2D(ch, out_ch, None, eps=1e-6))
            ch = out_ch
        if add_downsample:
            self.downsamplers = nn.ModuleList([Downsample2D(out_ch)])
        else:
            self.downsamplers = None

    def forward(self, x):
        for resnet in self.resnets:
            x = resnet(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class VAEUpBlock(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, num_layers: int, add_upsample: bool):
        super().__init__()
        self.resnets = nn.ModuleList()
        ch = in_ch
        for _ in range(num_layers):
            self.resnets.append(ResnetBlock2D(ch, out_ch, None, eps=1e-6))
            ch = out_ch
        if add_upsample:
            self.upsamplers = nn.ModuleList([Upsample2D(out_ch)])
        else:
            self.upsamplers = None

    def forward(self, x):
        for resnet in self.resnets:
            x = resnet(x)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class VAEMidBlock(nn.Module):
    def __init__(self, ch: int):
        super().__init__()
        self.resnets = nn.ModuleList(
            [ResnetBlock2D(ch, ch, None, eps=1e-6), ResnetBlock2D(ch, ch, None, eps=1e-6)]
        )
        self.attentions = nn.ModuleList([VAEAttention(ch)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        x = self.resnets[1](x)
        return x


class VAEEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        chs = cfg.block_out_channels
        self.conv_in = nn.Conv2d(cfg.in_channels, chs[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        ch = chs[0]
        for i, out_ch in enumerate(chs):
            self.down_blocks.append(
                VAEDownBlock(ch, out_ch, cfg.layers_per_block, add_downsample=i < len(chs) - 1)
            )
            ch = out_ch
        self.mid_block = VAEMidBlock(chs[-1])
        groups = 32
        while chs[-1] % groups:
            groups -= 1
        self.conv_norm_out = nn.GroupNorm(groups, chs[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(chs[-1], 2 * cfg.latent_channels, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for block in self.down_blocks:
            x = block(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class VAEDecoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        chs = cfg.block_out_channels
        self.conv_in = nn.Conv2d(cfg.latent_channels, chs[-1], 3, padding=1)
        self.mid_block = VAEMidBlock(chs[-1])
        self.up_blocks = nn.ModuleList()
        ch = chs[-1]
        for i, out_ch in enumerate(reversed(chs)):
            self.up_blocks.append(
                VAEUpBlock(ch, out_ch, cfg.layers_per_block + 1, add_upsample=i < len(chs) - 1)
            )
            ch = out_ch
        groups = 32
        while chs[0] % groups:
            groups -= 1
        self.conv_norm_out = nn.GroupNorm(groups, chs[0], eps=1e-6)
        self.conv_out = nn.Conv2d(chs[0], cfg.out_channels, 3, padding=1)

    def forward(self, z):
        x = self.conv_in(z)
        x = self.mid_block(x)
        for block in self.up_blocks:
            x = block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class AutoencoderKL(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.encoder = VAEEncoder(cfg)
        self.decoder = VAEDecoder(cfg)
        self.quant_conv = nn.Conv2d(2 * cfg.latent_channels, 2 * cfg.latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(cfg.latent_channels, cfg.latent_channels, 1)

    def encode_moments(self, pixels):
        moments = self.quant_conv(self.encoder(pixels))
        mean, logvar = moments.chunk(2, dim=1)
        return mean, torch.clamp(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))
