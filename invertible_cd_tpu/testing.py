"""Tiny model bundles for tests, dry runs and shape checks.

The reference has no tests (SURVEY.md §4); our test pyramid needs
fast-to-init miniature versions of the full pipeline. These use the same
module code paths as the real models — only the configs shrink.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .diffusion.schedule import make_schedule
from .diffusion.solver import make_solver_grid
from .models import (
    AutoencoderKL,
    CLIPTextConfig,
    CLIPTextModel,
    UNet2DCondition,
    UNetConfig,
    VAEConfig,
)
from .pipelines.pipeline import InvertibleCD
from .utils.tokenizer import HashTokenizer


def tiny_bundle_xl(
    seed: int = 0,
    latent_size: Tuple[int, int] = (16, 16),
    dtype=jnp.float32,
):
    """Miniature SDXL pipeline: dual tiny encoders, added-cond UNet."""
    from .pipelines.sdxl import InvertibleCDXL

    clip_cfg = CLIPTextConfig.tiny()
    clip2_cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
        intermediate_size=64, projection_dim=16,
    )
    unet_cfg = UNetConfig(
        block_out_channels=(32, 64),
        cross_attn_blocks=(False, True),
        layers_per_block=1,
        num_heads=(2, 2),
        transformer_depth=(1, 2),
        cross_attention_dim=64,
        use_linear_projection=True,
        time_cond_proj_dim=8,
        addition_embed_dim=16 + 6 * 8,
        addition_time_embed_dim=8,
    )
    vae_cfg = VAEConfig.tiny()
    unet = UNet2DCondition(unet_cfg, dtype=dtype)
    text = CLIPTextModel(clip_cfg, dtype=dtype)
    text2 = CLIPTextModel(clip2_cfg, dtype=dtype)
    vae = AutoencoderKL(vae_cfg, dtype=jnp.float32)
    tok = HashTokenizer(vocab_size=clip_cfg.vocab_size)

    h, w = latent_size
    k = jax.random.PRNGKey(seed)
    k_u, k_t, k_t2, k_v = jax.random.split(k, 4)
    sample = jnp.zeros((1, h, w, 4))
    ctx = jnp.zeros((1, 77, unet_cfg.cross_attention_dim))
    wv = jnp.zeros((1, unet_cfg.time_cond_proj_dim))
    added = {"text_embeds": jnp.zeros((1, 16)), "time_ids": jnp.zeros((1, 6))}
    u_params = unet.init(k_u, sample, jnp.zeros((1,), jnp.int32), ctx, wv, added)
    params = {
        "teacher": u_params,
        "reverse": u_params,
        "forward": u_params,
        "text": text.init(k_t, jnp.zeros((1, 77), jnp.int32)),
        "text_2": text2.init(k_t2, jnp.zeros((1, 77), jnp.int32)),
        "vae": vae.init(k_v, jnp.zeros((1, 2 * h, 2 * w, 3))),
    }
    return InvertibleCDXL(
        unet=unet, text_encoder=text, vae=vae, params=params, tokenizer=tok,
        schedule=make_schedule(),
        grid=make_solver_grid(
            reverse_timesteps=[259, 519, 779, 999],
            forward_timesteps=[19, 259, 519, 779],
        ),
        scaling_factor=vae_cfg.scaling_factor, latent_size=latent_size,
        text_encoder_2=text2, tokenizer_2=tok, default_resolution=32,
    )


def tiny_bundle(
    seed: int = 0,
    latent_size: Tuple[int, int] = (16, 16),
    dtype=jnp.float32,
    unet_cfg: "UNetConfig" = None,
) -> InvertibleCD:
    """A fully functional miniature InvertibleCD (random weights).

    UNet ~ 300k params, CLIP ~ 100k, VAE ~ 100k; pixels are 32x32 (the tiny
    VAE downsamples 2x). Initialisation is real (random, not zeros) so
    numerical tests exercise non-degenerate paths. `unet_cfg` overrides
    the default tiny config (e.g. cross-attention at EVERY level, which
    reproduces the real models' multi-resolution attention stores).
    """
    unet_cfg = unet_cfg or UNetConfig.tiny()
    clip_cfg = CLIPTextConfig.tiny()
    vae_cfg = VAEConfig.tiny()
    unet = UNet2DCondition(unet_cfg, dtype=dtype)
    text = CLIPTextModel(clip_cfg, dtype=dtype)
    vae = AutoencoderKL(vae_cfg, dtype=dtype)
    tok = HashTokenizer(vocab_size=clip_cfg.vocab_size)

    h, w = latent_size
    k = jax.random.PRNGKey(seed)
    k_u, k_t, k_v, k_r, k_f = jax.random.split(k, 5)
    sample = jnp.zeros((1, h, w, 4))
    ctx = jnp.zeros((1, 77, unet_cfg.cross_attention_dim))
    wv = jnp.zeros((1, unet_cfg.time_cond_proj_dim))
    u_params = unet.init(k_u, sample, jnp.zeros((1,), jnp.int32), ctx, wv)
    t_params = text.init(k_t, jnp.zeros((1, 77), jnp.int32))
    v_params = vae.init(k_v, jnp.zeros((1, 2 * h, 2 * w, 3)))

    def jitter(params, key):
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(key, len(leaves))
        return jax.tree.unflatten(
            treedef,
            [l + 0.01 * jax.random.normal(kk, l.shape, l.dtype)
             for l, kk in zip(leaves, keys)],
        )

    params = {
        "teacher": u_params,
        "reverse": jitter(u_params, k_r),
        "forward": jitter(u_params, k_f),
        "text": t_params,
        "vae": v_params,
    }
    return InvertibleCD(
        unet=unet,
        text_encoder=text,
        vae=vae,
        params=params,
        tokenizer=tok,
        schedule=make_schedule(),
        grid=make_solver_grid(
            reverse_timesteps=[259, 519, 779, 999],
            forward_timesteps=[19, 259, 519, 779],
        ),
        scaling_factor=vae_cfg.scaling_factor,
        latent_size=latent_size,
    )
