"""Classifier-free guidance math: dynamic tau schedules, w-embedding, CFG mix.

Replaces the reference's duplicated guidance helpers
(`utils/generation.py:74-173`, `utils/generation_sdxl.py:84-132,313-321`,
`training/src/lcm.py:6-32`) with one traced-friendly module.

The reference branches on `t.item()` per step (host sync per UNet call,
`generation.py:229-231`). Here the schedules are pure `jnp.where` over the
traced timestep so the whole sampler stays on-device inside one jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def linear_schedule_old(t, guidance_scale, tau1: float, tau2: float):
    """Step/ramp schedule used for the *w-embedding* value when dynamic guidance
    is on (reference `utils/generation.py:74-82`).

    gamma = 1 for t/1000 <= tau1, 0 for t/1000 >= tau2, linear in between;
    returns gamma * guidance_scale. When tau1 == tau2 this is a step function.
    """
    tn = jnp.asarray(t, jnp.float32) / 1000.0
    gamma = jnp.where(
        tn <= tau1,
        1.0,
        jnp.where(tn >= tau2, 0.0, (tau2 - tn) / jnp.maximum(tau2 - tau1, 1e-12)),
    )
    return gamma * guidance_scale


def linear_schedule(t, guidance_scale, tau1: float = 0.4, tau2: float = 0.8):
    """Ramp from full guidance down to 1.0 used for explicit CFG mixing when
    dynamic guidance is on (reference `utils/generation.py:85-93`)."""
    tn = jnp.asarray(t, jnp.float32) / 1000.0
    mid = (tau2 - tn) / jnp.maximum(tau2 - tau1, 1e-12) * (guidance_scale - 1.0) + 1.0
    return jnp.where(tn <= tau1, guidance_scale, jnp.where(tn >= tau2, 1.0, mid))


def guidance_scale_embedding(w, embedding_dim: int = 512, dtype=jnp.float32):
    """Sinusoidal embedding of the guidance scale, scaled by 1000
    (reference `utils/generation.py:96-122`; origin: LCM / google-research/vdm).

    Args:
      w: (B,) guidance scales.
    Returns:
      (B, embedding_dim) [sin || cos] features.
    """
    w = jnp.asarray(w, dtype) * 1000.0
    half_dim = embedding_dim // 2
    freq = jnp.exp(
        jnp.arange(half_dim, dtype=dtype) * (-np.log(10000.0) / (half_dim - 1))
    )
    emb = w[:, None] * freq[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def cfg_combine(
    noise_pred_text,
    noise_pred_uncond,
    t,
    guidance_scale,
    dynamic_guidance: bool = False,
    tau1: float = 0.4,
    tau2: float = 0.6,
):
    """Classic CFG mix, optionally with the dynamic (new) linear schedule
    (reference `guided_step`, `utils/generation.py:158-173`)."""
    if dynamic_guidance:
        scale = linear_schedule(t, guidance_scale, tau1=tau1, tau2=tau2)
    else:
        scale = jnp.asarray(guidance_scale, jnp.float32)
    return noise_pred_uncond + scale * (noise_pred_text - noise_pred_uncond)
