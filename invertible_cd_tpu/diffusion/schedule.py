"""Noise schedule for the latent diffusion models (DDPM/DDIM, scaled-linear betas).

TPU-native reimplementation of the scheduler surface the reference relies on
(diffusers `DDIMScheduler(beta_start=0.00085, beta_end=0.012,
beta_schedule="scaled_linear", clip_sample=False, set_alpha_to_one=False)`,
see reference `utils/loading.py:39-40`).

Everything here is pure jnp on static arrays: the schedule is precomputed once
on host as float64 numpy for accuracy and carried as a frozen pytree of
float32 device arrays. All indexing with traced integer timesteps is a gather,
which XLA compiles into a single dynamic-slice — no host synchronisation.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Precomputed diffusion schedule tables.

    Attributes:
      betas: (T,) beta_t.
      alphas_cumprod: (T,) prod_{i<=t} (1 - beta_i).
      sqrt_alphas_cumprod: (T,) alpha_t in consistency-model notation.
      sqrt_one_minus_alphas_cumprod: (T,) sigma_t in CM notation.
      final_alpha_cumprod: scalar; alphas_cumprod[0] (`set_alpha_to_one=False`).
      num_train_timesteps: static int T (metadata, not traced).
    """

    betas: jax.Array
    alphas_cumprod: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    final_alpha_cumprod: jax.Array
    num_train_timesteps: int = dataclasses.field(metadata=dict(static=True))


def make_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    dtype=jnp.float32,
) -> NoiseSchedule:
    """Build the schedule tables (host-side, float64 accumulation)."""
    if beta_schedule == "scaled_linear":
        betas = (
            np.linspace(
                beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64
            )
            ** 2
        )
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    else:
        raise ValueError(f"Unsupported beta schedule: {beta_schedule}")
    alphas_cumprod = np.cumprod(1.0 - betas)
    return NoiseSchedule(
        betas=jnp.asarray(betas, dtype),
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype),
        sqrt_alphas_cumprod=jnp.asarray(np.sqrt(alphas_cumprod), dtype),
        sqrt_one_minus_alphas_cumprod=jnp.asarray(np.sqrt(1.0 - alphas_cumprod), dtype),
        final_alpha_cumprod=jnp.asarray(alphas_cumprod[0], dtype),
        num_train_timesteps=num_train_timesteps,
    )


def extract(table: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather `table[t]` and reshape to broadcast over an `ndim`-D sample.

    `t` has shape (B,) (or scalar); result has shape (B, 1, ..., 1).
    """
    t = jnp.asarray(t)
    out = jnp.take(table, t, axis=-1)
    if t.ndim == 0:
        return out
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))


def add_noise(
    schedule: NoiseSchedule, sample: jax.Array, noise: jax.Array, t: jax.Array
) -> jax.Array:
    """Forward diffusion: z_t = alpha_t * x + sigma_t * eps."""
    a = extract(schedule.sqrt_alphas_cumprod, t, sample.ndim)
    s = extract(schedule.sqrt_one_minus_alphas_cumprod, t, sample.ndim)
    return a * sample + s * noise


def ddim_timestep_grid(n_steps: int, num_train_timesteps: int = 1000) -> np.ndarray:
    """The DDIM discretisation used everywhere in the reference.

    `(arange(1..n) * (T // n)).round() - 1` -> e.g. [19, 39, ..., 999] for n=50
    (reference `utils/generation.py:490-492`, `training/src/lcm.py:92-95`).
    Returns a host numpy int array (static — feeds scan constants).
    """
    step_ratio = num_train_timesteps // n_steps
    return (np.arange(1, n_steps + 1) * step_ratio).round().astype(np.int64) - 1
