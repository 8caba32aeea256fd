"""Null-Text Inversion + Negative-Prompt Inversion (reference C11).

Capability twin of `utils/inversion.py:11-48 null_optimization` and the
NPI shortcut (`inversion.py:96-97`): after a 50-step DDIM inversion, NTI
optimises a *per-step* unconditional embedding so that CFG-guided DDIM
reconstruction lands on the recorded trajectory.

TPU-first design: the whole inner Adam loop for one DDIM step is ONE jit
program — an `optax.adam` update inside `lax.while_loop` with the
reference's early-stop rule (loss < epsilon + i*2e-5) as the loop
condition. The timestep, learning rate and threshold enter as traced
scalars, so all 50 outer steps share a single compiled program (the
reference re-instantiates a torch Adam per step, `inversion.py:16`).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.solver import ddim_prev_step
from .pipeline import InvertibleCD


def _build_nti_step(pipe: InvertibleCD, num_inner_steps: int, guidance_scale: float):
    schedule = pipe.schedule
    step_ratio = 1000 // pipe.grid.n_steps
    opt = optax.adam(1.0)  # unit-lr; the traced lr scales the update

    def nm(params, latent, t, ctx):
        b = latent.shape[0]
        return pipe.unet.apply(
            params, latent, jnp.broadcast_to(t, (b,)).astype(jnp.int32), ctx
        )

    def step(params, uncond, latent_cur, latent_prev, ctx_c, t, lr, threshold):
        cond_noise = nm(params, latent_cur, t, ctx_c)

        def loss_fn(u):
            uncond_noise = nm(params, latent_cur, t, u)
            eps = uncond_noise + guidance_scale * (cond_noise - uncond_noise)
            rec = ddim_prev_step(eps, t, latent_cur, schedule, step_ratio)
            return jnp.mean((rec - latent_prev) ** 2)

        def cond_fun(carry):
            u, opt_state, j, loss = carry
            return jnp.logical_and(j < num_inner_steps, loss >= threshold)

        def body_fun(carry):
            u, opt_state, j, _ = carry
            # The early-stop condition tests the PRE-update loss of the
            # current iterate (the reference breaks on the loss it just
            # backpropagated, `inversion.py:33-36`); carrying it from
            # value_and_grad also avoids a second UNet forward per step.
            loss, grads = jax.value_and_grad(loss_fn)(u)
            updates, opt_state = opt.update(grads, opt_state, u)
            u = optax.apply_updates(u, jax.tree.map(lambda g: lr * g, updates))
            return u, opt_state, j + 1, loss

        init = (uncond, opt.init(uncond), jnp.zeros((), jnp.int32), jnp.inf)
        u, _, n_iter, loss = jax.lax.while_loop(cond_fun, body_fun, init)

        # Advance the trajectory with the optimised uncond (reference
        # `inversion.py:42-45`).
        uncond_noise = nm(params, latent_cur, t, u)
        eps = uncond_noise + guidance_scale * (cond_noise - uncond_noise)
        latent_next = ddim_prev_step(eps, t, latent_cur, schedule, step_ratio)
        return u, latent_next, loss, n_iter

    return jax.jit(step)


def null_text_inversion(
    pipe: InvertibleCD,
    image: np.ndarray,
    prompt: str,
    num_inner_steps: int = 10,
    epsilon: float = 1e-5,
    guidance_scale: float = 7.5,
    trajectory: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Invert `image` with 50-step DDIM, then optimise per-step uncond
    embeddings (reference `invert` + `null_optimization`,
    `utils/inversion.py:51-100,11-48`).

    Pass `trajectory` (the `(n+1, B, h, w, 4)` ascending-t output of
    `pipe.ddim_invert`) to skip the internal inversion — callers that
    already inverted (cli/edit.py baselines) save ~n teacher UNet calls.

    Returns (per_step_uncond (n_steps, B, 77, D), inverted latent) — feed
    both to `pipe.ddim_generate(..., nti_uncond=...)` for reconstruction
    or NTI-based editing.
    """
    if trajectory is None:
        trajectory, _ = pipe.ddim_invert(image, prompt)
    traj = trajectory  # (n+1, B, h, w, 4), ascending t
    ctx_u, ctx_c = pipe.encode_prompt([prompt])
    step_fn = _build_nti_step(pipe, num_inner_steps, guidance_scale)
    params = pipe.params["teacher"]

    n = pipe.grid.n_steps
    timesteps = pipe.grid.ddim_timesteps[::-1]  # descending, as generation
    latent_cur = traj[-1]
    uncond = ctx_u
    per_step = []
    for i, t in enumerate(timesteps.tolist()):
        latent_prev = traj[n - i - 1]
        lr = 1e-2 * (1.0 - i / 100.0)  # reference `inversion.py:16`
        threshold = epsilon + i * 2e-5  # reference `inversion.py:35`
        uncond, latent_cur, loss, n_iter = step_fn(
            params, uncond, latent_cur, latent_prev, ctx_c,
            jnp.asarray(t), jnp.asarray(lr), jnp.asarray(threshold),
        )
        per_step.append(uncond)
    return jnp.stack(per_step, axis=0), traj[-1]


def negative_prompt_inversion(pipe: InvertibleCD, prompt: str) -> jax.Array:
    """NPI: use the *conditional* embedding as the uncond for every step
    (reference `utils/inversion.py:96-97`) — a free approximation of NTI."""
    _, ctx_c = pipe.encode_prompt([prompt])
    n = pipe.grid.n_steps
    return jnp.broadcast_to(ctx_c[None], (n,) + ctx_c.shape)
