"""Consistency / DDIM sampling loops — the inference hot path, TPU-first.

Functional re-design of the reference `Generator` (reference
`utils/generation.py:181-521`). Key departures from the torch design, all
motivated by the XLA compilation model:

* Timesteps, boundaries and guidance schedules are **static** (host numpy):
  the 3-4 step consistency loops unroll into one jit program with zero host
  sync; the 50-step DDIM loops compile to a `lax.scan`.
* The reference doubles the batch for CFG even when the model is
  w-conditioned and then throws the uncond half away
  (`generation.py:221,246-253`). Here w-conditioned models run **only the
  cond rows** — output-identical, half the FLOPs on the headline path.
* Dynamic guidance (`linear_schedule_old` on `t.item()`,
  `generation.py:229-231`) becomes a host-side fold over the static grid:
  per-step w values are baked into the compiled program as constants.
* The p2p controller is a trace-time closure (see `models/attention.py`);
  `step_callback` (LocalBlend) slots between the unrolled steps.

The `NoiseModel` callable abstracts the denoiser:
    noise_model(latent, t, context, w_embedding, hook) -> epsilon
where `latent` is (B, H, W, C) NHWC, `t` a static python int, `context`
(B, S, D) text states, `w_embedding` Optional (B, w_dim).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.guidance import guidance_scale_embedding
from ..diffusion.schedule import NoiseSchedule, add_noise
from ..diffusion.solver import (
    SolverGrid,
    ddim_next_step,
    ddim_prev_step,
    predicted_origin,
)

NoiseModel = Callable  # (latent, t, context, w_embedding, hook) -> eps
AttnHookFactory = Callable  # (step_index) -> Optional[hook]
StepCallback = Callable  # (latent, step_index) -> latent


@dataclasses.dataclass(frozen=True)
class GuidanceConfig:
    """Static guidance setup for one sampling run.

    Mirrors the knobs of the reference `get_noise_pred`
    (`utils/generation.py:211-253`): `w_embed_dim > 0` selects the
    w-conditioned path (guidance inside the model), otherwise explicit CFG.
    `edit_pair=True` reproduces the reference's `len(batch)==4` special case
    (`generation.py:232-235`): only the *last* row receives w, the
    reconstruction row runs unguided.
    """

    guidance_scale: float = 19.0
    w_embed_dim: int = 512
    dynamic_guidance: bool = False
    tau1: float = 1.0
    tau2: float = 1.0
    edit_pair: bool = False

    def w_at(self, t: int) -> float:
        """Host-side `linear_schedule_old` (reference `generation.py:74-82`)."""
        if not self.dynamic_guidance:
            return float(self.guidance_scale)
        tn = t / 1000.0
        if tn <= self.tau1:
            gamma = 1.0
        elif tn >= self.tau2:
            gamma = 0.0
        else:
            gamma = (self.tau2 - tn) / (self.tau2 - self.tau1)
        return gamma * float(self.guidance_scale)

    def cfg_scale_at(self, t: int) -> float:
        """Host-side `linear_schedule` (reference `generation.py:85-93`)."""
        if not self.dynamic_guidance:
            return float(self.guidance_scale)
        tn = t / 1000.0
        if tn <= self.tau1:
            return float(self.guidance_scale)
        if tn >= self.tau2:
            return 1.0
        return (self.tau2 - tn) / (self.tau2 - self.tau1) * (
            float(self.guidance_scale) - 1.0
        ) + 1.0


def w_embedding_for(
    g: GuidanceConfig, t: int, batch: int, dtype=jnp.float32
) -> Optional[jax.Array]:
    """The per-step guidance embedding, baked as a compile-time constant."""
    if g.w_embed_dim <= 0:
        return None
    w = g.w_at(t)
    if g.edit_pair:
        ws = np.zeros((batch,), np.float32)
        ws[-1] = w
    else:
        ws = np.full((batch,), w, np.float32)
    return guidance_scale_embedding(jnp.asarray(ws), g.w_embed_dim, dtype=dtype)


def _wrap_cond_half(hook):
    """CFG runs a doubled [uncond; cond] batch; the controller edits the
    cond half only (the reference's `attn[h//2:]` convention,
    `utils/p2p.py:98-102`)."""
    if hook is None:
        return None

    def cond_half_hook(probs, meta):
        keep, edit = jnp.split(probs, 2, axis=0)
        return jnp.concatenate([keep, hook(edit, meta)], axis=0)

    # keep the static identity-layer predicate visible through the
    # wrapper, or the CFG path (the 50-step DDIM/NTI baselines) would
    # materialise probabilities on every layer again
    applies = getattr(hook, "applies", None)
    if applies is not None:
        cond_half_hook.applies = applies
    return cond_half_hook


def predict_noise(
    noise_model: NoiseModel,
    latent: jax.Array,
    t: int,
    context_uncond: jax.Array,
    context_cond: jax.Array,
    g: GuidanceConfig,
    hook=None,
) -> jax.Array:
    """One guided epsilon prediction at static timestep `t`.

    w-conditioned models run cond rows only (uncond output is discarded by
    the reference anyway, `generation.py:246-253`); CFG models run the
    doubled batch with the hook applied to the cond half only (matching the
    controller's `attn[h//2:]` convention, reference `utils/p2p.py:98-102`).
    """
    b = latent.shape[0]
    if g.w_embed_dim > 0:
        w_emb = w_embedding_for(g, t, b, latent.dtype)
        return noise_model(latent, t, context_cond, w_emb, hook)

    doubled = jnp.concatenate([latent, latent], axis=0)
    ctx = jnp.concatenate([context_uncond, context_cond], axis=0)
    eps = noise_model(doubled, t, ctx, None, _wrap_cond_half(hook))
    eps_uncond, eps_text = jnp.split(eps, 2, axis=0)
    scale = g.cfg_scale_at(t)
    if g.guidance_scale > 1:
        return eps_uncond + scale * (eps_text - eps_uncond)
    return eps_text


def cons_generation(
    noise_model: NoiseModel,
    latent: jax.Array,
    context_uncond: jax.Array,
    context_cond: jax.Array,
    grid: SolverGrid,
    schedule: NoiseSchedule,
    g: GuidanceConfig,
    hook_factory: Optional[AttnHookFactory] = None,
    step_callback: Optional[StepCallback] = None,
    context_amplify: Optional[jax.Array] = None,
    return_all: bool = False,
) -> jax.Array:
    """Multi-boundary reverse CD: noise -> image in 3-4 hops
    (reference `Generator.cons_generation`, `utils/generation.py:373-412`).
    `return_all=True` returns the whole (n_hops+1, B, H, W, C) trajectory
    (the reference's `all_latent` list, `generation.py:382,410`) — row i is
    the INPUT of hop i, which int8 calibration and debugging need.

    The (t, s) pairs come from `grid` (static), so this unrolls into a
    single fused XLA program — 4 UNet calls, no host round-trips.

    `context_amplify` is the SDXL editing prompt swap (reference
    `generation_sdxl.py:426-442` / `running/sdxl/edit.py:232`): while
    `t > tau1 * 1000` under dynamic guidance, the model sees the
    *source*-prompt context instead of the target's, so early hops
    reconstruct and later hops steer. The grid is static, so the swap
    folds at trace time — no runtime branch.
    """
    trajectory = [latent]
    for i, (t, s) in enumerate(
        zip(grid.reverse_timesteps.tolist(), grid.reverse_boundaries.tolist())
    ):
        hook = hook_factory(i) if hook_factory is not None else None
        use_amplify = (
            context_amplify is not None
            and g.dynamic_guidance
            and t > g.tau1 * 1000
        )
        ctx_c = context_amplify if use_amplify else context_cond
        eps = predict_noise(
            noise_model, latent, t, context_uncond, ctx_c, g, hook
        )
        latent = predicted_origin(
            eps,
            jnp.full((latent.shape[0],), t, jnp.int32),
            jnp.full((latent.shape[0],), s, jnp.int32),
            latent,
            schedule.sqrt_alphas_cumprod,
            schedule.sqrt_one_minus_alphas_cumprod,
        )
        if step_callback is not None:
            latent = step_callback(latent, i)
        if return_all:
            trajectory.append(latent)
    if return_all:
        return jnp.stack(trajectory, axis=0)
    return latent


def cons_inversion(
    noise_model: NoiseModel,
    latent: jax.Array,
    noise: jax.Array,
    context_uncond: jax.Array,
    context_cond: jax.Array,
    grid: SolverGrid,
    schedule: NoiseSchedule,
    g: GuidanceConfig,
    return_all: bool = False,
) -> jax.Array:
    """Forward CD: clean latent -> noise in 3-4 hops
    (reference `Generator.cons_inversion`, `utils/generation.py:414-449`).
    `return_all=True` returns the (n_hops+1, B, H, W, C) trajectory; row i
    is the INPUT of forward hop i (row 0 is the start-timestep-noised
    latent).

    The caller supplies `noise` for the start-timestep perturbation (the
    reference draws it from a seeded CPU generator, `generation.py:425-427`;
    we accept any array so recorded reference noise can be used for parity
    tests). Guidance for inversion is typically 0 and never dynamic.
    """
    latent = add_noise(
        schedule, latent, noise, jnp.full((latent.shape[0],), grid.start_timestep)
    )
    trajectory = [latent]
    for t, s in zip(
        grid.forward_timesteps.tolist(), grid.forward_boundaries.tolist()
    ):
        eps = predict_noise(
            noise_model, latent, t, context_uncond, context_cond, g, hook=None
        )
        latent = predicted_origin(
            eps,
            jnp.full((latent.shape[0],), t, jnp.int32),
            jnp.full((latent.shape[0],), s, jnp.int32),
            latent,
            schedule.sqrt_alphas_cumprod,
            schedule.sqrt_one_minus_alphas_cumprod,
        )
        if return_all:
            trajectory.append(latent)
    if return_all:
        return jnp.stack(trajectory, axis=0)
    return latent


def ddim_loop(
    noise_model: NoiseModel,
    latent: jax.Array,
    context_uncond: jax.Array,
    context_cond: jax.Array,
    grid: SolverGrid,
    schedule: NoiseSchedule,
    g: GuidanceConfig,
    is_forward: bool,
    per_step_uncond: Optional[jax.Array] = None,
    hook_factory: Optional[AttnHookFactory] = None,
    step_callback: Optional[StepCallback] = None,
    return_all: bool = False,
):
    """The 50-step DDIM baseline loop in either direction
    (reference `Generator.ddim_loop`, `utils/generation.py:305-343`).

    is_forward=True inverts (t ascending), False generates (t descending).
    `per_step_uncond` carries Null-Text-Inversion embeddings — one uncond
    context per step (reference `generation.py:320-321`).

    Without controller hooks the 50 steps compile as ONE `lax.scan` body
    (per-step guidance constants become scan inputs) — a 50x smaller XLA
    graph than unrolling, which matters for full-size UNets. Hooked runs
    ALSO scan when the controller supports it (every p2p controller,
    `ControllerRuntime.scan_supported`): the per-step behavior is data
    (traced gathers over the step index, `edit_attention`), so one
    unrolled step 0 (which sizes the LocalBlend accumulator) plus an
    (N-1)-iteration scan replaces N unrolled hooked UNet calls. Measured
    at full SD1.5 on the chip (tools/exp_hooked_compile.py): unrolled
    617 s lower + 822 s remote compile, 5.43 GB peak temp; scan form
    242 s + 147 s (3.7x end-to-end, one-time per config — the compile
    cache amortises it) and 2.24 GB peak temp. store_all runs carry a
    per-layer running SUM of the <=32^2 attention maps through the scan
    (fixed shapes) and surface step-averaged maps — identical
    `aggregate_attention` results as the unrolled per-step store.
    """
    timesteps = grid.ddim_timesteps[::-1] if not is_forward else grid.ddim_timesteps
    # Reference indexes scheduler.timesteps (descending) from the back for
    # forward loops (`generation.py:323-326`), i.e. ascending ddim grid.
    if hook_factory is None and step_callback is None:
        return _ddim_loop_scan(
            noise_model, latent, context_uncond, context_cond, timesteps,
            grid, schedule, g, is_forward, per_step_uncond, return_all,
        )
    rt = getattr(hook_factory, "__self__", None)
    if (
        rt is not None
        and getattr(rt, "scan_supported", lambda: False)()
        and len(timesteps) > 2
    ):
        return _ddim_loop_scan_hooked(
            noise_model, latent, context_uncond, context_cond, timesteps,
            grid, schedule, g, is_forward, per_step_uncond, rt, return_all,
        )
    trajectory: List[jax.Array] = [latent]
    for i, t in enumerate(timesteps.tolist()):
        cu = context_uncond if per_step_uncond is None else per_step_uncond[i]
        hook = hook_factory(i) if hook_factory is not None else None
        eps = predict_noise(noise_model, latent, t, cu, context_cond, g, hook)
        if is_forward:
            latent = ddim_next_step(
                eps, jnp.asarray(t), latent, schedule, 1000 // grid.n_steps
            )
        else:
            latent = ddim_prev_step(
                eps, jnp.asarray(t), latent, schedule, 1000 // grid.n_steps
            )
        if step_callback is not None:
            latent = step_callback(latent, i)
        if return_all:
            trajectory.append(latent)
    if return_all:
        return jnp.stack(trajectory, axis=0)
    return latent


def _ddim_loop_scan(
    noise_model: NoiseModel,
    latent: jax.Array,
    context_uncond: jax.Array,
    context_cond: jax.Array,
    timesteps: np.ndarray,
    grid: SolverGrid,
    schedule: NoiseSchedule,
    g: GuidanceConfig,
    is_forward: bool,
    per_step_uncond: Optional[jax.Array],
    return_all: bool,
):
    """Scan form of the hook-free DDIM loop: the static per-step guidance
    values fold into scan inputs, timesteps become traced scalars."""
    b = latent.shape[0]
    n = len(timesteps)
    ts = jnp.asarray(timesteps.copy(), jnp.int32)
    step_ratio = 1000 // grid.n_steps

    if g.w_embed_dim > 0:
        w_embs = jnp.stack(
            [w_embedding_for(g, int(t), b, latent.dtype) for t in timesteps]
        )  # (N, B, w_dim)
        scales = jnp.zeros((n,), jnp.float32)
    else:
        w_embs = jnp.zeros((n, 0), latent.dtype)
        scales = jnp.asarray(
            [g.cfg_scale_at(int(t)) for t in timesteps], jnp.float32
        )
    if per_step_uncond is None:
        per_step_uncond = jnp.broadcast_to(
            context_uncond[None], (n,) + context_uncond.shape
        )

    def step(carry, xs):
        lat = carry
        t, w_emb, scale, cu = xs
        if g.w_embed_dim > 0:
            eps = noise_model(lat, t, context_cond, w_emb, None)
        else:
            doubled = jnp.concatenate([lat, lat], axis=0)
            ctx = jnp.concatenate([cu, context_cond], axis=0)
            eps2 = noise_model(doubled, t, ctx, None, None)
            eps_u, eps_c = jnp.split(eps2, 2, axis=0)
            if g.guidance_scale > 1:
                eps = eps_u + scale * (eps_c - eps_u)
            else:
                eps = eps_c
        if is_forward:
            lat = ddim_next_step(eps, t, lat, schedule, step_ratio)
        else:
            lat = ddim_prev_step(eps, t, lat, schedule, step_ratio)
        return lat, (lat if return_all else None)

    final, traj = jax.lax.scan(
        step, latent, (ts, w_embs, scales, per_step_uncond)
    )
    if return_all:
        return jnp.concatenate([latent[None], traj], axis=0)
    return final


def _ddim_loop_scan_hooked(
    noise_model: NoiseModel,
    latent: jax.Array,
    context_uncond: jax.Array,
    context_cond: jax.Array,
    timesteps: np.ndarray,
    grid: SolverGrid,
    schedule: NoiseSchedule,
    g: GuidanceConfig,
    is_forward: bool,
    per_step_uncond: Optional[jax.Array],
    rt,
    return_all: bool,
):
    """Scan form of the CONTROLLER-HOOKED ddim loop (see ddim_loop).

    Step 0 runs unrolled: its hooks materialise the LocalBlend 16^2 map
    accumulator, whose shape seeds the scan carry. Steps 1..N-1 share one
    scan body — the controller consumes the traced step index through
    `edit_attention` / `scan_step_callback`.
    """
    b = latent.shape[0]
    n = len(timesteps)
    step_ratio = 1000 // grid.n_steps
    ts = jnp.asarray(timesteps.copy(), jnp.int32)
    if per_step_uncond is None:
        per_step_uncond = jnp.broadcast_to(
            context_uncond[None], (n,) + context_uncond.shape
        )
    if g.w_embed_dim > 0:
        w_embs = jnp.stack(
            [w_embedding_for(g, int(t), b, latent.dtype) for t in timesteps]
        )
        scales = jnp.zeros((n,), jnp.float32)
    else:
        w_embs = jnp.zeros((n, 0), latent.dtype)
        scales = jnp.asarray(
            [g.cfg_scale_at(int(t)) for t in timesteps], jnp.float32
        )

    def one_step(lat, t, w_emb, scale, cu, step):
        hook = rt.hook_factory(step)
        if g.w_embed_dim > 0:
            eps = noise_model(lat, t, context_cond, w_emb, hook)
        else:
            doubled = jnp.concatenate([lat, lat], axis=0)
            ctx = jnp.concatenate([cu, context_cond], axis=0)
            eps2 = noise_model(doubled, t, ctx, None, _wrap_cond_half(hook))
            eps_u, eps_c = jnp.split(eps2, 2, axis=0)
            if g.guidance_scale > 1:
                eps = eps_u + scale * (eps_c - eps_u)
            else:
                eps = eps_c
        if is_forward:
            return ddim_next_step(eps, t, lat, schedule, step_ratio)
        return ddim_prev_step(eps, t, lat, schedule, step_ratio)

    lat = one_step(
        latent, ts[0], w_embs[0], scales[0], per_step_uncond[0], 0
    )
    lat = rt.step_callback(lat, 0)
    accum = jnp.stack(rt._accum_maps) if rt._accum_maps else None
    # store_all: the per-layer maps step 0's hooks collected seed the
    # running-sum scan carry (fixed shapes; consumers average over steps)
    store_sums = rt.take_step_store() if rt.spec.store_all else {}

    def body(carry, xs):
        lat, accum, sums = carry
        t, w_emb, scale, cu, step = xs
        lat = one_step(lat, t, w_emb, scale, cu, step)
        lat, accum = rt.scan_step_callback(lat, step, accum)
        if rt.spec.store_all:
            sums = rt.add_step_store(sums)
        return (lat, accum, sums), (lat if return_all else None)

    steps = jnp.arange(1, n, dtype=jnp.int32)
    (final, _, store_sums), traj = jax.lax.scan(
        body, (lat, accum, store_sums),
        (ts[1:], w_embs[1:], scales[1:], per_step_uncond[1:], steps),
    )
    if rt.spec.store_all:
        rt.finalize_store(store_sums, n)
    if return_all:
        return jnp.concatenate([jnp.stack([latent, lat]), traj], axis=0)
    return final
