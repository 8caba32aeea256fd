"""Dual-student LoRA trainer: one pjit step computing all four iCD losses.

Replaces the reference trainer loop's compute core
(`training/train_icd_sd15_lora.py:469-1135`): two accelerate/DDP-wrapped
peft students with separate optimizers stepping sequentially per loss
(`:905-986`) become ONE compiled XLA program that
  * merges each student's LoRA into the (frozen, replicated) base weights,
  * evaluates reverse/forward CD + both preserve losses,
  * takes gradients w.r.t. the two LoRA pytrees only,
  * applies two optax AdamW updates (grad-clip 1.0 inside the chain),
with batch sharded over the mesh's "dp" axis; XLA inserts the gradient
all-reduce over ICI (the reference's NCCL all-reduce inside
`accelerator.backward`, SURVEY.md §2).

Divergence (documented): the reference steps optimizers sequentially inside
one "global step" so later losses see earlier updates; here both students
update from the same pre-step state — order-independent, and it lets XLA
overlap all UNet calls. The training dynamics difference is one
intra-step staleness of the *other* student's frozen weights.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..diffusion.schedule import NoiseSchedule
from ..diffusion.solver import TrainSolver
from ..models.lora import apply_with_lora, init_lora, merge_lora
from . import losses as L


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Static training hyperparameters (reference
    `training/sh_scripts/run_sd15_lora.sh` + argparse defaults)."""

    learning_rate: float = 8e-6
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 0.0
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    lora_rank: int = 64
    lora_alpha: float = 8.0
    # Guidance-scale sampling (reference train_icd_sd15_lora.py:887-894).
    w_min: float = 3.0
    w_max: float = 15.0
    discrete_w: Optional[Tuple[float, ...]] = (0.0, 7.0, 11.0, 15.0, 19.0)
    use_reverse_cd: bool = True
    use_forward_cd: bool = True
    use_forward_preserve: bool = True
    use_reverse_preserve: bool = True
    # Rematerialise student UNet activations during backprop (the
    # reference's torch gradient-checkpointing flag,
    # train_icd_sd15_lora.py:731-733). Needed for SDXL-scale training.
    remat: bool = False
    # Store Adam's first moment in bf16. Both students' r=64 LoRA opt
    # states total ~6 GB fp32 — on a single 16 GB chip that is the
    # difference between resident and thrashing; multi-chip runs shard
    # the state (fsdp) and can keep fp32.
    bf16_moments: bool = False
    # Apply adapters lazily per layer (models/lora.py apply_with_lora)
    # instead of materialising merged parameter copies inside the step.
    # Output-identical (linearity); saves one full parameter set per
    # live student AND the full-size kernel cotangents the merge's
    # backward otherwise materialises — the lever that fits full-depth
    # SDXL training on a single 16 GB chip.
    lazy_lora: bool = False
    # Skip an optimizer update whose gradients contain any non-finite
    # value instead of writing NaN into the adapters (optax
    # apply_if_finite). A transient bad batch then costs one step, not
    # the run; after `max_nonfinite_skips` CONSECUTIVE bad steps the
    # guard stops masking and the NaN surfaces, so persistent divergence
    # still fails loudly. The reference has no equivalent — a NaN batch
    # silently poisons its peft adapters. Off by default: the optimizer
    # state tree is unchanged unless requested (the guard wraps the opt
    # state in ApplyIfFiniteState, so flipping it mid-run changes the
    # checkpoint layout).
    skip_nonfinite: bool = False
    max_nonfinite_skips: int = 100
    loss: L.LossConfig = dataclasses.field(default_factory=L.LossConfig)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ICDTrainState:
    """Everything that changes during training (an orbax-checkpointable
    pytree). Base/teacher params live outside (frozen)."""

    step: jax.Array
    lora_reverse: Dict
    lora_forward: Dict
    opt_reverse: optax.OptState
    opt_forward: optax.OptState


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    opt = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            cfg.learning_rate,
            b1=cfg.adam_beta1,
            b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon,
            weight_decay=cfg.adam_weight_decay,
            mu_dtype=jnp.bfloat16 if cfg.bf16_moments else None,
        ),
    )
    if cfg.skip_nonfinite:
        opt = optax.apply_if_finite(
            opt, max_consecutive_errors=cfg.max_nonfinite_skips
        )
    return opt


def init_train_state(
    rng: jax.Array, base_params: Dict, cfg: TrainConfig
) -> ICDTrainState:
    """Fresh LoRA adapters (identity at init) + optimizer states for both
    students (reference peft-wraps both UNets with r=64,
    `train_icd_sd15_lora.py:617-636`)."""
    kr, kf = jax.random.split(rng)
    inner = base_params["params"] if "params" in base_params else base_params
    lora_r = init_lora(kr, inner, rank=cfg.lora_rank)
    lora_f = init_lora(kf, inner, rank=cfg.lora_rank)
    opt = make_optimizer(cfg)
    return ICDTrainState(
        step=jnp.zeros((), jnp.int32),
        lora_reverse=lora_r,
        lora_forward=lora_f,
        opt_reverse=opt.init(lora_r),
        opt_forward=opt.init(lora_f),
    )


def sample_w(rng: jax.Array, batch: int, cfg: TrainConfig) -> jax.Array:
    """Guidance scale per sample: uniform over the discrete set when given,
    else U[w_min, w_max] (reference train_icd_sd15_lora.py:887-894)."""
    if cfg.discrete_w is not None:
        idx = jax.random.randint(rng, (batch,), 0, len(cfg.discrete_w))
        return jnp.asarray(cfg.discrete_w, jnp.float32)[idx]
    return jax.random.uniform(
        rng, (batch,), minval=cfg.w_min, maxval=cfg.w_max
    )


def make_train_step(
    unet,
    base_params: Dict,
    teacher_params: Dict,
    solver: TrainSolver,
    schedule: NoiseSchedule,
    cfg: TrainConfig,
    mesh=None,
    split: bool = False,
):
    """Build the compiled train step.

    Returned signature:
      step_fn(state, base_params, teacher_params, batch, rng)
        -> (new_state, metrics)
    batch: dict with
      latents: (B, h, w, 4) clean VAE latents (already scaled),
      context: (B, 77, D) prompt embeddings,
      uncond_context: (B, 77, D) (used only when not embed_guidance),
      noise: (B, h, w, 4) or None -> drawn from rng.
    Base/teacher params are explicit args so they can live sharded on the
    mesh without being baked into the program as constants.

    `split=True` compiles the reverse-student and forward-student halves
    as two separate XLA programs instead of one fused step. Numerics are
    identical (both halves still read the pre-step counterpart LoRA), but
    each program is roughly half the size — the difference between an
    SDXL-scale step compiling in minutes vs not at all. The fused form
    remains the default (single dispatch, best overlap).
    """
    opt = make_optimizer(cfg)

    def _step_impl(state: ICDTrainState, base, teacher, batch, rng, parts):
        latents = batch["latents"]
        context = batch["context"]
        uncond_context = batch.get("uncond_context", context)
        added = batch.get("added_cond")  # SDXL pooled/time_ids (C22)
        b = latents.shape[0]
        k_noise, k_w, k_r, k_f, k_fp, k_rp = jax.random.split(rng, 6)
        noise = batch.get("noise")
        if noise is None:
            noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
        w = sample_w(k_w, b, cfg)

        inner_base = base["params"] if "params" in base else base
        wrap = (lambda t: {"params": t}) if "params" in base else (lambda t: t)

        def student_apply_factory(lora):
            if cfg.lazy_lora:
                def apply(x, t, w_emb, ctx=context):
                    return apply_with_lora(
                        unet, wrap(inner_base), lora, x, t, ctx,
                        w_cond=w_emb, added_cond=added,
                        alpha=cfg.lora_alpha, rank=cfg.lora_rank,
                    )
            else:
                merged = wrap(
                    merge_lora(inner_base, lora, alpha=cfg.lora_alpha, rank=cfg.lora_rank)
                )
                def apply(x, t, w_emb, ctx=context):
                    return unet.apply(
                        merged, x, t, ctx, w_cond=w_emb, added_cond=added
                    )
            if cfg.remat:
                apply = jax.checkpoint(apply)
            return apply

        def teacher_apply(p, x, t, w_emb, ctx=context):
            return unet.apply(p, x, t, ctx, w_cond=w_emb, added_cond=added)

        def uncond_apply(p, x, t, w_emb):
            # SDXL uncond uses zeroed pooled embeds
            # (reference train_icd_xl_lora.py:900-903)
            added_u = None
            if added is not None:
                added_u = dict(added, text_embeds=jnp.zeros_like(added["text_embeds"]))
            return unet.apply(
                p, x, t, uncond_context, w_cond=w_emb, added_cond=added_u
            )

        # Frozen counterparts are merged ONCE outside the grad functions —
        # inside, each objective would materialise its own merged tree and
        # peak HBM grows by a full parameter copy (the difference between
        # fitting and OOMing full-size SD1.5 on one 16 GB chip).
        frozen_reverse_apply = student_apply_factory(
            jax.lax.stop_gradient(state.lora_reverse)
        )
        frozen_forward_apply = student_apply_factory(
            jax.lax.stop_gradient(state.lora_forward)
        )

        # ---- reverse student objective -------------------------------
        def reverse_objective(lora_r):
            s_apply = student_apply_factory(lora_r)
            f_apply = frozen_forward_apply
            total = jnp.zeros((), jnp.float32)
            logs = {}
            if cfg.use_reverse_cd:
                loss, lg = L.reverse_cd_loss(
                    lambda p, x, t, we: s_apply(x, t, we), None,
                    lambda p, x, t, we: teacher_apply(teacher, x, t, we), None,
                    latents, noise, w, k_r, solver, schedule, cfg.loss,
                    uncond_apply=lambda p, x, t, we: uncond_apply(teacher, x, t, we),
                )
                total += loss
                logs.update(lg)
            if cfg.use_reverse_preserve:
                loss, lg = L.reverse_preserve_loss(
                    lambda p, x, t, we: f_apply(x, t, we), None,
                    lambda p, x, t, we: s_apply(x, t, we), None,
                    latents, noise, k_rp, solver, schedule, cfg.loss,
                )
                total += cfg.loss.reverse_preserve_coef * loss
                logs.update(lg)
            return total, logs

        # ---- forward student objective -------------------------------
        def forward_objective(lora_f):
            s_apply = student_apply_factory(lora_f)
            r_apply = frozen_reverse_apply
            total = jnp.zeros((), jnp.float32)
            logs = {}
            if cfg.use_forward_cd:
                loss, lg = L.forward_cd_loss(
                    lambda p, x, t, we: s_apply(x, t, we), None,
                    lambda p, x, t, we: teacher_apply(teacher, x, t, we), None,
                    latents, noise, w, k_f, solver, schedule, cfg.loss,
                    uncond_apply=lambda p, x, t, we: uncond_apply(teacher, x, t, we),
                )
                total += loss
                logs.update(lg)
            if cfg.use_forward_preserve:
                loss, lg = L.forward_preserve_loss(
                    lambda p, x, t, we: s_apply(x, t, we), None,
                    lambda p, x, t, we: r_apply(x, t, we), None,
                    latents, noise, k_fp, solver, schedule, cfg.loss,
                )
                total += cfg.loss.forward_preserve_coef * loss
                logs.update(lg)
            return total, logs

        metrics = {}
        new_lora_r, new_opt_r = state.lora_reverse, state.opt_reverse
        if parts in ("both", "reverse") and (
            cfg.use_reverse_cd or cfg.use_reverse_preserve
        ):
            (loss_r, logs_r), grads_r = jax.value_and_grad(
                reverse_objective, has_aux=True
            )(state.lora_reverse)
            updates, new_opt_r = opt.update(
                grads_r, state.opt_reverse, state.lora_reverse
            )
            new_lora_r = optax.apply_updates(state.lora_reverse, updates)
            metrics.update(logs_r)
            metrics["reverse_total_loss"] = loss_r
            metrics["reverse_grad_norm"] = optax.global_norm(grads_r)
            if cfg.skip_nonfinite:
                metrics["reverse_nonfinite_skips"] = new_opt_r.total_notfinite

        new_lora_f, new_opt_f = state.lora_forward, state.opt_forward
        if parts in ("both", "forward") and (
            cfg.use_forward_cd or cfg.use_forward_preserve
        ):
            (loss_f, logs_f), grads_f = jax.value_and_grad(
                forward_objective, has_aux=True
            )(state.lora_forward)
            updates, new_opt_f = opt.update(
                grads_f, state.opt_forward, state.lora_forward
            )
            new_lora_f = optax.apply_updates(state.lora_forward, updates)
            metrics.update(logs_f)
            metrics["forward_total_loss"] = loss_f
            metrics["forward_grad_norm"] = optax.global_norm(grads_f)
            if cfg.skip_nonfinite:
                metrics["forward_nonfinite_skips"] = new_opt_f.total_notfinite

        new_state = ICDTrainState(
            step=state.step + 1,
            lora_reverse=new_lora_r,
            lora_forward=new_lora_f,
            opt_reverse=new_opt_r,
            opt_forward=new_opt_f,
        )
        return new_state, metrics

    # Sharding is carried by the *arguments* (computation follows data):
    # callers place the batch with parallel.shard_batch (leading axis over
    # "dp") and params with parallel.shard_params / replicated. XLA then
    # inserts the gradient all-reduce over ICI automatically.
    import functools

    if not split:
        return jax.jit(
            functools.partial(_step_impl, parts="both"), donate_argnums=(0,)
        )

    rev_fn = jax.jit(functools.partial(_step_impl, parts="reverse"))
    fwd_fn = jax.jit(functools.partial(_step_impl, parts="forward"))

    def step_fn(state: ICDTrainState, base, teacher, batch, rng):
        # Both halves receive the SAME pre-step state (and the same rng, so
        # each loss draws the keys it would under the fused step) — the
        # forward half's frozen reverse counterpart is the pre-update one,
        # exactly as in the fused program.
        rev_state, m_rev = rev_fn(state, base, teacher, batch, rng)
        fwd_state, m_fwd = fwd_fn(state, base, teacher, batch, rng)
        new_state = ICDTrainState(
            step=state.step + 1,
            lora_reverse=rev_state.lora_reverse,
            lora_forward=fwd_state.lora_forward,
            opt_reverse=rev_state.opt_reverse,
            opt_forward=fwd_state.opt_forward,
        )
        return new_state, {**m_rev, **m_fwd}

    return step_fn
