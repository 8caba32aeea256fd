"""Eval-during-training: sampling twins + FID / inversion-quality loops.

Capability twin of reference `training/src/sampling.py` (C24),
`reverse_eval.py` (C23) and `forward_eval.py` (C26):

  reverse_sample        — noise -> image along the train solver's endpoint
                          chain (sampling.py:7-126)
  forward_sample        — image-latent -> noise (sampling.py:129-237)
  sample_for_fid        — dp-sharded prompt sweep -> images for FID
                          (reverse_eval.py:202-282 distributed_sampling)
  eval_inversion        — forward+reverse round trip over a val set:
                          latent recon-MSE + optional recon-FID
                          (forward_eval.py:259-342)

The multi-GPU all_gather of the reference becomes
`multihost_utils.process_allgather` on multi-host meshes (SURVEY.md §5);
on one host it's a no-op.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence

import jax
import numpy as np

from ..diffusion.schedule import NoiseSchedule
from ..diffusion.solver import SolverGrid, TrainSolver
from ..pipelines import sampler as S


def grid_from_train_solver(
    solver: TrainSolver, start_timestep: int = 19, n_steps: int = 50
) -> SolverGrid:
    """Build the inference (t, s) pairs implied by the training endpoints
    (reference `sampling.py:63-64`: reverse timesteps = flipped forward
    endpoints, boundaries = flipped endpoints; forward starts at 19)."""
    ep = np.asarray(jax.device_get(solver.endpoints))
    fep = np.asarray(jax.device_get(solver.forward_endpoints))
    rev_t = fep[::-1].copy()
    rev_s = ep[::-1].copy()
    fwd_t = ep.copy()
    fwd_t[0] = start_timestep
    fwd_s = fep.copy()
    return SolverGrid(
        reverse_timesteps=rev_t,
        reverse_boundaries=rev_s,
        forward_timesteps=fwd_t,
        forward_boundaries=fwd_s,
        ddim_timesteps=np.asarray(jax.device_get(solver.ddim_timesteps)),
        n_steps=n_steps,
        start_timestep=start_timestep,
    )


def reverse_sample(
    noise_model,
    latent_noise: jax.Array,
    context_uncond: jax.Array,
    context_cond: jax.Array,
    grid: SolverGrid,
    schedule: NoiseSchedule,
    guidance: S.GuidanceConfig,
) -> jax.Array:
    """Noise -> clean latent along the endpoint chain (C24)."""
    return S.cons_generation(
        noise_model, latent_noise, context_uncond, context_cond,
        grid, schedule, guidance,
    )


def forward_sample(
    noise_model,
    latent: jax.Array,
    noise: jax.Array,
    context_uncond: jax.Array,
    context_cond: jax.Array,
    grid: SolverGrid,
    schedule: NoiseSchedule,
    w_embed_dim: int = 0,
) -> jax.Array:
    """Clean latent -> noise (guidance 0 — the forward student trains at
    w == 0, reference train.py:227; C24)."""
    g = S.GuidanceConfig(guidance_scale=0.0, w_embed_dim=w_embed_dim)
    return S.cons_inversion(
        noise_model, latent, noise, context_uncond, context_cond,
        grid, schedule, g,
    )


def sample_for_fid(
    generate_fn: Callable[[Sequence[str], jax.Array], np.ndarray],
    prompts: Sequence[str],
    batch_size: int,
    seed: int = 0,
    max_count: Optional[int] = None,
) -> List[np.ndarray]:
    """Sweep prompts -> uint8 images for FID (C23 distributed_sampling).

    `generate_fn(batch_prompts, key) -> (B, H, W, 3) float [0,1]`.
    On multi-host setups each process handles its `process_index` stride
    and the caller gathers (multihost_utils) — single-host here.
    """
    prompts = list(prompts)[: max_count or len(prompts)]
    n_proc = jax.process_count()
    mine = prompts[jax.process_index()::n_proc]
    images: List[np.ndarray] = []
    for i in range(0, len(mine), batch_size):
        batch = mine[i : i + batch_size]
        if len(batch) < batch_size:
            batch = batch + [batch[-1]] * (batch_size - len(batch))
            extra = len(batch) - len(mine[i : i + batch_size])
        else:
            extra = 0
        key = jax.random.PRNGKey(seed + i)
        out = np.asarray(generate_fn(batch, key))
        out = (np.clip(out, 0, 1) * 255).astype(np.uint8)
        images.extend(list(out[: len(out) - extra] if extra else out))
    if n_proc > 1:  # pragma: no cover - multihost only
        from jax.experimental import multihost_utils

        stacked = np.stack(images) if images else np.zeros((0,))
        gathered = multihost_utils.process_allgather(stacked)
        images = list(gathered.reshape((-1,) + gathered.shape[2:]))
    return images


def eval_inversion(
    invert_fn: Callable,
    reconstruct_fn: Callable,
    val_latents: jax.Array,
    batch_size: int = 8,
    decode_fn: Optional[Callable] = None,
    scorer=None,
    reference_images=None,
    reference_stats_path: Optional[str] = None,
    val_context: Optional[jax.Array] = None,
) -> Dict[str, float]:
    """Forward->reverse round trip over a val set (C26 `eval_inversion`,
    forward_eval.py:259-342): latent recon-MSE, plus — when `decode_fn`
    (latents -> float [0,1] images) and a FID `scorer` are given — the FID
    of the decoded reconstructions against reference stats/images
    (reference `fid_score_cm`, forward_eval.py:296-341).

    `invert_fn(latents, key) -> noise latents`;
    `reconstruct_fn(noise_latents, key) -> latents`.
    With `val_context` (per-sample text context, sliced in lockstep with
    the latents — the reference inverts each COCO image under its own
    caption, forward_eval.py:267-270), both callables receive the context
    chunk as a third argument."""
    mses = []
    recon_images = []
    for i in range(0, val_latents.shape[0], batch_size):
        chunk = val_latents[i : i + batch_size]
        key = jax.random.PRNGKey(i)
        if val_context is not None:
            ctx = val_context[i : i + batch_size]
            inv = invert_fn(chunk, key, ctx)
            rec = reconstruct_fn(inv, key, ctx)
        else:
            inv = invert_fn(chunk, key)
            rec = reconstruct_fn(inv, key)
        mses.append(
            np.mean((np.asarray(rec) - np.asarray(chunk)) ** 2, axis=(1, 2, 3))
        )
        if decode_fn is not None and scorer is not None:
            imgs = np.asarray(decode_fn(rec))
            recon_images.extend(
                list((np.clip(imgs, 0, 1) * 255).astype(np.uint8))
            )
    out = {"inversion_latent_mse": float(np.mean(np.concatenate(mses)))}
    if recon_images:
        if jax.process_count() > 1:  # pragma: no cover - multihost only
            from jax.experimental import multihost_utils

            stacked = multihost_utils.process_allgather(np.stack(recon_images))
            recon_images = list(stacked.reshape((-1,) + stacked.shape[2:]))
        out["inversion_fid"] = float(
            scorer.fid(
                recon_images,
                reference_images=reference_images,
                reference_stats_path=reference_stats_path,
            )
        )
    return out


def fid_of_student(
    pipe,
    lora: Dict,
    scorer,
    prompts: Sequence[str],
    batch_size: int = 8,
    seed: int = 0,
    lora_alpha: float = 8.0,
    reference_images=None,
    reference_stats_path: Optional[str] = None,
    max_count: Optional[int] = None,
) -> float:
    """FID of the live reverse student (reference
    `distributed_sampling` + `calculate_fid`,
    `train_icd_sd15_lora.py:1063-1082`): merge the LoRA into the
    pipeline's base weights, sweep prompts, score against reference
    stats/images.

    pipe: an InvertibleCD with base weights in params["teacher"];
    lora: the student adapter pytree (e.g. state.lora_reverse);
    scorer: metrics.fid.FIDScorer with loaded Inception weights.
    """
    from ..models.lora import merge_lora

    rank = next(iter(lora.values()))["down"].shape[-1]
    inner = pipe.params["teacher"]
    wrap = "params" in inner
    merged = merge_lora(inner["params"] if wrap else inner,
                        jax.device_get(lora), alpha=lora_alpha, rank=rank)
    old = pipe.params.get("reverse")
    pipe.params["reverse"] = {"params": merged} if wrap else merged
    try:
        def gen(batch, key):
            imgs, _ = pipe.generate(list(batch), key=key)
            return imgs

        images = sample_for_fid(gen, prompts, batch_size, seed, max_count)
    finally:
        if old is not None:
            pipe.params["reverse"] = old
    return scorer.fid(
        images,
        reference_images=reference_images,
        reference_stats_path=reference_stats_path,
    )
