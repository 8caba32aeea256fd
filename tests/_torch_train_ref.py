"""Torch transcription of the reference's four iCD training-loss
computations — the differential oracle for invertible_cd_tpu/training/losses.py
(VERDICT round-1 item 6).

Transcribed from reference `training/src/train.py` (reverse 13-182,
forward 185-353, forward-preserve 356-502, reverse-preserve 505-649) and
`training/src/lcm.py` (DDIMSolver 80-170, predicted_origin 45-71), with the
optimizer/accelerator plumbing stripped: each function returns the LOSS
VALUE only, and the random index sampling is replaced by an explicit
`index` argument so both frameworks see identical draws. The denoiser is a
caller-supplied stub shared bit-for-bit with the jax side.

This module lives in tests/ only — it is an oracle, not shipped code.
"""
from __future__ import annotations

import math

import numpy as np
import torch


def make_alphas_cumprod(num_train_timesteps=1000):
    """scaled_linear betas 0.00085 -> 0.012 (reference loading.py:39-40)."""
    betas = (
        torch.linspace(0.00085**0.5, 0.012**0.5, num_train_timesteps) ** 2
    )
    return torch.cumprod(1.0 - betas, dim=0)


def add_noise(alphas_cumprod, latents, noise, t):
    a = alphas_cumprod[t].sqrt().reshape(-1, 1, 1, 1)
    s = (1 - alphas_cumprod[t]).sqrt().reshape(-1, 1, 1, 1)
    return a * latents + s * noise


def guidance_scale_embedding(w, embedding_dim=512):
    w = w * 1000.0
    half_dim = embedding_dim // 2
    emb = math.log(10000.0) / (half_dim - 1)
    emb = torch.exp(torch.arange(half_dim, dtype=torch.float32) * -emb)
    emb = w.float()[:, None] * emb[None, :]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=1)
    if embedding_dim % 2 == 1:
        emb = torch.nn.functional.pad(emb, (0, 1))
    return emb


def predicted_origin(model_output, timesteps, boundary_timesteps, sample, alphas, sigmas):
    sigmas_s = sigmas[boundary_timesteps].reshape(-1, 1, 1, 1).clone()
    alphas_s = alphas[boundary_timesteps].reshape(-1, 1, 1, 1).clone()
    sig = sigmas[timesteps].reshape(-1, 1, 1, 1)
    al = alphas[timesteps].reshape(-1, 1, 1, 1)
    zero = (boundary_timesteps == 0).reshape(-1, 1, 1, 1)
    alphas_s = torch.where(zero, torch.ones_like(alphas_s), alphas_s)
    sigmas_s = torch.where(zero, torch.zeros_like(sigmas_s), sigmas_s)
    pred_x_0 = (sample - sig * model_output) / al
    return alphas_s * pred_x_0 + sigmas_s * model_output


class DDIMSolver:
    def __init__(self, alpha_cumprods, timesteps=1000, ddim_timesteps=50,
                 endpoints="0,259,519,779", forward_endpoints="259,519,779,999"):
        step_ratio = timesteps // ddim_timesteps
        ts = (np.arange(1, ddim_timesteps + 1) * step_ratio).round().astype(np.int64) - 1
        ac = alpha_cumprods.numpy()
        self.ddim_timesteps = torch.from_numpy(ts).long()
        self.ddim_alpha_cumprods_prev = torch.from_numpy(
            np.asarray([ac[0]] + ac[ts[:-1]].tolist())
        )
        self.ddim_alpha_cumprods_next = torch.from_numpy(
            np.asarray(ac[ts[1:]].tolist() + [0.0])
        )
        self.endpoints = torch.tensor([int(e) for e in endpoints.split(",")])
        self.forward_endpoints = torch.tensor(
            [int(e) for e in forward_endpoints.split(",")]
        )

    def ddim_step(self, pred_x0, pred_noise, timestep_index):
        acp = self.ddim_alpha_cumprods_prev[timestep_index].reshape(-1, 1, 1, 1)
        return acp.sqrt() * pred_x0 + (1.0 - acp).sqrt() * pred_noise

    def forward_ddim_step(self, pred_x0, pred_noise, timestep_index):
        acn = self.ddim_alpha_cumprods_next[timestep_index].reshape(-1, 1, 1, 1)
        return acn.sqrt() * pred_x0 + (1.0 - acn).sqrt() * pred_noise


def _huber(pred, target, huber_c):
    return torch.mean(
        torch.sqrt((pred.float() - target.float()) ** 2 + huber_c**2) - huber_c
    )


def reverse_train_loss(
    stub, latents, noise, w, index, solver, alphas_cumprod,
    embed_guidance=True, num_ddim_timesteps=50, num_train_timesteps=1000,
    huber_c=0.001,
):
    """reference train.py:13-182 (loss value only)."""
    topk = num_train_timesteps // num_ddim_timesteps
    start_timesteps = solver.ddim_timesteps[index]
    timesteps = torch.clamp(start_timesteps - topk, 0, solver.ddim_timesteps[-1])

    mask = (timesteps[None, :] >= solver.endpoints[:, None]).to(int)
    mask[:-1] = mask[:-1] - mask[1:]
    boundary_timesteps = (mask * solver.endpoints[:, None]).sum(0)

    noisy = add_noise(alphas_cumprod, latents, noise, start_timesteps)
    alphas = alphas_cumprod.sqrt()
    sigmas = (1 - alphas_cumprod).sqrt()

    w_embedding = guidance_scale_embedding(w.flatten()) if embed_guidance else None

    noise_pred = stub(noisy, start_timesteps, w_embedding)
    model_pred = predicted_origin(
        noise_pred, start_timesteps, boundary_timesteps, noisy, alphas, sigmas
    )

    cond_teacher = stub(noisy, start_timesteps, w_embedding)
    cond_x0 = predicted_origin(
        cond_teacher, start_timesteps, torch.zeros_like(start_timesteps), noisy,
        alphas, sigmas,
    )
    if (w > 0).any() and not embed_guidance:
        uncond_teacher = stub(noisy, start_timesteps, None)
        uncond_x0 = predicted_origin(
            uncond_teacher, start_timesteps, torch.zeros_like(start_timesteps),
            noisy, alphas, sigmas,
        )
        wb = w.reshape(-1, 1, 1, 1)
        pred_x0 = cond_x0 + wb * (cond_x0 - uncond_x0)
        pred_noise = cond_teacher + wb * (cond_teacher - uncond_teacher)
    else:
        pred_x0, pred_noise = cond_x0, cond_teacher
    x_prev = solver.ddim_step(pred_x0, pred_noise, index)

    target_noise_pred = stub(x_prev, timesteps, w_embedding)
    target_pred = predicted_origin(
        target_noise_pred, timesteps, boundary_timesteps, x_prev, alphas, sigmas
    )
    boundary_mask = (timesteps == boundary_timesteps).reshape(-1, 1, 1, 1).to(int)
    target_pred = boundary_mask * x_prev + (1 - boundary_mask) * target_pred

    return _huber(model_pred, target_pred, huber_c)


def forward_train_loss(
    stub, latents, noise, w, index, solver, alphas_cumprod,
    embed_guidance=True, num_ddim_timesteps=50, num_train_timesteps=1000,
    huber_c=0.001,
):
    """reference train.py:185-353 (loss value only). w must be 0."""
    assert (w == 0.0).all()
    topk = num_train_timesteps // num_ddim_timesteps
    start_timesteps = solver.ddim_timesteps[index]
    max_timestep = solver.ddim_timesteps[num_ddim_timesteps - 1]
    timesteps = torch.clamp(start_timesteps + topk, 0, max_timestep)

    mask = (timesteps[None, :] <= solver.forward_endpoints[:, None]).to(int)
    mask[1:] = mask[1:] - mask[:-1]
    boundary_timesteps = (mask * solver.forward_endpoints[:, None]).sum(0)

    noisy = add_noise(alphas_cumprod, latents, noise, start_timesteps)
    alphas = alphas_cumprod.sqrt()
    sigmas = (1 - alphas_cumprod).sqrt()
    w_embedding = guidance_scale_embedding(w.flatten()) if embed_guidance else None

    noise_pred = stub(noisy, start_timesteps, w_embedding)
    model_pred = predicted_origin(
        noise_pred, start_timesteps, boundary_timesteps, noisy, alphas, sigmas
    )

    cond_teacher = stub(noisy, start_timesteps, w_embedding)
    cond_x0 = predicted_origin(
        cond_teacher, start_timesteps, torch.zeros_like(start_timesteps), noisy,
        alphas, sigmas,
    )
    x_next = solver.forward_ddim_step(cond_x0, cond_teacher, index)

    target_noise_pred = stub(x_next, timesteps, w_embedding)
    target_pred = predicted_origin(
        target_noise_pred, timesteps, boundary_timesteps, x_next, alphas, sigmas
    )
    boundary_mask = (timesteps == boundary_timesteps).reshape(-1, 1, 1, 1).to(int)
    target_pred = boundary_mask * x_next + (1 - boundary_mask) * target_pred

    return _huber(model_pred, target_pred, huber_c)


def forward_preserve_loss(
    stub_forward, stub_reverse, latents, noise, endpoint_index, solver,
    alphas_cumprod, start_forward_timestep=19, huber_c=0.001,
):
    """reference train.py:356-502 (loss value only, always embed_guidance)."""
    num_reverse_steps = len(solver.endpoints) // len(solver.forward_endpoints)
    start_timesteps = solver.forward_endpoints[endpoint_index]
    left_end = solver.endpoints[::num_reverse_steps][endpoint_index].clone()
    left_end[left_end == 0] = start_forward_timestep
    reverse_timesteps = solver.endpoints.reshape(-1, num_reverse_steps)[
        endpoint_index
    ].clone()
    reverse_timesteps[reverse_timesteps == 0] = start_forward_timestep

    start_input = add_noise(alphas_cumprod, latents, noise, start_timesteps)
    alphas = alphas_cumprod.sqrt()
    sigmas = (1 - alphas_cumprod).sqrt()
    zero_w = torch.zeros(latents.shape[0])
    w_embedding = guidance_scale_embedding(zero_w)

    current = start_timesteps
    x = start_input
    for i in range(num_reverse_steps):
        noise_pred = stub_reverse(x, current, w_embedding)
        nxt = reverse_timesteps[:, num_reverse_steps - i - 1]
        x = predicted_origin(noise_pred, current, nxt, x, alphas, sigmas)
        current = nxt

    target_noise_pred = stub_forward(x, left_end, w_embedding)
    pred = predicted_origin(target_noise_pred, left_end, start_timesteps, x, alphas, sigmas)
    return _huber(pred, start_input, huber_c)


def reverse_preserve_loss(
    stub_forward, stub_reverse, latents, noise, endpoint_index, solver,
    alphas_cumprod, start_forward_timestep=19, huber_c=0.001,
):
    """reference train.py:505-649 (loss value only, always embed_guidance)."""
    num_reverse_steps = len(solver.endpoints) // len(solver.forward_endpoints)
    start_timesteps = solver.endpoints[::num_reverse_steps][endpoint_index].clone()
    start_timesteps[start_timesteps == 0] = start_forward_timestep
    end_timesteps = solver.forward_endpoints[endpoint_index]
    reverse_timesteps = solver.endpoints.reshape(-1, num_reverse_steps)[
        endpoint_index
    ].clone()
    reverse_timesteps[reverse_timesteps == 0] = start_forward_timestep

    start_input = add_noise(alphas_cumprod, latents, noise, start_timesteps)
    alphas = alphas_cumprod.sqrt()
    sigmas = (1 - alphas_cumprod).sqrt()
    zero_w = torch.zeros(latents.shape[0])
    w_embedding = guidance_scale_embedding(zero_w)

    noise_pred = stub_forward(start_input, start_timesteps, w_embedding)
    x = predicted_origin(
        noise_pred, start_timesteps, end_timesteps, start_input, alphas, sigmas
    )

    current = end_timesteps
    for i in range(num_reverse_steps):
        noise_pred = stub_reverse(x, current, w_embedding)
        nxt = reverse_timesteps[:, num_reverse_steps - i - 1]
        x = predicted_origin(noise_pred, current, nxt, x, alphas, sigmas)
        current = nxt

    return _huber(x, start_input, huber_c)
