"""On-chip SDXL training-step bisect (VERDICT r3 item 3).

The reference trains SDXL students on real hardware
(`training/train_icd_xl_lora.py:822-903`). Here, the full SDXL backward
at 128^2 latents compiles with stock XLA (AOT lower+compile verified) but
this container's tunneled remote-compile service 500s on it. This tool
attacks the blocker empirically: it walks an ablation ladder of
SDXL-ARCHITECTURE train steps from small to full —

    depth  = transformer_depth at the top level (1, 2, 4, 10=real)
    latent = 32, 64, 96, 128(=1024^2 real)
    losses = cd2 (reverse+forward CD) or full4 (+both preserves)
    split  = per-student program split (--split_step), remat always on

— compiling and RUNNING one optimizer step per rung on the real chip,
and records per rung: compile seconds, step seconds, or the exact
failure signature. The output pins (a) the LARGEST SDXL-architecture
step that trains on this chip and (b) the service cliff.

Measured (round 5): fusing the depth-4 @ 96^2 cd2 rung into ONE program
(--no_split) is an HBM permanent error — 15.86G needed vs 15.75G
(program 8.99G + arguments 6.87G) — so the per-student split step is a
memory requirement on this chip, not just a compile-service workaround.

Usage:
  python tools/exp_sdxl_onchip.py                 # the ladder
  python tools/exp_sdxl_onchip.py --depth 10 --latent 128 --losses full4
  python tools/exp_sdxl_onchip.py --out /tmp/sdxl_onchip.jsonl
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
import traceback

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np


def build_step(depth: int, latent: int, losses: str, split: bool,
               batch: int, lazy: bool = False):
    from invertible_cd_tpu.diffusion.schedule import make_schedule
    from invertible_cd_tpu.diffusion.solver import make_train_solver
    from invertible_cd_tpu.models import UNet2DCondition, UNetConfig
    from invertible_cd_tpu.training import (
        LossConfig,
        TrainConfig,
        init_train_state,
        make_train_step,
    )

    cfg = dataclasses.replace(
        UNetConfig.sdxl(),
        transformer_depth=(1, 2, depth),
    )
    unet = UNet2DCondition(cfg, dtype=jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda: unet.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, latent, latent, 4), jnp.bfloat16),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 77, cfg.cross_attention_dim), jnp.bfloat16),
            jnp.zeros((1, cfg.time_cond_proj_dim), jnp.bfloat16),
            {"text_embeds": jnp.zeros((1, 1280), jnp.bfloat16),
             "time_ids": jnp.zeros((1, 6), jnp.bfloat16)},
        )
    )
    base = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes)
    schedule = make_schedule()
    solver = make_train_solver(
        np.asarray(schedule.alphas_cumprod),
        num_endpoints=4, num_forward_endpoints=4,
        endpoints="0,249,499,699", forward_endpoints="249,499,699,999",
    )
    full = losses == "full4"
    tcfg = TrainConfig(
        lora_rank=64, remat=True, bf16_moments=True, lazy_lora=lazy,
        use_forward_preserve=full, use_reverse_preserve=full,
        loss=LossConfig(w_embed_dim=cfg.time_cond_proj_dim),
    )
    state = init_train_state(jax.random.PRNGKey(1), base, tcfg)
    step = make_train_step(unet, base, base, solver, schedule, tcfg,
                           split=split)
    rng = np.random.default_rng(0)
    batch_d = {
        "latents": jnp.asarray(
            rng.normal(size=(batch, latent, latent, 4)), jnp.float32),
        "context": jnp.asarray(
            0.1 * rng.normal(size=(batch, 77, cfg.cross_attention_dim)),
            jnp.float32),
        "added_cond": {
            "text_embeds": jnp.asarray(
                0.1 * rng.normal(size=(batch, 1280)), jnp.float32),
            "time_ids": jnp.broadcast_to(
                jnp.asarray([1024., 1024., 0., 0., 1024., 1024.]),
                (batch, 6)),
        },
    }
    return step, state, base, batch_d


def run_rung(depth: int, latent: int, losses: str, split: bool,
             batch: int, lazy: bool = False) -> dict:
    rec = {"depth": depth, "latent": latent, "losses": losses,
           "split": split, "batch": batch, "lazy": lazy}
    t0 = time.perf_counter()
    try:
        step, state, base, batch_d = build_step(
            depth, latent, losses, split, batch, lazy
        )
        new_state, metrics = step(
            state, base, base, batch_d, jax.random.PRNGKey(2)
        )
        # fence with a value fetch (block_until_ready is a no-op on the
        # tunneled backend)
        m = {k: float(v) for k, v in metrics.items()}
        rec["compile_plus_step_s"] = round(time.perf_counter() - t0, 1)
        # steady-state step time (program now cached)
        t1 = time.perf_counter()
        new_state, metrics = step(
            new_state, base, base, batch_d, jax.random.PRNGKey(3)
        )
        _ = {k: float(v) for k, v in metrics.items()}
        rec["step_s"] = round(time.perf_counter() - t1, 3)
        rec["metrics"] = {k: round(v, 5) for k, v in m.items()}
        rec["ok"] = all(np.isfinite(v) for v in m.values())
    except Exception as e:  # noqa: BLE001 — the signature IS the data
        rec["ok"] = False
        rec["error"] = f"{type(e).__name__}: {str(e)[:500]}"
        rec["elapsed_s"] = round(time.perf_counter() - t0, 1)
        rec["traceback_tail"] = traceback.format_exc()[-500:]
    return rec


LADDER = [
    # (depth, latent, losses, split) — cheap -> full
    (1, 32, "cd2", True),
    (2, 64, "cd2", True),
    (4, 64, "cd2", True),
    (4, 96, "cd2", True),
    (10, 64, "cd2", True),
    (10, 96, "cd2", True),
    (10, 128, "cd2", True),
    (10, 128, "full4", True),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=None)
    ap.add_argument("--latent", type=int, default=None)
    ap.add_argument("--losses", default=None, choices=["cd2", "full4"])
    ap.add_argument("--no_split", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--out", default="/tmp/sdxl_onchip.jsonl")
    args = ap.parse_args()

    if args.depth is not None:
        rungs = [(args.depth, args.latent or 64, args.losses or "cd2",
                  not args.no_split)]
    else:
        rungs = LADDER
    with open(args.out, "a") as f:
        for depth, latent, losses, split in rungs:
            print(f"--- rung depth={depth} latent={latent} losses={losses} "
                  f"split={split}", flush=True)
            rec = run_rung(depth, latent, losses, split, args.batch)
            print(json.dumps(rec), flush=True)
            f.write(json.dumps(rec) + "\n")
            f.flush()
            # no early stop: failures are not monotonic in size (the
            # first ladder run "found the cliff" at latent=96, which
            # turned out to be a block-divisibility bug in the Pallas
            # kernel, not a service limit — larger rungs were fine)


if __name__ == "__main__":
    main()
