"""iCD LoRA training entry point (capability twin of reference
`training/train_icd_sd15_lora.py` / `train_icd_xl_lora.py`, C21/C22).

One pjit-compiled step trains both students (reverse + forward LoRA) with
all four losses over a dp(x fsdp) mesh; checkpoints rotate via orbax and
export kohya-format LoRA for inference; validation images and FID hooks
run on the cadence flags.

Example (smoke, random weights, synthetic data):
  python cli/train_icd.py --model tiny --synthetic_data --max_steps 3 \
      --batch_size 8 --output_dir /tmp/icd_run
Real training consumes a COCO-style folder + captions CSV and converted
base/teacher checkpoints (models/convert.py).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Persist XLA executables across runs: full-size train-step compiles cost
# tens of minutes on this container's remote-compile service, and a fresh
# process pays them twice (initial compile + a one-time re-specialization
# once the step's output-state layouts feed back in as inputs).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/icd_tpu_jax_cache")

# --platform must take effect before jax initialises its backends.
if "--platform" in sys.argv:
    _plat = sys.argv[sys.argv.index("--platform") + 1]
    if _plat == "cpu":
        os.environ.setdefault(
            "XLA_FLAGS",
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8",
        )
    import jax

    jax.config.update("jax_platforms", _plat)

import jax
import jax.numpy as jnp
import numpy as np

from invertible_cd_tpu.utils.cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()




def apply_config_file(p: "argparse.ArgumentParser", argv):
    """--config file.json sets parser defaults (CLI flags still override) —
    the typed replacement for the reference's bash-launcher configs."""
    import json

    argv = list(sys.argv[1:] if argv is None else argv)
    if "--config" in argv:
        path = argv[argv.index("--config") + 1]
        with open(path) as f:
            cfg = json.load(f)
        known = {a.dest for a in p._actions}
        mapped = {
            k: v for k, v in cfg.items()
            if not k.startswith("_") and k in known
        }
        p.set_defaults(**mapped)
    return argv


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None, help="JSON config with flag defaults (configs/*.json)")
    p.add_argument("--model", default="sd15", choices=["sd15", "sdxl", "tiny"])
    p.add_argument("--output_dir", required=True)
    p.add_argument("--base_params", default=None,
                   help="orbax dir or torch .pt/.safetensors with the base UNet "
                        "(guidance-distilled teacher) weights")
    p.add_argument("--data_root", default=None)
    p.add_argument("--data_subset", default="train")
    p.add_argument("--synthetic_data", action="store_true",
                   help="random latents/contexts (smoke tests, no dataset)")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--max_steps", type=int, default=6000)
    p.add_argument("--learning_rate", type=float, default=8e-6)
    p.add_argument("--lora_rank", type=int, default=64)
    p.add_argument("--loss_type", default="huber", choices=["huber", "l2"])
    p.add_argument("--huber_c", type=float, default=0.001)
    p.add_argument("--num_ddim_timesteps", type=int, default=50)
    p.add_argument("--endpoints", default=None,
                   help="default 0,259,519,779 (SD1.5) / 0,249,499,699 "
                        "(SDXL, reference run_sdxl_lora.sh)")
    p.add_argument("--forward_endpoints", default=None,
                   help="default 259,519,779,999 (SD1.5) / 249,499,699,999 "
                        "(SDXL)")
    p.add_argument("--forward_preserve_coef", type=float, default=1.5)
    p.add_argument("--reverse_preserve_coef", type=float, default=1.5)
    p.add_argument("--no_forward_preserve", action="store_true")
    p.add_argument("--no_reverse_preserve", action="store_true")
    p.add_argument("--embed_guidance", action="store_true", default=True)
    p.add_argument("--discrete_w", default="0,7,11,15,19")
    p.add_argument("--checkpointing_steps", type=int, default=500)
    p.add_argument("--checkpoints_total_limit", type=int, default=5)
    p.add_argument("--validation_steps", type=int, default=500)
    p.add_argument("--evaluation_steps", type=int, default=0,
                   help="run FID eval of the reverse student every N steps "
                        "(requires --fid_* flags)")
    p.add_argument("--fid_stats", default=None,
                   help="npz with mu/sigma reference statistics "
                        "(the reference's fid_stats_mscoco256_val.npz)")
    p.add_argument("--fid_prompts", default=None,
                   help="generation benchmark CSV for the FID sweep")
    p.add_argument("--fid_num_samples", type=int, default=5000)
    p.add_argument("--inception_weights", default=None,
                   help="pt_inception-2015-12-05 torch state dict")
    p.add_argument("--resume_from_checkpoint", default=None,
                   help='"latest" or a step number')
    p.add_argument("--vae_checkpoint", default=None,
                   help="diffusers AutoencoderKL state dict for the data "
                        "encoder / validation decoder")
    p.add_argument("--text_checkpoint", default=None,
                   help="transformers CLIPTextModel state dict(s); for SDXL "
                        "pass 'clip_l.safetensors,clip_bigg.safetensors'")
    p.add_argument("--validation_prompts_max", type=int, default=13,
                   help="how many of the 13 reference validation prompts to "
                        "render each validation step")
    p.add_argument("--validation_batch", type=int, default=4)
    p.add_argument("--validation_guidance", type=float, default=7.0)
    p.add_argument("--inversion_validation_samples", type=int, default=4,
                   help="triptych panels (decoded noise latent / original / "
                        "reconstruction) from the live forward+reverse "
                        "students each validation step; 0 disables "
                        "(reference log_validation_inversion, "
                        "training/src/forward_eval.py:96-191)")
    p.add_argument("--inversion_eval_steps", type=int, default=0,
                   help="run the forward-student eval (latent recon-MSE + "
                        "recon-FID when --fid_stats/--inception_weights are "
                        "set) every N steps (reference eval_inversion, "
                        "training/src/forward_eval.py:259-342)")
    p.add_argument("--inversion_eval_samples", type=int, default=32)
    p.add_argument("--val_data_subset", default="val",
                   help="captions CSV subset used for the inversion eval "
                        "(reference uses the COCO val split)")
    p.add_argument("--platform", default=None, help="cpu|tpu backend override (cpu needed for smoke tests in tunneled-TPU containers)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--remat", action="store_true",
                   help="gradient checkpointing on the student UNets")
    p.add_argument("--split_step", action="store_true",
                   help="compile the reverse/forward student updates as two "
                        "separate XLA programs (same numerics; halves the "
                        "program size — use for SDXL-scale compiles)")
    p.add_argument("--bf16_params", action="store_true",
                   help="store base/teacher params in bf16 (halves HBM; "
                        "LoRA adapters and optimizer stay fp32)")
    p.add_argument("--lazy_lora", action="store_true",
                   help="apply adapters lazily per layer instead of "
                        "materialising merged parameter copies in the step "
                        "(identical numerics; saves a full parameter set "
                        "per student + the merge's full-size kernel "
                        "cotangents — fits full SDXL on one 16 GB chip)")
    p.add_argument("--bf16_moments", action="store_true",
                   help="store Adam's first moment in bf16 (both students' "
                        "r=64 LoRA opt states are ~6 GB fp32 — needed to "
                        "stay HBM-resident on a single 16 GB chip)")
    p.add_argument("--skip_nonfinite", action="store_true",
                   help="skip optimizer updates whose gradients contain "
                        "NaN/Inf instead of poisoning the adapters; after "
                        "100 consecutive bad steps the NaN surfaces "
                        "(optax apply_if_finite)")
    p.add_argument("--log_every", type=int, default=10)
    argv = apply_config_file(p, argv)
    return p.parse_args(argv)


def build_models(args):
    from invertible_cd_tpu.models import UNet2DCondition, UNetConfig

    if args.model == "tiny":
        cfg = UNetConfig.tiny()
        latent = 8
    elif args.model == "sdxl":
        cfg = UNetConfig.sdxl()
        latent = args.resolution // 8
    else:
        cfg = UNetConfig.sd15()
        latent = args.resolution // 8
    unet = UNet2DCondition(cfg, dtype=jnp.bfloat16 if args.model != "tiny" else jnp.float32)
    rng = jax.random.PRNGKey(args.seed)
    # Param shapes don't depend on spatial size — init at a small probe
    # resolution so the init compile stays cheap (a full-res SDXL init is
    # a multi-minute XLA program for nothing).
    init_latent = min(latent, 32)
    sample = jnp.zeros((1, init_latent, init_latent, 4))
    ctx = jnp.zeros((1, 77, cfg.cross_attention_dim))
    wv = jnp.zeros((1, cfg.time_cond_proj_dim))
    added = None
    if cfg.addition_embed_dim is not None:
        pooled = cfg.addition_embed_dim - 6 * cfg.addition_time_embed_dim
        added = {"text_embeds": jnp.zeros((1, pooled)), "time_ids": jnp.zeros((1, 6))}
    if args.base_params:
        from invertible_cd_tpu.models.convert import (
            convert_unet_from_diffusers,
            load_torch_file,
        )

        base = convert_unet_from_diffusers(load_torch_file(args.base_params))
        base = jax.tree.map(jnp.asarray, base)
    else:
        base = unet.init(rng, sample, jnp.zeros((1,), jnp.int32), ctx, wv, added)
    if args.bf16_params:
        base = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            base,
        )
    return unet, cfg, base, latent


def build_encoder_pipe(args, base=None):
    """Text/VAE encoder-decoder pipeline matching --model, used for the
    real-data path (VAE+CLIP encoding, reference
    `train_icd_sd15_lora.py:874-879` / `train_icd_xl_lora.py:822-861`),
    validation image panels and FID eval. `base` (the training base UNet
    params) becomes the pipe's teacher so the live LoRA can be merged in."""
    if args.model == "tiny":
        from invertible_cd_tpu.testing import tiny_bundle

        pipe = tiny_bundle()
    else:
        from invertible_cd_tpu.models.convert import (
            convert_clip_text_from_transformers, load_torch_file,
        )
        from invertible_cd_tpu.pipelines.loading import load_bundle_params

        lat = (args.resolution // 8,) * 2
        if args.model == "sdxl":
            from invertible_cd_tpu.pipelines.sdxl import InvertibleCDXL

            pipe = InvertibleCDXL.sdxl(latent_size=lat)
            pipe.default_resolution = args.resolution
        else:
            from invertible_cd_tpu.pipelines.pipeline import InvertibleCD

            pipe = InvertibleCD.sd15(latent_size=lat)
        text_paths = args.text_checkpoint.split(",") if args.text_checkpoint else []
        pipe.params = load_bundle_params(
            vae=args.vae_checkpoint,
            text=text_paths[0] if text_paths else None,
            params=pipe.params,
        )
        if len(text_paths) > 1:
            pipe.params["text_2"] = convert_clip_text_from_transformers(
                load_torch_file(text_paths[1])
            )
    if base is not None:
        pipe.params["teacher"] = base
    return pipe


def batch_iterator(args, cfg, latent_size, pipe=None):
    if args.synthetic_data or args.data_root is None:
        def synth():
            i = 0
            while True:
                k = jax.random.PRNGKey(args.seed * 100003 + i)
                k1, k2, k3 = jax.random.split(k, 3)
                batch = {
                    "latents": jax.random.normal(
                        k1, (args.batch_size, latent_size, latent_size, 4)
                    ),
                    "context": 0.1 * jax.random.normal(
                        k2, (args.batch_size, 77, cfg.cross_attention_dim)
                    ),
                }
                if cfg.addition_embed_dim is not None:
                    pooled = cfg.addition_embed_dim - 6 * cfg.addition_time_embed_dim
                    r = float(args.resolution)
                    batch["added_cond"] = {
                        "text_embeds": 0.1 * jax.random.normal(
                            k3, (args.batch_size, pooled)
                        ),
                        "time_ids": jnp.tile(
                            jnp.asarray([[r, r, 0.0, 0.0, r, r]]),
                            (args.batch_size, 1),
                        ),
                    }
                yield batch
                i += 1
        return synth()

    # Real data: pixels -> VAE latents + text context per batch.
    from invertible_cd_tpu.data import ImageCaptionDataset, make_train_iterator

    assert pipe is not None, "real-data training needs the encoder pipe"
    is_sdxl = args.model == "sdxl"
    ds = ImageCaptionDataset(args.data_root, args.data_subset, args.resolution)
    raw = make_train_iterator(
        ds, args.batch_size, rank=jax.process_index(),
        num_replicas=jax.process_count(), seed=args.seed,
    )
    encode_img = jax.jit(lambda p, x: pipe._encode_image(p, x))
    # VAE encode chunk: 32 for SD1.5, 4 for SDXL (reference
    # train_icd_sd15_lora.py:874-877 / train_icd_xl_lora.py VAE chunking)
    chunk = 4 if is_sdxl else 32

    def real():
        r = float(args.resolution)
        for imgs, caps in raw:
            lat = []
            for i in range(0, len(imgs), chunk):
                lat.append(encode_img(pipe.params["vae"], jnp.asarray(imgs[i:i + chunk])))
            batch = {"latents": jnp.concatenate(lat)}
            if is_sdxl:
                # dual-encoder context + pooled embeds + time_ids per batch
                # (reference train_icd_xl_lora.py:822-861)
                ctx, pooled = pipe.encode_prompt_xl(list(caps))
                batch["context"] = ctx
                batch["added_cond"] = {
                    "text_embeds": pooled,
                    "time_ids": pipe.add_time_ids(
                        len(caps), original_size=(r, r), target_size=(r, r)
                    ),
                }
            else:
                _, ctx = pipe.encode_prompt(list(caps))
                batch["context"] = ctx
            yield batch
    return real()


# The reference's fixed validation prompt list
# (training/src/reverse_eval.py:129-143), logged as tensorboard panels.
VALIDATION_PROMPTS = [
    "portrait photo of a girl, photograph, highly detailed face, depth of "
    "field, moody light, golden hour, style by Dan Winters, Russell James, "
    "Steve McCurry, centered, extremely detailed, Nikon D850, award winning "
    "photography",
    "Self-portrait oil painting, a beautiful cyborg with golden hair, 8k",
    "Astronaut in a jungle, cold color palette, muted colors, detailed, 8k",
    "A photo of beautiful mountain with realistic sunset and blue lake, "
    "highly detailed, masterpiece",
    "A sad puppy with large eyes",
    "A girl with pale blue hair and a cami tank top",
    "cute girl, Kyoto animation, 4k, high resolution",
    "A person laying on a surfboard holding his dog",
    "Green commercial building with refrigerator and refrigeration units "
    "outside",
    "An airplane with two propellor engines flying in the sky",
    "Four cows in a pen on a sunny day",
    "Three dogs sleeping together on an unmade bed",
    "a deer with bird feathers, highly detailed, full body",
]


def log_validation(logger, pipe, base, state, tcfg, solver, step, args):
    """Prompt-conditioned, VAE-decoded validation panels from the live
    reverse student (reference `log_validation`,
    training/src/reverse_eval.py:129-173): the 13 fixed prompts, rendered
    at the training endpoint grid, logged as image grids."""
    from invertible_cd_tpu.models.lora import merge_lora
    from invertible_cd_tpu.training.eval import grid_from_train_solver

    inner = base["params"] if "params" in base else base
    merged = merge_lora(
        inner, jax.device_get(state.lora_reverse),
        alpha=tcfg.lora_alpha, rank=tcfg.lora_rank,
    )
    old_reverse = pipe.params.get("reverse")
    old_grid = pipe.grid
    pipe.params["reverse"] = {"params": merged} if "params" in base else merged
    pipe.grid = grid_from_train_solver(solver)
    # compiled programs capture the grid at build time — invalidate them
    pipe._jit_cache.clear()
    g = pipe.default_guidance(guidance_scale=args.validation_guidance)
    try:
        stds = []
        for prompt in VALIDATION_PROMPTS[: args.validation_prompts_max]:
            imgs, _ = pipe.generate(
                [prompt] * args.validation_batch,
                key=jax.random.PRNGKey(42), guidance=g,
            )
            logger.log_images(
                step, f"validation/{prompt[:48]}", np.asarray(imgs)
            )
            stds.append(float(np.std(np.asarray(imgs))))
        if stds:  # --validation_prompts_max 0 renders nothing
            logger.log(step, {"validation_image_std": float(np.mean(stds))})
    finally:
        if old_reverse is not None:
            pipe.params["reverse"] = old_reverse
        pipe.grid = old_grid
        pipe._jit_cache.clear()


def _merged_student(pipe, base, state, tcfg, which):
    """Merge one live student's LoRA into the base params, returning a
    params tree shaped like pipe.params entries."""
    from invertible_cd_tpu.models.lora import merge_lora

    inner = base["params"] if "params" in base else base
    lora = state.lora_reverse if which == "reverse" else state.lora_forward
    merged = merge_lora(
        inner, jax.device_get(lora), alpha=tcfg.lora_alpha, rank=tcfg.lora_rank
    )
    return {"params": merged} if "params" in base else merged


def _roundtrip_fns(pipe, solver, w_embed_dim):
    """jit-compiled latent-level invert (forward student) / reconstruct
    (reverse student) on the training endpoint grid, both at guidance 0
    (the reference evaluates inversion only for unguided processes in both
    directions, forward_eval.py:101-104,148-151).

    Memoized on the pipe: log_validation_inversion and run_inversion_eval
    each want these every cadence step — fresh @jax.jit closures would
    re-trace (and remote-recompile) the multi-hop UNet programs per call;
    cached ones just take the new merged params as arguments. The memo
    lives in its OWN attribute (not pipe._jit_cache, which log_validation
    deliberately clears around its grid swap) and keys on the solver's
    endpoint grid, so a different solver never gets stale programs."""
    from invertible_cd_tpu.pipelines import sampler as S
    from invertible_cd_tpu.training.eval import grid_from_train_solver

    grid = grid_from_train_solver(solver)
    cache = pipe.__dict__.setdefault("_train_roundtrip_cache", {})
    cache_key = (
        w_embed_dim,
        tuple(grid.reverse_timesteps), tuple(grid.reverse_boundaries),
        tuple(grid.forward_timesteps), tuple(grid.forward_boundaries),
    )
    if cache_key in cache:
        return cache[cache_key]
    g = S.GuidanceConfig(guidance_scale=0.0, w_embed_dim=w_embed_dim)

    @jax.jit
    def invert(fwd_params, latents, noise, ctx):
        return S.cons_inversion(
            pipe._noise_model(fwd_params), latents, noise, ctx, ctx,
            grid, pipe.schedule, g,
        )

    @jax.jit
    def reconstruct(rev_params, noise_latents, ctx):
        return S.cons_generation(
            pipe._noise_model(rev_params), noise_latents, ctx, ctx,
            grid, pipe.schedule, g,
        )

    cache[cache_key] = (invert, reconstruct)
    return invert, reconstruct


def collect_val_batch(args, cfg, latent_size, pipe, n):
    """n validation samples as {"latents", "context"} — VAE/CLIP-encoded
    from the --val_data_subset captions CSV, or deterministic synthetic
    tensors in --synthetic_data mode."""
    if args.synthetic_data or args.data_root is None:
        k1, k2 = jax.random.split(jax.random.PRNGKey(args.seed + 999))
        return {
            "latents": jax.random.normal(k1, (n, latent_size, latent_size, 4)),
            "context": 0.1 * jax.random.normal(
                k2, (n, 77, cfg.cross_attention_dim)
            ),
        }
    from invertible_cd_tpu.data import ImageCaptionDataset

    ds = ImageCaptionDataset(args.data_root, args.val_data_subset, args.resolution)
    imgs, caps = zip(*(ds[i] for i in range(min(n, len(ds)))))
    lat = pipe._encode_image(pipe.params["vae"], jnp.asarray(np.stack(imgs)))
    _, ctx = pipe.encode_prompt(list(caps))
    return {"latents": lat, "context": ctx}


def log_validation_inversion(logger, pipe, base, state, tcfg, solver, step, args, val_batch):
    """Inversion triptych panels from the live students (reference
    `log_validation_inversion`, training/src/forward_eval.py:96-191): for
    each val sample log [VAE-decoded noise latent, original, forward+reverse
    reconstruction], all from one forward->reverse round trip."""
    fwd = _merged_student(pipe, base, state, tcfg, "forward")
    rev = _merged_student(pipe, base, state, tcfg, "reverse")
    invert, reconstruct = _roundtrip_fns(pipe, solver, pipe.w_embed_dim)
    lat = val_batch["latents"]
    ctx = val_batch["context"].astype(lat.dtype)
    noise = jax.random.normal(jax.random.PRNGKey(args.seed), lat.shape, lat.dtype)
    noisy = invert(fwd, lat, noise, ctx)
    recon = reconstruct(rev, noisy, ctx)
    dec = pipe._get_jit("decode")
    vae = pipe.params["vae"]
    panel = np.stack(
        [
            np.asarray(dec(vae, noisy)),   # decoded noise latent
            np.asarray(dec(vae, lat)),     # original
            np.asarray(dec(vae, recon)),   # n-step reconstruction
        ],
        axis=1,
    )  # (B, 3, H, W, C)
    for i in range(panel.shape[0]):
        logger.log_images(step, f"inversion/sample_{i}", panel[i])
    mse = float(np.mean((np.asarray(recon) - np.asarray(lat)) ** 2))
    logger.log(step, {"inversion_panel_latent_mse": mse})
    return mse


def run_inversion_eval(args, state, pipe, base, tcfg, solver, val_batch):
    """Forward-student eval on cadence: latent recon-MSE over the val set,
    plus recon-FID when the FID artifacts are configured (reference trainer
    wiring, train_icd_sd15_lora.py:1085-1096)."""
    from invertible_cd_tpu.training.eval import eval_inversion

    fwd = _merged_student(pipe, base, state, tcfg, "forward")
    rev = _merged_student(pipe, base, state, tcfg, "reverse")
    invert, reconstruct = _roundtrip_fns(pipe, solver, pipe.w_embed_dim)
    lat = val_batch["latents"]
    ctx = val_batch["context"].astype(lat.dtype)

    def invert_fn(chunk, key, c):
        noise = jax.random.normal(key, chunk.shape, chunk.dtype)
        return invert(fwd, chunk, noise, c)

    def reconstruct_fn(noisy, key, c):
        return reconstruct(rev, noisy, c)

    decode_fn = scorer = None
    if args.fid_stats and args.inception_weights:
        from invertible_cd_tpu.metrics import FIDScorer
        from invertible_cd_tpu.models.convert import (
            convert_inception_weights, load_torch_file,
        )

        scorer = FIDScorer(
            convert_inception_weights(load_torch_file(args.inception_weights))
        )
        dec = pipe._get_jit("decode")
        decode_fn = lambda z: dec(pipe.params["vae"], z)  # noqa: E731
    return eval_inversion(
        invert_fn, reconstruct_fn, lat,
        batch_size=min(8, lat.shape[0]),
        decode_fn=decode_fn, scorer=scorer,
        reference_stats_path=args.fid_stats,
        val_context=ctx,
    )


def run_fid_eval(args, state, pipe):
    """FID of the live reverse student against reference statistics
    (reference trainer cadence, train_icd_sd15_lora.py:1063-1082)."""
    from invertible_cd_tpu.data import load_benchmark
    from invertible_cd_tpu.metrics import FIDScorer
    from invertible_cd_tpu.models.convert import (
        convert_inception_weights, load_torch_file,
    )
    from invertible_cd_tpu.training.eval import fid_of_student

    variables = convert_inception_weights(load_torch_file(args.inception_weights))
    scorer = FIDScorer(variables)
    prompts = load_benchmark(args.fid_prompts, kind="generation",
                             max_count=args.fid_num_samples)
    return fid_of_student(
        pipe, jax.device_get(state.lora_reverse), scorer, prompts,
        batch_size=8, reference_stats_path=args.fid_stats,
    )


def main(argv=None):
    args = parse_args(argv)
    if args.endpoints is None:
        # reference grids: run_sd15_lora.sh vs run_sdxl_lora.sh
        args.endpoints = (
            "0,249,499,699" if args.model == "sdxl" else "0,259,519,779"
        )
    if args.forward_endpoints is None:
        args.forward_endpoints = (
            "249,499,699,999" if args.model == "sdxl" else "259,519,779,999"
        )
    from invertible_cd_tpu.diffusion.schedule import make_schedule
    from invertible_cd_tpu.diffusion.solver import make_train_solver
    from invertible_cd_tpu.parallel import make_mesh, shard_batch, shard_params
    from invertible_cd_tpu.training import (
        LossConfig, TrainConfig, init_train_state, make_train_step,
    )
    from invertible_cd_tpu.training.checkpoint import (
        export_inference, latest_step, restore_checkpoint, save_checkpoint,
    )
    from invertible_cd_tpu.utils.logging import MetricLogger

    os.makedirs(args.output_dir, exist_ok=True)
    logger = MetricLogger(os.path.join(args.output_dir, "logs"))
    unet, cfg, base, latent_size = build_models(args)
    schedule = make_schedule()
    solver = make_train_solver(
        np.asarray(schedule.alphas_cumprod),
        num_ddim_timesteps=args.num_ddim_timesteps,
        num_endpoints=len(args.endpoints.split(",")),
        num_forward_endpoints=len(args.forward_endpoints.split(",")),
        endpoints=args.endpoints,
        forward_endpoints=args.forward_endpoints,
    )
    tcfg = TrainConfig(
        learning_rate=args.learning_rate,
        lora_rank=args.lora_rank,
        remat=args.remat,
        lazy_lora=args.lazy_lora,
        bf16_moments=args.bf16_moments,
        skip_nonfinite=args.skip_nonfinite,
        discrete_w=tuple(float(w) for w in args.discrete_w.split(",")) or None,
        use_forward_preserve=not args.no_forward_preserve,
        use_reverse_preserve=not args.no_reverse_preserve,
        loss=LossConfig(
            num_ddim_timesteps=args.num_ddim_timesteps,
            loss_type=args.loss_type,
            huber_c=args.huber_c,
            embed_guidance=args.embed_guidance,
            w_embed_dim=cfg.time_cond_proj_dim or 0,
            forward_preserve_coef=args.forward_preserve_coef,
            reverse_preserve_coef=args.reverse_preserve_coef,
        ),
    )
    mesh = make_mesh(fsdp=args.fsdp)
    dp = int(mesh.shape["dp"])
    if args.batch_size % dp != 0:
        raise SystemExit(
            f"--batch_size {args.batch_size} is not divisible by the data-"
            f"parallel axis dp={dp} ({len(jax.devices())} devices / "
            f"fsdp={args.fsdp}). Pick a batch size that is a multiple of "
            f"{dp}, or raise --fsdp so dp shrinks."
        )
    ckpt_dir = os.path.join(args.output_dir, "checkpoints")

    with mesh:
        base = shard_params(base, mesh)
        state = init_train_state(jax.random.PRNGKey(args.seed + 1), base, tcfg)
        if args.resume_from_checkpoint:
            step = (
                None if args.resume_from_checkpoint == "latest"
                else int(args.resume_from_checkpoint)
            )
            if latest_step(ckpt_dir) is not None:
                state = restore_checkpoint(ckpt_dir, state, step)
                # orbax restores onto the default device; move the state
                # back onto the mesh (replicated) or jit refuses to mix it
                # with the mesh-sharded base params
                from invertible_cd_tpu.parallel import replicated

                state = jax.tree.map(
                    lambda x: jax.device_put(x, replicated(mesh)), state
                )
                print(f"resumed from step {int(state.step)}")
        step_fn = make_train_step(
            unet, base, base, solver, schedule, tcfg, mesh,
            split=args.split_step,
        )

        # Encoder/decoder pipeline (text+VAE) for real data, validation
        # panels and FID — built lazily; synthetic smoke runs that never hit
        # a validation/eval step don't pay for it.
        _pipe_cache = {}

        def encoder_pipe():
            if "pipe" not in _pipe_cache:
                _pipe_cache["pipe"] = build_encoder_pipe(args, base=base)
            return _pipe_cache["pipe"]

        needs_data_pipe = not (args.synthetic_data or args.data_root is None)
        data = batch_iterator(
            args, cfg, latent_size, pipe=encoder_pipe() if needs_data_pipe else None
        )

        def val_batch(n):
            """Fixed val set for the inversion eval/panels, encoded once."""
            if _pipe_cache.get("val_n", 0) < n:
                _pipe_cache["val"] = collect_val_batch(
                    args, cfg, latent_size, encoder_pipe(), n
                )
                _pipe_cache["val_n"] = n
            return jax.tree.map(lambda x: x[:n], _pipe_cache["val"])

        t0 = time.time()
        start = int(state.step)
        for i in range(start, args.max_steps):
            batch = shard_batch(next(data), mesh)
            state, metrics = step_fn(
                state, base, base, batch, jax.random.PRNGKey(args.seed * 7 + i)
            )
            if (i + 1) % args.log_every == 0 or i == start:
                m = {k: float(v) for k, v in metrics.items()}
                m["steps_per_sec"] = (i + 1 - start) / max(time.time() - t0, 1e-9)
                logger.log(i + 1, m, prefix="train/")
                print(f"step {i + 1}: " + " ".join(
                    f"{k}={v:.5f}" for k, v in sorted(m.items())
                ))
            if (
                args.evaluation_steps
                and (i + 1) % args.evaluation_steps == 0
                and args.fid_stats and args.fid_prompts and args.inception_weights
            ):
                fid = run_fid_eval(args, state, encoder_pipe())
                logger.log(i + 1, {"fid": fid}, prefix="eval/")
                print(f"step {i + 1}: FID = {fid:.3f}")
            if (
                args.inversion_eval_steps
                and (i + 1) % args.inversion_eval_steps == 0
            ):
                out = run_inversion_eval(
                    args, state, encoder_pipe(), base, tcfg, solver,
                    val_batch(args.inversion_eval_samples),
                )
                logger.log(i + 1, out, prefix="eval/")
                print(f"step {i + 1}: " + " ".join(
                    f"{k}={v:.5f}" for k, v in sorted(out.items())
                ))
            if args.validation_steps and (i + 1) % args.validation_steps == 0:
                log_validation(
                    logger, encoder_pipe(), base, state, tcfg, solver,
                    i + 1, args,
                )
                if args.inversion_validation_samples:
                    log_validation_inversion(
                        logger, encoder_pipe(), base, state, tcfg, solver,
                        i + 1, args,
                        val_batch(args.inversion_validation_samples),
                    )
            if (i + 1) % args.checkpointing_steps == 0 or i + 1 == args.max_steps:
                save_checkpoint(ckpt_dir, state, keep=args.checkpoints_total_limit)
                export_inference(
                    os.path.join(args.output_dir, f"export_{i + 1}"), state,
                    lora_alpha=tcfg.lora_alpha,
                )
    logger.close()
    print("done")


if __name__ == "__main__":
    main()
