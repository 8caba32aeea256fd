"""Text-to-image generation CLI (capability twin of reference
`running/sd1.5/generate.py` + `running/sdxl/generate.py`, C15/C18).

Supports few-step consistency generation (reverse CD), the 50-step DDIM
teacher baseline, benchmark CSV sweeps with host striding, and the CLIP /
ImageReward metric hooks (gated on evaluator weights).

Example:
  python cli/generate.py --model tiny --prompt "a cat" --out /tmp/gen
  python cli/generate.py --model sd15 --benchmark path/to/generation.csv \
      --max_cnt 128 --batch_size 8 --out /tmp/coco_sweep
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
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
        mapped = {}
        for k, v in cfg.items():
            if k.startswith("_") or k not in known:
                continue
            if isinstance(v, list):
                mapped[k] = v
            else:
                mapped[k] = v
        p.set_defaults(**mapped)
    return argv


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None, help="JSON config with flag defaults (configs/*.json)")
    p.add_argument("--model", default="sd15", choices=["sd15", "sdxl", "tiny"])
    p.add_argument("--prompt", action="append", default=None)
    p.add_argument("--benchmark", default=None, help="generation CSV (file_name, caption)")
    p.add_argument("--max_cnt", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--out", required=True)
    p.add_argument("--platform", default=None, help="cpu|tpu backend override (cpu needed for smoke tests in tunneled-TPU containers)")
    p.add_argument("--seed", type=int, default=150)
    p.add_argument("--quantize", default="off",
                   choices=["off", "int8", "int8_vae", "int8_static"],
                   help="opt-in int8 MXU inference (ops/quant.py); "
                        "int8_static auto-runs collect_quant_stats once")
    p.add_argument("--guidance_scale", type=float, default=19.0)
    p.add_argument("--dynamic_guidance", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="--no-dynamic_guidance gives static CFG (reference "
                        "use_dynamic_guidance False, e.g. SDXL generation)")
    p.add_argument("--tau1", type=float, default=0.8)
    p.add_argument("--tau2", type=float, default=0.8)
    p.add_argument("--reverse_timesteps", type=int, nargs="*", default=None,
                   help="default: 259 519 779 999 (SD1.5) / "
                        "249 499 699 999 (SDXL, reference running/sdxl)")
    p.add_argument("--forward_timesteps", type=int, nargs="*", default=None,
                   help="default: 19 259 519 779 (SD1.5) / "
                        "19 249 499 699 (SDXL)")
    p.add_argument("--ddim_baseline", action="store_true",
                   help="50-step DDIM with the teacher instead of reverse CD")
    p.add_argument("--image_root", default=None,
                   help="real images for the generation CSV -> invert/"
                        "reconstruct mode (reference generate.py "
                        "path_to_images): saves real_images/ + "
                        "generated_images/ reconstruction pairs")
    p.add_argument("--cons_inversion", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="forward-CD inversion; --no-cons_inversion = "
                        "50-step DDIM inversion (reference "
                        "use_cons_inversion)")
    p.add_argument("--inv_guidance_scale", type=float, default=0.0,
                   help="CFG scale during inversion (reference "
                        "--inv_guidance_scale)")
    p.add_argument("--num_ddim_steps", type=int, default=50,
                   help="DDIM grid size (reference --num_ddim_steps)")
    p.add_argument("--reverse_lora", default=None, help="kohya safetensors")
    p.add_argument("--forward_lora", default=None)
    p.add_argument("--teacher_checkpoint", default=None)
    p.add_argument("--vae_checkpoint", default=None,
                   help="diffusers AutoencoderKL state dict (.pt/.safetensors)")
    p.add_argument("--text_checkpoint", default=None,
                   help="transformers CLIPTextModel state dict(s); for SDXL pass "
                        "'clip_l.safetensors,clip_bigg.safetensors'")
    p.add_argument("--calc_metrics", action="store_true")
    add_scorer_args(p)
    argv = apply_config_file(p, argv)
    return p.parse_args(argv)


def add_scorer_args(p):
    """Scorer checkpoint flags (the torch artifacts the reference downloads
    via transformers/torchhub/piq/image_reward, `utils/metrics.py:139-321`).
    Any missing file leaves that metric None in the output."""
    p.add_argument("--clip_vision_weights", default=None,
                   help="transformers CLIPVisionModel(.WithProjection) state dict")
    p.add_argument("--clip_text_scorer_weights", default=None,
                   help="transformers CLIPTextModelWithProjection state dict")
    p.add_argument("--dino_weights", default=None, help="torch-hub dinov2_vitb14")
    p.add_argument("--vgg_weights", default=None, help="torchvision vgg16 features")
    p.add_argument("--lpips_heads_weights", default=None, help="LPIPS lin heads")
    p.add_argument("--image_reward_weights", default=None, help="ImageReward.pt")
    p.add_argument("--bert_vocab", default=None, help="BERT vocab.txt (ImageReward)")
    p.add_argument("--fid_stats", default=None,
                   help="reference-set FID stats npz with mu/sigma (the "
                        "reference's --path_to_fid_reference, e.g. "
                        "fid_stats_mscoco512_val.npz converted to npz)")
    p.add_argument("--inception_weights", default=None,
                   help="pt_inception-2015-12-05 state dict (FID variant)")


def build_evaluators(args):
    from invertible_cd_tpu.metrics.scores import evaluators_from_weights

    return evaluators_from_weights(
        clip_vision_path=args.clip_vision_weights,
        clip_text_path=args.clip_text_scorer_weights,
        dino_path=args.dino_weights,
        vgg_path=args.vgg_weights,
        lpips_heads_path=args.lpips_heads_weights,
        image_reward_path=args.image_reward_weights,
        bert_vocab_path=args.bert_vocab,
    )


def build_pipeline(args):
    import jax.numpy as jnp

    from invertible_cd_tpu.diffusion.solver import make_solver_grid
    from invertible_cd_tpu.pipelines.pipeline import InvertibleCD
    from invertible_cd_tpu.pipelines.sdxl import InvertibleCDXL

    if args.model == "sdxl":
        # iCD-SDXL checkpoint grid (reference running/sdxl/README.md:4)
        rev_default = [249, 499, 699, 999]
        fwd_default = [19, 249, 499, 699]
    else:
        rev_default = [259, 519, 779, 999]
        fwd_default = [19, 259, 519, 779]
    grid = make_solver_grid(
        n_steps=getattr(args, "num_ddim_steps", 50),
        reverse_timesteps=args.reverse_timesteps or rev_default,
        forward_timesteps=args.forward_timesteps or fwd_default,
    )
    if args.model == "tiny":
        import dataclasses

        from invertible_cd_tpu.testing import tiny_bundle

        pipe = tiny_bundle()
        pipe = dataclasses.replace(pipe, grid=grid)
        pipe.quantize = args.quantize
        if args.quantize == "int8_static":
            pipe.collect_quant_stats()
        return pipe
    if args.model == "sdxl":
        pipe = InvertibleCDXL.sdxl(grid=grid, quantize=args.quantize)
    else:
        pipe = InvertibleCD.sd15(grid=grid, quantize=args.quantize)
    _load_weights(pipe, args)
    if args.quantize == "int8_static":
        # calibrate on the REAL weights (after loading), one-time
        pipe.collect_quant_stats()
    return pipe


def _load_weights(pipe, args):
    from invertible_cd_tpu.models.convert import (
        convert_clip_text_from_transformers, load_torch_file,
    )
    from invertible_cd_tpu.pipelines.loading import load_bundle_params

    text = getattr(args, "text_checkpoint", None)
    text_paths = text.split(",") if text else []
    pipe.params = load_bundle_params(
        teacher=args.teacher_checkpoint,
        vae=getattr(args, "vae_checkpoint", None),
        text=text_paths[0] if text_paths else None,
        reverse_lora=args.reverse_lora,
        forward_lora=args.forward_lora,
        params=pipe.params,
    )
    if len(text_paths) > 1:  # SDXL: second (OpenCLIP-bigG) encoder
        pipe.params["text_2"] = convert_clip_text_from_transformers(
            load_torch_file(text_paths[1])
        )


def reconstruct_images(pipe, args, g):
    """Invert/reconstruct mode (reference `generate.py:304-340,428-438`
    path_to_images branch): invert each real benchmark image under its
    caption — forward-CD at --inv_guidance_scale, or 50-step DDIM with
    --no-cons_inversion — regenerate from the inverted latent with the
    generation settings, and save real_images/ + generated_images/ pairs.
    With --calc_metrics, reports the inversion bundle (DINO/PSNR/LPIPS,
    reference `metrics.py:392-435`) and recon-FID when --fid_stats is
    given."""
    import invertible_cd_tpu.pipelines.sampler as S
    from invertible_cd_tpu.data import load_benchmark
    from invertible_cd_tpu.pipelines.pipeline import to_uint8
    from PIL import Image

    rows = load_benchmark(args.benchmark, kind="generation",
                          max_count=args.max_cnt, with_files=True)
    rows = rows[jax.process_index()::jax.process_count()]
    pix = pipe.latent_size[0] * (
        2 ** (len(pipe.vae.cfg.block_out_channels) - 1)
    )
    real_dir = os.path.join(args.out, "real_images")
    rec_dir = os.path.join(args.out, "generated_images")
    os.makedirs(real_dir, exist_ok=True)
    os.makedirs(rec_dir, exist_ok=True)

    evals = build_evaluators(args) if args.calc_metrics else None
    fid_scorer = None
    if args.calc_metrics and args.fid_stats and args.inception_weights:
        from invertible_cd_tpu.metrics import FIDScorer
        from invertible_cd_tpu.models.convert import (
            convert_inception_weights, load_torch_file,
        )

        fid_scorer = FIDScorer(
            convert_inception_weights(load_torch_file(args.inception_weights))
        )

    bundles, fid_images, n_done = [], [], 0
    for i in range(0, len(rows), args.batch_size):
        batch = rows[i : i + args.batch_size]
        n_real = len(batch)
        # pad the tail batch so the sweep keeps one compiled program
        batch = batch + [batch[-1]] * (args.batch_size - len(batch))
        names = [r[0] for r in batch]
        caps = [r[1] for r in batch]
        reals = np.stack([
            np.asarray(
                Image.open(os.path.join(args.image_root, n))
                .convert("RGB").resize((pix, pix), Image.BICUBIC)
            )
            for n in names
        ])
        if args.cons_inversion:
            inv_g = pipe.default_guidance(guidance_scale=args.inv_guidance_scale)
            lat, _ = pipe.invert(reals, caps, guidance=inv_g,
                                 key=jax.random.PRNGKey(args.seed + i))
            imgs, _ = pipe.generate(caps, latent=lat, guidance=g)
        else:
            inv_g = S.GuidanceConfig(
                guidance_scale=args.inv_guidance_scale or 1.0, w_embed_dim=0
            )
            traj, _ = pipe.ddim_invert(reals, caps, guidance=inv_g)
            imgs, _ = pipe.ddim_generate(caps, latent=traj[-1])
        reals, imgs = reals[:n_real], imgs[:n_real]
        recs = to_uint8(imgs)
        for j, (real, rec) in enumerate(zip(reals, recs)):
            Image.fromarray(real).save(os.path.join(real_dir, f"{i + j:06d}.jpg"))
            Image.fromarray(rec).save(os.path.join(rec_dir, f"{i + j:06d}.jpg"))
            if fid_scorer is not None:
                fid_images.append(rec)
        if evals is not None:
            bundles.append(evals.calc_inversion(
                reals.astype(np.float32) / 255.0,
                np.asarray(recs, np.float32) / 255.0,
            ))
        n_done += n_real
        print(f"[{n_done}/{len(rows)}] reconstructed")

    summary = {"n_images": n_done}
    if bundles:
        summary.update({
            k: (
                float(np.mean([b[k] for b in bundles]))
                if all(b[k] is not None for b in bundles) else None
            )
            for k in bundles[0]
        })
    if fid_scorer is not None and fid_images:
        summary["recon_fid"] = float(fid_scorer.fid(
            fid_images, reference_stats_path=args.fid_stats
        ))
    with open(os.path.join(args.out, "reconstruction_metrics.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print("reconstruction:", summary)


def main(argv=None, _pipe=None):
    args = parse_args(argv)
    from invertible_cd_tpu.data import load_benchmark
    from invertible_cd_tpu.pipelines.pipeline import to_uint8

    os.makedirs(args.out, exist_ok=True)
    pipe = _pipe if _pipe is not None else build_pipeline(args)

    if args.benchmark:
        prompts = load_benchmark(args.benchmark, kind="generation",
                                 max_count=args.max_cnt)
    else:
        prompts = args.prompt or ["a photo of a corgi on the beach"]
    # Host striding (the reference's rank-strided prompt split,
    # `generate.py:29-39`).
    prompts = prompts[jax.process_index()::jax.process_count()]

    g = pipe.default_guidance(
        guidance_scale=args.guidance_scale,
        dynamic_guidance=args.dynamic_guidance,
        tau1=args.tau1, tau2=args.tau2,
    )
    from PIL import Image

    if args.image_root is not None:
        if not args.benchmark:
            sys.exit("--image_root needs --benchmark (a generation CSV "
                     "with file_name + caption columns)")
        return reconstruct_images(pipe, args, g)

    evals = build_evaluators(args) if args.calc_metrics else None
    fid_scorer = None
    if args.calc_metrics and args.fid_stats and args.inception_weights:
        from invertible_cd_tpu.metrics import FIDScorer
        from invertible_cd_tpu.models.convert import (
            convert_inception_weights, load_torch_file,
        )

        fid_scorer = FIDScorer(
            convert_inception_weights(load_torch_file(args.inception_weights))
        )
    clip_scores = []
    ir_scores = []
    fid_images = []  # uint8 frames kept in host RAM, as the reference does
    saved = []
    for i in range(0, len(prompts), args.batch_size):
        batch = prompts[i : i + args.batch_size]
        # pad the tail batch to the full batch size so the whole sweep
        # rides ONE compiled program (a smaller final batch would be a
        # second trace+remote-compile for a handful of rows)
        padded = batch + [batch[-1]] * (args.batch_size - len(batch))
        key = jax.random.PRNGKey(args.seed + i)
        if args.ddim_baseline:
            imgs, _ = pipe.ddim_generate(padded, key=key)
        else:
            imgs, _ = pipe.generate(padded, key=key, guidance=g)
        imgs = imgs[: len(batch)]
        for j, img in enumerate(to_uint8(imgs)):
            path = os.path.join(args.out, f"{i + j:06d}.jpg")
            Image.fromarray(img).save(path)
            saved.append(path)
            if fid_scorer is not None:
                fid_images.append(img)
        if evals is not None:
            # the reference's generation eval: CLIP image-text score +
            # ImageReward over all prompts (`generate.py:404-425`)
            images01 = np.asarray(imgs, np.float32)
            s = evals.clip_image_text(images01, batch)
            if s is not None:
                clip_scores.extend([s] * len(batch))
            r = evals.image_reward(images01, batch)
            if r is not None:
                ir_scores.extend([r] * len(batch))
    print(f"saved {len(saved)} images to {args.out}")

    if args.calc_metrics:
        metrics = {
            "clip_score": float(np.mean(clip_scores)) if clip_scores else None,
            "image_reward": float(np.mean(ir_scores)) if ir_scores else None,
            "n_images": len(saved),
        }
        if metrics["clip_score"] is None or metrics["image_reward"] is None:
            # no absolute anchor without the published scorer weights
            # (zero-egress container); the harness still proves plumbing
            metrics["metrics_note"] = (
                "null metrics = scorer weights not provided; pass "
                "--clip_vision_weights/--clip_text_scorer_weights/"
                "--image_reward_weights (see PARITY.md) to score with "
                "the reference protocol"
            )
        if fid_scorer is not None and fid_images:
            # generation FID against reference stats — the reference
            # declares --path_to_fid_reference/--path_to_inception on its
            # generate.py (lines 230-238) and ships calculate_fid
            # (utils/metrics.py:144) but never wires them together; here
            # the flags actually compute it
            metrics["fid"] = float(fid_scorer.fid(
                fid_images, reference_stats_path=args.fid_stats
            ))
        with open(os.path.join(args.out, "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        print("metrics:", metrics)
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump({"prompts": prompts, "files": saved}, f, indent=2)


if __name__ == "__main__":
    main()
