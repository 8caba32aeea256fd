"""Fidelity cost of int8 inference: bf16 vs quantized outputs, same seeds.

The int8 path (ops/quant.py) is opt-in precisely because W8A8 changes
diffusion numerics; this tool measures BY HOW MUCH on real checkpoints:
for N prompts it generates with quantize=off and with --quantize
int8/int8_vae from identical latents, then reports PSNR and (when LPIPS
weights are supplied) LPIPS between the two sets, plus the same pair of
numbers for an invert->reconstruct round trip of the bf16 images.

With no checkpoints this still runs on random tiny weights
(--model tiny) as a mechanism check, but the numbers only mean
something with the published weights (PARITY.md: fetch them outside
this zero-egress container, run the converters, then this tool).

Example:
  python tools/quant_quality.py --quantize int8 --n 16 \
      --teacher_checkpoint sd15_cfg_distill.pt \
      --reverse_lora icd_reverse.safetensors \
      --forward_lora icd_forward.safetensors \
      --vgg_weights vgg16.pt --lpips_heads_weights lpips_lin.pt

Prints one JSON line:
  {"psnr_generate": ..., "lpips_generate": ..., "psnr_roundtrip": ...,
   "lpips_roundtrip": ..., "quantize": "int8", "n": 16}
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/icd_tpu_jax_cache")


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--quantize", default="int8",
                   choices=["int8", "int8_vae", "int8_static"])
    p.add_argument("--model", default="sd15", choices=["sd15", "tiny"])
    p.add_argument("--n", type=int, default=16, help="number of prompts")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--seed", type=int, default=150)
    p.add_argument("--platform", default=None)
    p.add_argument("--benchmark", default=None,
                   help="generation CSV for prompts (default: built-ins)")
    p.add_argument("--teacher_checkpoint", default=None)
    p.add_argument("--reverse_lora", default=None)
    p.add_argument("--forward_lora", default=None)
    p.add_argument("--vae_checkpoint", default=None)
    p.add_argument("--text_checkpoint", default=None)
    p.add_argument("--vgg_weights", default=None)
    p.add_argument("--lpips_heads_weights", default=None)
    p.add_argument("--generate_only", action="store_true",
                   help="skip the invert->reconstruct phase (its two "
                        "invert programs are the most expensive compiles "
                        "in this tool)")
    return p.parse_args(argv)


PROMPTS = [
    "a photo of a corgi on the beach",
    "an oil painting of a lighthouse in a storm",
    "a bowl of ramen, studio lighting",
    "a red bicycle leaning on a brick wall",
    "an astronaut riding a horse on mars",
    "a macro photo of a dragonfly on a leaf",
    "a cozy cabin in snowy woods at dusk",
    "a street market in marrakesh",
]


def main(argv=None):
    args = parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import numpy as np

    from invertible_cd_tpu.metrics.basic import psnr

    if args.model == "tiny":
        from invertible_cd_tpu.testing import tiny_bundle

        pipe = tiny_bundle()
    else:
        from invertible_cd_tpu.pipelines.pipeline import InvertibleCD

        pipe = InvertibleCD.sd15()
        if args.teacher_checkpoint or args.reverse_lora:
            from invertible_cd_tpu.pipelines.loading import load_bundle_params

            pipe.params = load_bundle_params(
                teacher=args.teacher_checkpoint,
                vae=args.vae_checkpoint,
                text=args.text_checkpoint,
                reverse_lora=args.reverse_lora,
                forward_lora=args.forward_lora,
                params=pipe.params,
            )

    if args.benchmark:
        from invertible_cd_tpu.data import load_benchmark

        prompts = load_benchmark(
            args.benchmark, kind="generation", max_count=args.n
        )
    else:
        prompts = (PROMPTS * ((args.n + len(PROMPTS) - 1) // len(PROMPTS)))[: args.n]

    lpips = None
    if args.vgg_weights and args.lpips_heads_weights:
        from invertible_cd_tpu.metrics.scores import evaluators_from_weights

        lpips = evaluators_from_weights(
            vgg_path=args.vgg_weights,
            lpips_heads_path=args.lpips_heads_weights,
        )

    def sweep(quantize):
        pipe.quantize = quantize
        outs = []
        recons = []
        for i in range(0, len(prompts), args.batch_size):
            chunk = prompts[i : i + args.batch_size]
            key = jax.random.PRNGKey(args.seed + i)
            imgs, _ = pipe.generate(chunk, key=key)
            outs.append(np.asarray(imgs))
        pipe.quantize = "off"
        return np.concatenate(outs, axis=0)

    import sys
    import time

    t0 = time.monotonic()

    def stage(msg):
        print(f"[quant_quality +{time.monotonic() - t0:.0f}s] {msg}",
              file=sys.stderr, flush=True)

    stage("generating bf16 reference set")
    ref = sweep("off")
    if args.quantize == "int8_static":
        stage("calibrating static scales")
        pipe.collect_quant_stats(prompts[: args.batch_size])
    stage(f"generating {args.quantize} set")
    qnt = sweep(args.quantize)

    # invert->reconstruct the bf16 images under both modes: the editing
    # use case feeds the quantized forward student with real pixels.
    def roundtrip(quantize, images01):
        pipe.quantize = quantize
        recs = []
        for i in range(0, images01.shape[0], args.batch_size):
            chunk = (images01[i : i + args.batch_size] * 255.0).astype(np.float32)
            inv, _ = pipe.invert(chunk, prompt="")
            imgs, _ = pipe.generate(
                [""] * chunk.shape[0], latent=inv,
                guidance=pipe.default_guidance(guidance_scale=0.0),
            )
            recs.append(np.asarray(imgs))
        pipe.quantize = "off"
        return np.concatenate(recs, axis=0)

    out = {
        "quantize": args.quantize,
        "n": len(prompts),
        "psnr_generate": round(psnr(ref * 255, qnt * 255), 3),
    }
    if lpips is not None:
        out["lpips_generate"] = round(lpips.lpips_distance(ref, qnt), 5)
    if not args.generate_only:
        stage("bf16 invert->reconstruct")
        rt_ref = roundtrip("off", ref)
        stage(f"{args.quantize} invert->reconstruct")
        rt_qnt = roundtrip(args.quantize, ref)
        out["psnr_roundtrip"] = round(psnr(rt_ref * 255, rt_qnt * 255), 3)
        if lpips is not None:
            out["lpips_roundtrip"] = round(
                lpips.lpips_distance(rt_ref, rt_qnt), 5
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
