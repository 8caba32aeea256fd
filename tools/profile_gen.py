"""Stage breakdown of the SD1.5 generation pipeline on the real chip.

The tunneled-TPU backend makes trace viewers impractical, so this is the
robust alternative: time each pipeline stage as its own jit program and
compare their sum to the fused end-to-end program. Identifies which stage
to attack (VERDICT round-1 item 3: profile-driven optimisation).

Usage: python tools/profile_gen.py [--batch 16] [--trace DIR]
With --trace, additionally records a jax.profiler trace of the fused
program for offline inspection.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _fence(x):
    # slice ON DEVICE first: device_get of the full array would pull
    # megabytes through the TPU tunnel per iteration and dominate timing
    first = x[(0,) * x.ndim] if x.ndim else x
    float(jax.device_get(first))


def timeit(fn, iters=6):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def profile_sdxl(args):
    """SDXL stage breakdown (batch 1 is the single-chip optimum, bench.py)."""
    from invertible_cd_tpu.pipelines.sdxl import InvertibleCDXL

    pipe = InvertibleCDXL.sdxl(dtype=jnp.bfloat16, quantize=args.quantize)
    b = args.batch
    prompts = ["a photo of a corgi on the beach"] * b

    def stage_text():
        ctx_u, ctx_c, added = pipe._encode_all(prompts)
        _fence(ctx_c)

    ctx_u, ctx_c, added = pipe._encode_all(prompts)
    latent = jnp.zeros((b, 128, 128, 4), jnp.bfloat16)
    w_emb = jnp.zeros((b, 512), jnp.bfloat16)
    nm = pipe._noise_model(pipe.params["reverse"], added=added)
    unet_fn = jax.jit(lambda x, c, w: nm(x, 999, c, w, None))

    def stage_unet():
        _fence(unet_fn(latent, ctx_c, w_emb))

    dec = jax.jit(lambda p, z: pipe._decode_latents(p, z))

    def stage_vae():
        _fence(dec(pipe.params["vae"], jnp.zeros((b, 128, 128, 4), jnp.float32)))

    def full():
        imgs, _ = pipe.generate(prompts, key=jax.random.PRNGKey(0))
        _fence(imgs)

    t_text = timeit(stage_text)
    t_unet = timeit(stage_unet)
    t_vae = timeit(stage_vae)
    t_full = timeit(full)
    print(f"sdxl batch {b}")
    print(f"  text encode (dual) : {t_text * 1e3:8.1f} ms")
    print(f"  one UNet call      : {t_unet * 1e3:8.1f} ms  (x4 = {4 * t_unet * 1e3:.1f})")
    print(f"  VAE decode (fp32)  : {t_vae * 1e3:8.1f} ms")
    print(f"  sum (text+4u+vae)  : {(t_text + 4 * t_unet + t_vae) * 1e3:8.1f} ms")
    print(f"  fused generate     : {t_full * 1e3:8.1f} ms -> {b / t_full:.2f} img/s")
    if args.trace:
        with jax.profiler.trace(args.trace):
            full()
        print(f"trace written to {args.trace}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--model", default="sd15", choices=["sd15", "sdxl"])
    ap.add_argument("--trace", default=None)
    ap.add_argument("--quantize", default="off",
                    choices=["off", "int8", "int8_vae"],
                    help="profile the int8 MXU path (ops/quant.py)")
    args = ap.parse_args()

    from invertible_cd_tpu.ops.quant import quant_scope
    from invertible_cd_tpu.pipelines.pipeline import InvertibleCD

    if args.model == "sdxl":
        return profile_sdxl(args)

    pipe = InvertibleCD.sd15(dtype=jnp.bfloat16, quantize=args.quantize)
    unet_mode = "int8" if args.quantize == "int8" else "off"
    b = args.batch
    prompts = ["a photo of a corgi on the beach"] * b

    # stage programs
    tokens = jnp.asarray(pipe.tokenizer(prompts))
    enc = pipe._get_jit("encode_text")

    def stage_text():
        _fence(enc(pipe.params["text"], tokens))

    latent = jnp.zeros((b, 64, 64, 4), jnp.bfloat16)
    ctx = jnp.zeros((b, 77, 768), jnp.bfloat16)
    w_emb = jnp.zeros((b, 512), jnp.bfloat16)

    def _unet(p, x, t, c, w):
        with quant_scope(unet_mode):
            return pipe.unet.apply(p, x, t, c, w_cond=w)

    unet_fn = jax.jit(_unet)

    def stage_unet():
        _fence(
            unet_fn(pipe.params["reverse"], latent, jnp.full((b,), 999, jnp.int32), ctx, w_emb)
        )

    # (_decode_latents reads pipe.quantize itself, so no scope needed)
    dec = jax.jit(lambda p, z: pipe._decode_latents(p, z))

    def stage_vae():
        _fence(dec(pipe.params["vae"], jnp.zeros((b, 64, 64, 4), jnp.float32)))

    def full():
        imgs, _ = pipe.generate(prompts, key=jax.random.PRNGKey(0))
        _fence(imgs)

    t_text = timeit(stage_text)
    t_unet = timeit(stage_unet)
    t_vae = timeit(stage_vae)
    t_full = timeit(full)

    print(f"batch {b}")
    print(f"  text encode        : {t_text * 1e3:8.1f} ms")
    print(f"  one UNet call      : {t_unet * 1e3:8.1f} ms  (x4 = {4 * t_unet * 1e3:.1f})")
    print(f"  VAE decode         : {t_vae * 1e3:8.1f} ms")
    print(f"  sum (text+4u+vae)  : {(t_text + 4 * t_unet + t_vae) * 1e3:8.1f} ms")
    print(f"  fused generate     : {t_full * 1e3:8.1f} ms -> {b / t_full:.2f} img/s")
    # rough MFU: 4 UNet calls ~0.68 TFLOP each + VAE decode ~1.3 TFLOP / img
    tflop = b * (4 * 0.68 + 1.3)
    print(f"  ~{tflop / t_full:.1f} TFLOP/s of v5e bf16 peak 197 -> "
          f"{100 * tflop / t_full / 197:.0f}% MFU")

    if args.trace:
        with jax.profiler.trace(args.trace):
            full()
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
