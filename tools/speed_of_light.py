"""Speed-of-light analysis for the generation pipeline stages.

For each stage (CLIP encode, one UNet call, VAE decode) this compiles the
jit program for the real chip, reads XLA's own cost model
(`compiled.cost_analysis()`: flops + bytes accessed), optionally measures
the wall time (chained-iteration timing, tunnel-safe — bench_kernels.py
methodology), and prints:

  * the stage's FLOPs and HBM bytes,
  * its arithmetic intensity vs the chip's ridge point,
  * measured time -> achieved TFLOP/s -> % of bf16 peak (MFU),
  * the compute-bound floor (flops / peak) and bandwidth floor
    (bytes / peak BW) — max(the two) is the stage's speed of light.

This is the evidence behind README's MFU claims: convs in this pipeline
run at 90%+ of peak, so the remaining headroom is confined to the
attention layers (see tools/profile_ops.py for the per-op view).

Peak numbers are per v5e chip: 197 bf16 TFLOP/s, 819 GB/s HBM.
Run: python tools/speed_of_light.py [--batch 16] [--no-measure]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/icd_tpu_jax_cache")

import jax
import jax.numpy as jnp

PEAK_TFLOPS = 197.0  # v5e bf16
PEAK_GBS = 819.0  # v5e HBM


def _fence(x):
    float(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def _measure(fn, args, iters=8, reps=3):
    """Median per-iteration time of `iters` chained applications.

    Chains iterations through the first FLOATING input (iteration i+1's
    input depends on iteration i's output, so XLA cannot parallelise or
    elide the repeats); the fixed tunnel round-trip cancels in the
    (t_N - t_1)/(N-1) difference — bench_kernels.py methodology. Falls
    back to plain fence timing when no float input exists to chain
    through (then the ~35 ms tunnel RTT is included — fine for stages
    that dwarf it)."""
    chain = jnp.issubdtype(jnp.asarray(args[0]).dtype, jnp.floating)

    def loop(n):
        @jax.jit
        def run(*a):
            def body(c, _):
                o = fn(c, *a[1:])
                leaf = jax.tree_util.tree_leaves(o)[0]
                eps = jnp.asarray(1e-20, c.dtype)
                return (c + eps * leaf.astype(c.dtype).ravel()[0]).astype(c.dtype), ()

            c, _ = jax.lax.scan(body, a[0], None, length=n)
            return c

        return run

    def med(run):
        _fence(run(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _fence(run(*args))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    if not chain:
        f = jax.jit(fn)
        return med(lambda *a: f(*a))
    t1 = med(loop(1))
    tn = med(loop(iters))
    return max(tn - t1, 1e-9) / (iters - 1)


def analyze(name, fn, args, measure):
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    flops = cost.get("flops", 0.0)
    byts = cost.get("bytes accessed", 0.0)
    tflop = flops / 1e12
    gb = byts / 1e9
    t_compute = flops / (PEAK_TFLOPS * 1e12)
    t_mem = byts / (PEAK_GBS * 1e9)
    floor_ms = max(t_compute, t_mem) * 1e3
    bound = "compute" if t_compute >= t_mem else "bandwidth"
    line = (
        f"{name:18} {tflop:8.2f} TFLOP {gb:8.1f} GB  "
        f"floor {floor_ms:7.1f} ms ({bound}-bound)"
    )
    if measure:
        t = _measure(fn, args)
        mfu = flops / (t * PEAK_TFLOPS * 1e12)
        line += f"  measured {t * 1e3:7.1f} ms  MFU {100 * mfu:5.1f}%  SoL {100 * floor_ms / (t * 1e3):5.1f}%"
    print(line, flush=True)


def main():
    global PEAK_TFLOPS
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--no-measure", action="store_true")
    ap.add_argument("--quantize", default="off",
                    choices=["off", "int8", "int8_vae"],
                    help="analyze the int8 path against the 394 TOPS "
                         "int8 peak (approximation: treats ALL stage "
                         "FLOPs as int8-eligible; attention/softmax and "
                         "norms stay bf16, so true floors sit slightly "
                         "higher)")
    args = ap.parse_args()
    measure = not args.no_measure
    if args.quantize != "off":
        PEAK_TFLOPS = 394.0  # v5e int8

    from invertible_cd_tpu.ops.quant import quant_scope
    from invertible_cd_tpu.pipelines.pipeline import InvertibleCD

    pipe = InvertibleCD.sd15(dtype=jnp.bfloat16, quantize=args.quantize)
    unet_mode = "int8" if args.quantize == "int8" else "off"
    b = args.batch

    latent = jnp.zeros((b, 64, 64, 4), jnp.bfloat16)
    ctx = jnp.zeros((b, 77, 768), jnp.bfloat16)
    w_emb = jnp.zeros((b, 512), jnp.bfloat16)
    t999 = jnp.full((b,), 999, jnp.int32)
    tokens = jnp.zeros((b, 77), jnp.int32)
    z = jnp.zeros((b, 64, 64, 4), jnp.float32)

    print(f"batch {b}; peaks: {PEAK_TFLOPS} TFLOP/s bf16, {PEAK_GBS} GB/s (v5e)")
    # Params are passed as jit ARGUMENTS (not captured constants): closing
    # over them burns GBs into the lowered module and makes compiles take
    # minutes. They ride behind the chained first float arg.
    analyze(
        "clip_encode",
        lambda tok, p: pipe.text_encoder.apply(p, tok),
        (tokens, pipe.params["text"]),
        # int tokens can't chain, so the measurement would be one tunnel
        # round-trip (~35 ms) around a ~1 ms stage — floor-only instead.
        measure=False,
    )
    def _unet(x, t, c, w, p):
        with quant_scope(unet_mode):
            return pipe.unet.apply(p, x, t, c, w_cond=w)

    analyze(
        "unet_call",
        _unet,
        (latent, t999, ctx, w_emb, pipe.params["reverse"]),
        measure,
    )
    analyze(
        "vae_decode",
        lambda zz, p: pipe._decode_latents(p, zz),
        (z, pipe.params["vae"]),
        measure,
    )


if __name__ == "__main__":
    main()
