"""Kernel microbenchmarks on the real chip: Pallas flash attention vs XLA.

Run: python bench_kernels.py [--iters 24]
Prints per-shape timings for the SD1.5/SDXL attention shape families and
an overall recommendation (used to set ICD_TPU_PALLAS_ATTENTION).

Methodology: this container reaches the TPU through a tunnel whose
per-fetch round trip (~35 ms) dwarfs sub-millisecond kernels, so naive
fence-per-call timing only measures the tunnel. Instead each measurement
runs the kernel N times CHAINED inside one jit program (iteration i+1
consumes a hair of iteration i's output, so XLA cannot parallelise or
elide them), fetches once, and reports (t_N - t_1) / (N - 1) — the fixed
tunnel/dispatch cost cancels in the difference.
"""
import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/icd_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from invertible_cd_tpu.ops.flash_attention import flash_attention

SHAPES = [
    # (name, B, Sq, Sk, H, D) — SD1.5 at 512^2 and SDXL families
    ("sd15_self_64x64_b1", 1, 4096, 4096, 8, 40),
    ("sd15_self_64x64", 2, 4096, 4096, 8, 40),
    ("sd15_self_64x64_b4", 4, 4096, 4096, 8, 40),
    ("sd15_self_64x64_b8", 8, 4096, 4096, 8, 40),
    ("sd15_self_32x32", 2, 1024, 1024, 8, 80),
    ("sd15_self_16x16", 2, 256, 256, 8, 160),
    ("sd15_cross_64x64", 2, 4096, 77, 8, 40),
    ("sd15_cross_32x32", 2, 1024, 77, 8, 80),
    ("sdxl_self_64x64", 2, 4096, 4096, 10, 64),
    ("sdxl_self_32x32", 2, 1024, 1024, 20, 64),
    # headline-bench batch (bench.py gen runs batch 16)
    ("sd15_self_64x64_b16", 16, 4096, 4096, 8, 40),
    ("sd15_self_32x32_b16", 16, 1024, 1024, 8, 80),
    ("sd15_cross_64x64_b16", 16, 4096, 77, 8, 40),
    # VAE mid-block attention: single d=512 head — takes the STREAMED
    # kernel (K/V too big for resident VMEM; XLA materialises the fp32
    # probability square here)
    ("vae_sd15_decode_b16", 16, 4096, 4096, 1, 512),
    ("vae_sdxl_decode", 1, 16384, 16384, 1, 512),
]


def _fence(x):
    float(x.astype(jnp.float32)[0, 0, 0, 0])


def make_loop(fn, iters):
    @jax.jit
    def run(q, k, v):
        def body(c, _):
            o = fn(c, k, v)
            # serialize iterations: tiny dependency, negligible compute
            return (c + jnp.asarray(1e-6, c.dtype) * o).astype(c.dtype), ()

        c, _ = jax.lax.scan(body, q, None, length=iters)
        return c

    return run


def median_time(run, q, k, v, reps=5):
    _fence(run(q, k, v))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _fence(run(q, k, v))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def bench(fn, q, k, v, iters):
    t1 = median_time(make_loop(fn, 1), q, k, v)
    tn = median_time(make_loop(fn, iters), q, k, v)
    return max(tn - t1, 1e-9) / (iters - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=24)
    args = ap.parse_args()

    print(f"{'shape':24} {'xla_ms':>8} {'pallas_ms':>10} {'speedup':>8}")
    wins = 0
    for name, b, sq, sk, h, d in SHAPES:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(b, sq, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, sk, h, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, sk, h, d)), jnp.bfloat16)
        t_xla = bench(jax.nn.dot_product_attention, q, k, v, args.iters)
        try:
            t_pal = bench(flash_attention, q, k, v, args.iters)
        except Exception as e:  # noqa: BLE001
            print(f"{name:24} {t_xla*1e3:8.3f} {'FAIL':>10} ({type(e).__name__})")
            continue
        sp = t_xla / t_pal
        wins += sp > 1.0
        print(f"{name:24} {t_xla*1e3:8.3f} {t_pal*1e3:10.3f} {sp:8.2f}x")
    print(f"pallas faster on {wins}/{len(SHAPES)} shapes")


if __name__ == "__main__":
    main()
