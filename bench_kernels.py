"""Kernel microbenchmarks on the real chip: Pallas flash attention vs XLA.

Run: python bench_kernels.py
Prints per-shape timings for the SD1.5/SDXL attention shape families and
an overall recommendation (used to set ICD_TPU_PALLAS_ATTENTION).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from invertible_cd_tpu.ops.flash_attention import flash_attention

SHAPES = [
    # (name, B, Sq, Sk, H, D) — SD1.5 at 512^2 and SDXL families
    ("sd15_self_64x64", 2, 4096, 4096, 8, 40),
    ("sd15_self_32x32", 2, 1024, 1024, 8, 80),
    ("sd15_self_16x16", 2, 256, 256, 8, 160),
    ("sd15_cross_64x64", 2, 4096, 77, 8, 40),
    ("sd15_cross_32x32", 2, 1024, 77, 8, 80),
    ("sdxl_self_64x64", 2, 4096, 4096, 10, 64),
    ("sdxl_self_32x32", 2, 1024, 1024, 20, 64),
]


def timeit(fn, *args, iters=10):
    # fence with a value fetch: block_until_ready does not block on this
    # container's tunneled backend (see .claude/skills/verify/SKILL.md)
    q = args[0]
    float(fn(q, *args[1:]).astype(jnp.float32)[0, 0, 0, 0])
    ts = []
    for i in range(iters):
        qq = q + jnp.bfloat16(i * 0.001)
        t0 = time.perf_counter()
        float(fn(qq, *args[1:]).astype(jnp.float32)[0, 0, 0, 0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    xla = jax.jit(jax.nn.dot_product_attention)
    pallas = jax.jit(flash_attention)
    print(f"{'shape':24} {'xla_ms':>8} {'pallas_ms':>10} {'speedup':>8}")
    wins = 0
    for name, b, sq, sk, h, d in SHAPES:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(b, sq, h, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, sk, h, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, sk, h, d)), jnp.bfloat16)
        t_xla = timeit(xla, q, k, v)
        try:
            t_pal = timeit(pallas, q, k, v)
        except Exception as e:  # noqa: BLE001
            print(f"{name:24} {t_xla*1e3:8.3f} {'FAIL':>10} ({type(e).__name__})")
            continue
        sp = t_xla / t_pal
        wins += sp > 1.0
        print(f"{name:24} {t_xla*1e3:8.3f} {t_pal*1e3:10.3f} {sp:8.2f}x")
    print(f"pallas faster on {wins}/{len(SHAPES)} shapes")


if __name__ == "__main__":
    main()
