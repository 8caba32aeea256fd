"""Premise check for the int8 inference path (ops/quant.py).

Measures int8-vs-bf16 MXU rates on the pipeline's own hot shapes:

  * a square matmul (pure MXU rate check — v5e spec says 394 int8 TOPS
    vs 197 bf16 TFLOP/s),
  * the SD1.5 UNet's biggest conv (64x64x640 3x3) and the VAE decoder's
    512^2 x 128 3x3 — the shapes behind the two compute-bound stages,
  * the same two convs through the full quantize->conv->dequantize
    pipeline (what QConv actually runs), so the dynamic-quant overhead
    (amax pass + int8 materialisation) is priced in.

Run on the real chip: python tools/bench_int8.py
Timing is tunnel-safe (chained-iteration differences, like
bench_kernels.py)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/icd_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from invertible_cd_tpu.ops.quant import quant_conv_general_dilated, quant_scope


def _fence(x):
    float(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def _time_chained(fn, x, iters=8, reps=3):
    """Median per-iteration time; iteration i+1 consumes iteration i's
    output so the tunnel RTT cancels in the difference."""
    run = jax.jit(lambda v: fn(v))
    v = run(x)
    _fence(v)
    best = []
    for _ in range(reps):
        v = x
        t0 = time.perf_counter()
        v = run(v)
        _fence(v)
        t1 = time.perf_counter()
        for _ in range(iters):
            v = run(v)
        _fence(v)
        t2 = time.perf_counter()
        best.append(((t2 - t1) - (t1 - t0)) / max(iters - 1, 1))
    return float(np.median(best))


def bench_matmul(n=4096):
    x = jnp.ones((n, n), jnp.bfloat16)

    def bf16(v):
        return (v @ x).astype(jnp.bfloat16)

    xq = jnp.ones((n, n), jnp.int8)

    def i8(v):
        acc = jax.lax.dot_general(
            v, xq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc % 127).astype(jnp.int8)  # keep int8 chaining dtype

    t_bf = _time_chained(bf16, x)
    t_i8 = _time_chained(i8, xq)
    fl = 2 * n**3
    print(
        f"matmul {n}^3: bf16 {t_bf*1e3:.2f} ms ({fl/t_bf/1e12:.0f} TF/s)  "
        f"int8 {t_i8*1e3:.2f} ms ({fl/t_i8/1e12:.0f} TOP/s)  "
        f"speedup {t_bf/t_i8:.2f}x"
    )


def bench_conv(name, b, h, w, cin, cout):
    x = jnp.ones((b, h, w, cin), jnp.bfloat16)
    k = jnp.ones((3, 3, cin, cout), jnp.bfloat16) * 0.01
    args = dict(
        window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert cin == cout, "chaining needs matching channels"

    def bf16(v):
        return jax.lax.conv_general_dilated(v, k, **args) * 0.01

    def i8_pipeline(v):
        with quant_scope("int8"):
            return quant_conv_general_dilated(v, k, **args) * 0.01

    t_bf = _time_chained(bf16, x)
    t_q = _time_chained(i8_pipeline, x)
    fl = 2 * b * h * w * 9 * cin * cout
    print(
        f"conv {name} ({b}x{h}x{w}x{cin}->{cout}): "
        f"bf16 {t_bf*1e3:.2f} ms ({fl/t_bf/1e12:.0f} TF/s)  "
        f"quant-pipeline {t_q*1e3:.2f} ms ({fl/t_q/1e12:.0f} TF-eq/s)  "
        f"speedup {t_bf/t_q:.2f}x"
    )


if __name__ == "__main__":
    print("devices:", jax.devices())
    bench_matmul(4096)
    bench_matmul(8192)
    # UNet 64^2 trunk conv at batch 16; VAE decoder 512^2 tail conv.
    bench_conv("unet_64", 16, 64, 64, 320, 320)
    bench_conv("unet_32", 16, 32, 32, 640, 640)
    bench_conv("vae_256", 16, 256, 256, 512, 512)
    bench_conv("vae_512", 16, 512, 512, 128, 128)
