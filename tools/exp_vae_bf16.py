"""bf16 SDXL VAE decode: quality + speed vs the fp32 default.

The reference keeps SDXL's VAE in fp32 because FP16 overflows
(`generation_sdxl.py:465-466`). bf16 has fp32's exponent range — it
cannot overflow where fp32 doesn't — so the only cost is mantissa
precision. This experiment decodes the same latent through the REAL
SDXL VAE architecture (128x128 latents -> 1024^2 pixels) with the fp32
and bf16 compute paths on identical bf16-stored params (the production
storage layout) and reports PSNR between the two plus chained-iteration
timings (tunnel-RTT-cancelling, see bench_kernels.py).

Run: python tools/exp_vae_bf16.py [--iters 6]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

from invertible_cd_tpu.utils.cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from invertible_cd_tpu.models import AutoencoderKL
from invertible_cd_tpu.models.vae import VAEConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    cfg = VAEConfig.sdxl()
    vae32 = AutoencoderKL(cfg, dtype=jnp.float32)
    vae16 = AutoencoderKL(cfg, dtype=jnp.bfloat16)

    shapes = jax.eval_shape(
        lambda: vae32.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 16, 16, 4)),
                           method=AutoencoderKL.decode)
    )
    rng = np.random.default_rng(0)

    def leaf(s):
        if len(s.shape) <= 1:
            return jnp.full(s.shape, 1.0, jnp.bfloat16)
        return jnp.asarray(
            0.05 * rng.standard_normal(s.shape, dtype=np.float32),
            jnp.bfloat16,
        )

    params = jax.tree.map(leaf, shapes)
    z = jnp.asarray(rng.normal(size=(1, 128, 128, 4)), jnp.float32)

    def dec32(p, z):
        return vae32.apply(p, z, method=AutoencoderKL.decode)

    def dec16(p, z):
        return vae16.apply(p, z, method=AutoencoderKL.decode)

    y32 = np.asarray(jax.jit(dec32)(params, z), np.float32)
    y16 = np.asarray(jax.jit(dec16)(params, z), np.float32)
    # outputs are pre-clip [-1, 1]-scale; PSNR over that range
    mse = float(np.mean((y32 - y16) ** 2))
    psnr = 10 * np.log10(4.0 / mse) if mse else float("inf")
    print(f"max|y32|={np.abs(y32).max():.2f}  "
          f"max diff={np.abs(y32 - y16).max():.4f}  PSNR={psnr:.1f} dB")

    def chained(fn):
        @jax.jit
        def chain(p, z):
            def body(c, _):
                y = fn(p, z + c * 1e-12)
                return y[0, 0, 0, 0].astype(jnp.float32), None
            last, _ = jax.lax.scan(body, jnp.float32(0), None,
                                   length=args.iters)
            return last

        @jax.jit
        def one(p, z):
            return fn(p, z)[0, 0, 0, 0].astype(jnp.float32)

        float(one(params, z)); float(chain(params, z))  # compile
        t0 = time.perf_counter(); float(one(params, z))
        t1 = time.perf_counter(); float(chain(params, z))
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (args.iters - 1)

    t32 = chained(dec32)
    t16 = chained(dec16)
    print(f"fp32 decode {t32 * 1e3:.1f} ms   bf16 decode {t16 * 1e3:.1f} ms"
          f"   speedup {t32 / t16:.2f}x")


if __name__ == "__main__":
    main()
