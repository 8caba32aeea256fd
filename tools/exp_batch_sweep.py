"""Round-3 batch-size re-sweep for the generation headline.

Round-2 measured 4->6.3, 8->14.5, 16->20.4, 32->20.2 images/sec; round 3
changed attention routing and kernels, so re-verify that batch 16 is
still the throughput point (bench.py gen).

Run: python tools/exp_batch_sweep.py [--batches 16 24 32]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/icd_tpu_jax_cache")

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[16, 24, 32])
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    from invertible_cd_tpu.pipelines.pipeline import InvertibleCD
    import jax.numpy as jnp

    pipe = InvertibleCD.sd15(dtype=jnp.bfloat16)
    for b in args.batches:
        prompts = ["a photo of a corgi on the beach"] * b
        imgs, _ = pipe.generate(prompts, key=jax.random.PRNGKey(150))
        float(jax.device_get(imgs[0, 0, 0, 0]))  # compile + fence
        t0 = time.perf_counter()
        for i in range(args.iters):
            imgs, _ = pipe.generate(prompts, key=jax.random.PRNGKey(i))
        float(jax.device_get(imgs[0, 0, 0, 0]))  # queued stream, one fence
        dt = time.perf_counter() - t0
        print(f"batch {b:3d}: {b * args.iters / dt:7.3f} images/sec "
              f"({dt / args.iters * 1e3:7.1f} ms/iter)")


if __name__ == "__main__":
    main()
