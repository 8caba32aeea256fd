"""Round-3 experiment: where does the UNet's GroupNorm time go?

tools/profile_ops.py (batch-16 UNet call) shows the GN moment fusions
(f32[16,C] sum / sum-of-squares tuples) costing 0.8-2.5 ms each — vs a
~0.05 ms bandwidth floor for a 42 MB activation. This measures, ON CHIP:

  1. the standalone GN stats reduction at the UNet's 64^2 shapes,
  2. the full standalone GroupNorm32 (stats + apply),
  3. variants: fp32-upcast-then-sum vs bf16-partial-sums, one fused
     jnp.var pass, (B,HW,C) vs native NHWC axes,

to decide whether the in-situ cost is intrinsic (VPU/layout) or an XLA
fusion-duplication artifact (producers recomputed into the stats fusion).

Run: python tools/exp_gn.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/icd_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def _fence(x):
    float(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0]))


def make_loop(fn, iters):
    @jax.jit
    def run(x):
        def body(c, _):
            o = fn(c)
            # tiny dependency so iterations serialize
            leaf = jax.tree_util.tree_leaves(o)[0]
            bump = (leaf.ravel()[0]).astype(c.dtype) * jnp.asarray(1e-12, c.dtype)
            return c + bump, ()

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c

    return run


def bench(fn, x, iters=24, reps=5):
    run1 = make_loop(fn, 1)
    runn = make_loop(fn, iters)

    def t(run):
        _fence(run(x))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _fence(run(x))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    return max(t(runn) - t(run1), 1e-9) / (iters - 1)


def main():
    B, H, W, C = 16, 64, 64, 320
    G = 32
    gc = C // G
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
    nbytes = x.size * 2
    print(f"shape {(B,H,W,C)}  {nbytes/1e6:.1f} MB  BW floor "
          f"{nbytes/819e9*1e3:.3f} ms/pass")

    def stats_f32(x):
        xf = x.reshape(B, -1, C).astype(jnp.float32)
        return jnp.sum(xf, 1), jnp.sum(jnp.square(xf), 1)

    def stats_native(x):
        xf = x.astype(jnp.float32)
        return jnp.sum(xf, (1, 2)), jnp.sum(jnp.square(xf), (1, 2))

    def stats_bf16_partial(x):
        # two-stage: bf16 row sums over sublane tiles, then f32
        xf = x.reshape(B, -1, 8, C)
        s1 = jnp.sum(xf.astype(jnp.float32), 2)
        return jnp.sum(s1, 1), jnp.sum(jnp.square(s1) * 0 + jnp.sum(
            jnp.square(xf.astype(jnp.float32)), 2), 1)

    def gn_current(x):
        from invertible_cd_tpu.models.layers import GroupNorm32

        mod = GroupNorm32(G, 1e-5, dtype=jnp.bfloat16)
        params = mod.init(jax.random.PRNGKey(0), x)
        return mod.apply(params, x)

    gn_mod_params = None

    for name, fn in [
        ("stats (B,HW,C) f32", stats_f32),
        ("stats native NHWC", stats_native),
    ]:
        ms = bench(fn, x) * 1e3
        gbs = nbytes / (ms / 1e3) / 1e9
        print(f"{name:28} {ms:8.3f} ms  {gbs:7.1f} GB/s")

    # full GN (module) — init once outside timing
    from invertible_cd_tpu.models.layers import GroupNorm32

    mod = GroupNorm32(G, 1e-5, dtype=jnp.bfloat16)
    params = mod.init(jax.random.PRNGKey(0), x)

    ms = bench(lambda y: mod.apply(params, y), x) * 1e3
    print(f"{'full GroupNorm32':28} {ms:8.3f} ms  "
          f"({3*nbytes/(ms/1e3)/1e9:.1f} GB/s over 3 passes)")

    # conv -> GN chain: does fusing the conv epilogue into the stats
    # duplicate work? compare (conv; barrier; gn) vs (conv; gn).
    wkey = jax.random.PRNGKey(1)
    wconv = jax.random.normal(wkey, (3, 3, C, C), jnp.bfloat16) * 0.02

    def conv(y):
        return jax.lax.conv_general_dilated(
            y, wconv, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    def conv_gn(y):
        return mod.apply(params, conv(y))

    def conv_barrier_gn(y):
        z = jax.lax.optimization_barrier(conv(y))
        return mod.apply(params, z)

    for name, fn in [
        ("conv only", conv),
        ("conv + GN (fused)", conv_gn),
        ("conv + barrier + GN", conv_barrier_gn),
    ]:
        ms = bench(fn, x) * 1e3
        print(f"{name:28} {ms:8.3f} ms")


if __name__ == "__main__":
    main()
