"""Dump the optimized HLO of one batch-16 SD1.5 UNet call and print the
definition of named fusions (to see what XLA actually duplicated into the
suspiciously slow GroupNorm moment fusions — see tools/exp_gn.py).

Run: python tools/exp_hlo_dump.py fusion.839 fusion.68 ...
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/icd_tpu_jax_cache")

import jax
import jax.numpy as jnp


def main():
    names = sys.argv[1:] or ["fusion.839"]
    from invertible_cd_tpu.pipelines.pipeline import InvertibleCD

    pipe = InvertibleCD.sd15(dtype=jnp.bfloat16)
    b = 16
    latent = jnp.zeros((b, 64, 64, 4), jnp.bfloat16)
    ctx = jnp.zeros((b, 77, 768), jnp.bfloat16)
    w_emb = jnp.zeros((b, 512), jnp.bfloat16)
    fn = jax.jit(lambda p, x, t, c, w: pipe.unet.apply(p, x, t, c, w_cond=w))
    lowered = fn.lower(
        pipe.params["reverse"], latent, jnp.full((b,), 999, jnp.int32), ctx,
        w_emb,
    )
    compiled = lowered.compile()
    txt = compiled.as_text()
    path = "/tmp/unet_b16_opt.hlo"
    with open(path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)/1e6:.1f} MB optimized HLO to {path}")
    lines = txt.splitlines()
    for name in names:
        tag = f"%{name} "
        for i, ln in enumerate(lines):
            if tag in ln and "= " in ln:
                print(f"\n=== {name} (line {i}) ===")
                print(ln.strip()[:2000])
                # print the called fusion computation name
                if "calls=" in ln:
                    comp = ln.split("calls=")[1].split(",")[0].split(")")[0]
                    print(f"  calls computation: {comp}")
                break


if __name__ == "__main__":
    main()
