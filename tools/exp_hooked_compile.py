"""Measure the hooked 50-step DDIM editing program's compile cost
(VERDICT r3 item 9).

The consistency editing path unrolls only 4 hooked UNet calls — cheap to
compile. The DDIM/NTI editing BASELINES (`cli/edit.py --baseline
ddim|npi|nti`) run 50 controller-hooked UNet calls, and hooked steps
cannot use `lax.scan` (each step's controller structure is static), so
the program unrolls 50 full-size UNets (`pipelines/sampler.py ddim_loop`).
This tool times lower+compile of exactly that program at full SD1.5
shapes — on the real chip by default (the remote-compile service is the
thing being measured), `--platform cpu` for the local-XLA number.

  python tools/exp_hooked_compile.py                  # full 50 steps
  python tools/exp_hooked_compile.py --steps 10       # scaling probe
"""
from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# isolate from the bench cache: compile time is the measurement
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--run", action="store_true",
                    help="also execute the compiled program once")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from invertible_cd_tpu.diffusion.solver import make_solver_grid
    from invertible_cd_tpu.edit import empty_arrays, make_controller
    from invertible_cd_tpu.pipelines import GuidanceConfig
    from invertible_cd_tpu.pipelines.pipeline import InvertibleCD

    grid = make_solver_grid(n_steps=args.steps)
    pipe = InvertibleCD.sd15(dtype=jnp.bfloat16, grid=grid)
    src = "a photo of a corgi on the beach"
    tgt = "a photo of a cat on the beach"
    spec, arrays = make_controller(
        [src, tgt], pipe.tokenizer, num_steps=args.steps,
        is_replace_controller=True, cross_replace_steps=0.6,
        self_replace_steps=0.4,
    )
    # the NTI/DDIM baselines run explicit CFG (w_embed_dim=0) on the
    # teacher — reference launch_editing_NTI_sd1.5.sh, guidance 8.0
    g = GuidanceConfig(guidance_scale=8.0, w_embed_dim=0)

    ctx_u, ctx_c, added = pipe._encode_all([src, tgt])
    latent = pipe.init_latent(jax.random.PRNGKey(0), 2, dtype=jnp.bfloat16)
    nti_u = jnp.zeros((0,))

    fn = pipe._get_jit("ddim_generate", g, spec, False)
    t0 = time.perf_counter()
    lowered = fn.lower(
        pipe.params["teacher"], pipe.params["vae"], latent, ctx_u, ctx_c,
        arrays, nti_u, added,
    )
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    mem = compiled.memory_analysis()
    print(
        f"hooked {args.steps}-step DDIM edit program: "
        f"lower {t_lower:.1f}s, compile {t_compile:.1f}s"
    )
    if mem is not None:
        print(
            f"  code {getattr(mem, 'generated_code_size_in_bytes', 0) / 1e6:.0f} MB, "
            f"peak {getattr(mem, 'temp_size_in_bytes', 0) / 1e9:.2f} GB temp + "
            f"{getattr(mem, 'argument_size_in_bytes', 0) / 1e9:.2f} GB args"
        )
    if args.run:
        t0 = time.perf_counter()
        out = compiled(
            pipe.params["teacher"], pipe.params["vae"], latent, ctx_u,
            ctx_c, arrays, nti_u, added,
        )
        _ = float(np.asarray(out[0])[0, 0, 0, 0])
        print(f"  one execution: {time.perf_counter() - t0:.2f}s")


if __name__ == "__main__":
    main()
