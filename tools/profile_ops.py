"""Per-op time breakdown of one SD1.5 UNet call (and optionally the VAE
decode) on the real chip, via jax.profiler + ProfileData.

The tunneled backend makes trace VIEWERS impractical (tools/profile_gen.py
docstring), but the trace FILE is still written locally — this script
parses it programmatically and aggregates device-side op durations by
fusion name, printing the top-N. This is the microscope for the ~35% MFU
conv pool the stage-level profile cannot resolve.

Usage: python tools/profile_ops.py [--batch 16] [--what unet|vae|gen]
"""
import argparse
import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/icd_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def classify(name):
    """Bucket an XLA op event into a coarse kind.

    Event names look like `%fusion.1062 = bf16[...]{...} fusion(operands)`;
    the authoritative kind is the token right before the operand paren —
    matching substrings anywhere misattributes fusions whose OPERANDS are
    custom-call results."""
    opname = name.split(" = ", 1)[0].lower()
    if "flash_attention" in opname:
        return "pallas-flash-attention"
    # The op kind is the token right before the operand paren, e.g.
    # `%fusion.1 = bf16[...]{1,0:T(8,128)(2,1)} fusion(arg, ...)`. The
    # layout annotation contains parens too, so strip `{...}` blocks
    # before splitting at the first remaining paren.
    import re

    flat = re.sub(r"\{[^}]*\}", "", name)
    # tuple-returning fusions: `%f = (f32[..], bf16[..]) fusion(...)` —
    # strip the tuple type's parens so the kind token survives
    flat = re.sub(r"= \([^)]*\)", "= tuple", flat)
    head = flat.split("(", 1)[0].rstrip()
    kind = head.rsplit(" ", 1)[-1].lower()
    if kind == "custom-call":
        return "custom-call"
    if kind.startswith("convolution") or "%convolution" in opname:
        return "convolution"
    if "dot" in kind or "dot" in opname or "einsum" in opname:
        return "dot"
    if "all-reduce" in kind or "all-gather" in kind:
        return "collective"
    if kind in ("copy", "slice", "transpose", "bitcast", "reshape",
                "pad", "concatenate", "copy-done", "slice-done"):
        return "data-movement"
    if kind == "fusion" or "loop" in kind:
        # TPU XLA fuses convolutions/dots INTO fusions (kOutput); the op
        # name only betrays this through a conv-kernel-shaped operand
        # (f32[kh,kw,ci,co] with small kh/kw) or an attention-sized one.
        if re.search(r"(f32|bf16)\[[1-7],[1-7],\d+,\d+\]", name):
            return "fusion(conv)"
        if "reduce" in opname:
            return "fusion(reduce)"
        return "fusion(elementwise)"
    return "other"


def collect_ops(trace_dir):
    """Aggregate the synchronous compute lane ("XLA Ops") by op name.

    The "Async XLA Ops" lane holds DMA copies that OVERLAP compute —
    summing them double-counts, so they are excluded (that lane's events
    are mostly occupancy-wait, not bandwidth)."""
    from jax.profiler import ProfileData

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    assert paths, f"no xplane under {trace_dir}"
    data = ProfileData.from_file(paths[0])
    totals = collections.Counter()
    kinds = collections.Counter()
    total_device_time = 0.0
    for plane in data.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                dur = (ev.duration_ns or 0) / 1e6  # ms
                totals[ev.name] += dur
                kinds[classify(ev.name)] += dur
                total_device_time += dur
    return totals, kinds, total_device_time


def trim(name, width=70):
    return name if len(name) <= width else name[: width - 3] + "..."


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--what", default="unet", choices=["unet", "vae", "gen"])
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--width", type=int, default=70,
                    help="op-name display width (0 = untrimmed)")
    ap.add_argument("--kind", default=None,
                    help="only list ops whose classify() bucket matches")
    args = ap.parse_args()

    from invertible_cd_tpu.pipelines.pipeline import InvertibleCD

    pipe = InvertibleCD.sd15(dtype=jnp.bfloat16)
    b = args.batch

    if args.what == "unet":
        latent = jnp.zeros((b, 64, 64, 4), jnp.bfloat16)
        ctx = jnp.zeros((b, 77, 768), jnp.bfloat16)
        w_emb = jnp.zeros((b, 512), jnp.bfloat16)
        fn = jax.jit(lambda p, x, t, c, w: pipe.unet.apply(p, x, t, c, w_cond=w))

        def run():
            out = fn(
                pipe.params["reverse"], latent,
                jnp.full((b,), 999, jnp.int32), ctx, w_emb,
            )
            float(jax.device_get(out[0, 0, 0, 0]))
    elif args.what == "vae":
        z = jnp.zeros((b, 64, 64, 4), jnp.float32)
        fn = jax.jit(lambda p, z: pipe._decode_latents(p, z))

        def run():
            out = fn(pipe.params["vae"], z)
            float(jax.device_get(out[0, 0, 0, 0]))
    else:
        prompts = ["a photo of a corgi on the beach"] * b

        def run():
            imgs, _ = pipe.generate(prompts, key=jax.random.PRNGKey(0))
            float(jax.device_get(imgs[0, 0, 0, 0]))

    run()  # compile + warm
    run()
    tmp = tempfile.mkdtemp(prefix="icd_trace_")
    with jax.profiler.trace(tmp):
        run()
    totals, kinds, total = collect_ops(tmp)
    print(f"total XLA-Ops device time: {total:.2f} ms ({args.what}, batch {b})")
    print("\nby kind:")
    for kind, ms in kinds.most_common():
        print(f"{ms:9.3f}  {100 * ms / max(total, 1e-9):5.1f}  {kind}")
    print(f"\ntop ops:\n{'ms':>9}  {'%':>5}  op")
    width = args.width or 10**6
    shown = 0
    for name, ms in totals.most_common():
        if args.kind and classify(name) != args.kind:
            continue
        print(f"{ms:9.3f}  {100 * ms / max(total, 1e-9):5.1f}  {trim(name, width)}")
        shown += 1
        if shown >= args.top:
            break


if __name__ == "__main__":
    main()
