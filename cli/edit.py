"""Image editing CLI (capability twin of reference `running/sd1.5/edit.py`
+ `running/sdxl/edit.py`, C16/C18).

Per benchmark row (or single image): forward-CD invert under the source
prompt, build the p2p controller (replace vs refine auto-selected by word
counts, blend/equalizer words derived from the prompt difference with
stopword filtering — reference `edit.py:31-56,405-427`), reverse-CD decode
the [source, target] pair, save the edited image, optionally score.

Example:
  python cli/edit.py --model tiny --image in.jpg \
      --source "a cat" --target "a dog" --out /tmp/edit
  python cli/edit.py --model sd15 --benchmark editing_pie_bench_140.csv \
      --image_root images/ --out /tmp/pie_sweep
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/icd_tpu_jax_cache")

# --platform must take effect before jax initialises its backends.
if "--platform" in sys.argv:
    _plat = sys.argv[sys.argv.index("--platform") + 1]
    if _plat == "cpu":
        os.environ.setdefault(
            "XLA_FLAGS",
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8",
        )
    import jax

    jax.config.update("jax_platforms", _plat)

import jax
import jax.numpy as jnp
import numpy as np

from invertible_cd_tpu.utils.cache import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

STOPWORDS = {
    "a", "an", "the", "of", "on", "in", "at", "and", "is", "are", "with",
    "to", "for", "by", "from", "its", "his", "her",
}


def find_difference(source: str, target: str):
    """Word-level diff -> (blend words, changed target words) with stopword
    filtering (the reference's `find_difference*`, `edit.py:31-56`)."""
    sw, tw = source.split(), target.split()
    if len(sw) == len(tw):
        changed = [
            (a, b) for a, b in zip(sw, tw)
            if a != b and b.lower() not in STOPWORDS
        ]
        src_words = tuple(a for a, _ in changed)
        tgt_words = tuple(b for _, b in changed)
    else:
        src_set = {w.lower() for w in sw}
        tgt_words = tuple(
            w for w in tw if w.lower() not in src_set and w.lower() not in STOPWORDS
        )
        src_words = ()
    return src_words, tgt_words




def apply_config_file(p: "argparse.ArgumentParser", argv):
    """--config file.json sets parser defaults (CLI flags still override) —
    the typed replacement for the reference's bash-launcher configs."""
    import json

    argv = list(sys.argv[1:] if argv is None else argv)
    if "--config" in argv:
        path = argv[argv.index("--config") + 1]
        with open(path) as f:
            cfg = json.load(f)
        known = {a.dest for a in p._actions}
        mapped = {}
        for k, v in cfg.items():
            if k.startswith("_") or k not in known:
                continue
            if isinstance(v, list):
                mapped[k] = v
            else:
                mapped[k] = v
        p.set_defaults(**mapped)
    return argv


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None, help="JSON config with flag defaults (configs/*.json)")
    p.add_argument("--model", default="sd15", choices=["sd15", "sdxl", "tiny"])
    p.add_argument("--image", default=None)
    p.add_argument("--source", default=None)
    p.add_argument("--target", default=None)
    p.add_argument("--benchmark", default=None)
    p.add_argument("--image_root", default=None)
    p.add_argument("--max_cnt", type=int, default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--platform", default=None, help="cpu|tpu backend override (cpu needed for smoke tests in tunneled-TPU containers)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--quantize", default="off",
                   choices=["off", "int8", "int8_vae", "int8_static"],
                   help="opt-in int8 MXU inference (ops/quant.py); "
                        "int8_static auto-runs collect_quant_stats once")
    p.add_argument("--guidance_scale", type=float, default=None,
                   help="default 19.0 (cons editing) / 8.0 (DDIM baselines)")
    p.add_argument("--tau", type=float, default=0.8,
                   help="dynamic-guidance tau1 (reference --tau1; the "
                        "launch twin uses 0.8/0.8)")
    p.add_argument("--tau2", type=float, default=None,
                   help="dynamic-guidance tau2 (reference --tau2); "
                        "defaults to --tau. tau1<tau2 ramps the guidance "
                        "weight linearly between them")
    p.add_argument("--dynamic_guidance", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="schedule the guidance weight over t (reference "
                        "--dynamic_guidance; launch_editing_iCD passes True)")
    p.add_argument("--baseline", default="none",
                   choices=["none", "ddim", "npi", "nti"],
                   help="50-step DDIM-inversion editing baselines instead of "
                        "the consistency models (reference launch_editing_"
                        "NTI/NPI scripts): plain DDIM, Negative-Prompt "
                        "Inversion, or Null-Text Inversion")
    p.add_argument("--nti_guidance_scale", type=float, default=8.0,
                   help="CFG scale inside the NTI optimisation (reference "
                        "--nti_guidance_scale)")
    p.add_argument("--nti_inner_steps", type=int, default=10)
    p.add_argument("--uncond_cache", default=None,
                   help="pickle file caching NTI per-step uncond embeddings "
                        "by source prompt (reference "
                        "--path_to_uncond_embeddings)")
    p.add_argument("--num_ddim_steps", type=int, default=50,
                   help="DDIM grid size (reference --num_ddim_steps)")
    p.add_argument("--cross_replace_steps", type=float, default=0.6)
    p.add_argument("--self_replace_steps", type=float, default=0.4)
    p.add_argument("--no_blend", action="store_true")
    p.add_argument("--amplify", type=float, default=None,
                   help="equalizer value for changed words (reweight chain)")
    p.add_argument("--is_replacement", action="store_true",
                   help="strict single-word-replacement mode (reference "
                        "--is_replacement): skip benchmark rows that are "
                        "not one-word same-length replacements, force the "
                        "replace controller with blend/equalizer on the "
                        "swapped pair (amplify defaults to 3)")
    p.add_argument("--reverse_timesteps", type=int, nargs="*", default=None,
                   help="default: 259 519 779 999 (SD1.5) / "
                        "249 499 699 999 (SDXL, reference running/sdxl)")
    p.add_argument("--forward_timesteps", type=int, nargs="*", default=None,
                   help="default: 19 259 519 779 (SD1.5) / "
                        "19 249 499 699 (SDXL)")
    p.add_argument("--reverse_lora", default=None)
    p.add_argument("--forward_lora", default=None)
    p.add_argument("--teacher_checkpoint", default=None)
    p.add_argument("--vae_checkpoint", default=None)
    p.add_argument("--text_checkpoint", default=None)
    p.add_argument("--calc_metrics", action="store_true")
    p.add_argument("--crop_left", type=int, default=0,
                   help="load_512 edge-crop offsets before the center "
                        "square crop (reference generation.py:546-558)")
    p.add_argument("--crop_right", type=int, default=0)
    p.add_argument("--crop_top", type=int, default=0)
    p.add_argument("--crop_bottom", type=int, default=0)
    from cli.generate import add_scorer_args

    add_scorer_args(p)
    argv = apply_config_file(p, argv)
    return p.parse_args(argv)


def edit_one_sdxl(pipe, args, image, source, target):
    """SDXL editing protocol (reference `running/sdxl/edit.py:201-234`):
    forward-CD invert under the source prompt at guidance 0, then sample the
    TARGET prompt with dynamic guidance and `amplify_prompt=[source]` — the
    source context is swapped in while t > tau1*1000. No p2p controller."""
    from invertible_cd_tpu.pipelines.pipeline import to_uint8

    tau2 = args.tau if args.tau2 is None else args.tau2
    g = pipe.default_guidance(
        guidance_scale=args.guidance_scale,
        dynamic_guidance=args.dynamic_guidance, tau1=args.tau, tau2=tau2,
    )
    imgs, _ = pipe.edit(
        image, source, target, key=jax.random.PRNGKey(args.seed), guidance=g,
    )
    u8 = to_uint8(imgs)
    return u8[0], u8[1]


def _build_edit_controller(pipe, args, source, target, blend_pair, num_steps):
    """Controller derivation shared by the cons and DDIM-baseline paths
    (reference `edit.py:405-427`): replace vs refine by word counts, blend
    words from the prompt diff, optional reweight chain."""
    from invertible_cd_tpu.edit import make_controller

    if args.is_replacement:
        # reference `edit.py:410-415`: force the replace controller, blend
        # and amplify exactly the swapped word pair (rows were pre-filtered
        # to one-word same-length replacements in main())
        w1, w2 = next(
            (a, b) for a, b in zip(source.split(), target.split()) if a != b
        )
        is_replace = True
        blend_words = None if args.no_blend else [[w1], [w2]]
        amp = 3.0 if args.amplify is None else args.amplify
        eq = {"words": (w2,), "values": (amp,)}
        return make_controller(
            [source, target], pipe.tokenizer, num_steps=num_steps,
            is_replace_controller=is_replace,
            cross_replace_steps=args.cross_replace_steps,
            self_replace_steps=args.self_replace_steps,
            blend_words=blend_words, equalizer_params=eq,
        )

    sw, tw = find_difference(source, target)
    is_replace = len(source.split()) == len(target.split())
    blend_words = None
    if not args.no_blend:
        if blend_pair and len(blend_pair) >= 2:
            blend_words = [[blend_pair[0]], [blend_pair[1]]]
        elif sw and tw:
            blend_words = [list(sw), list(tw)]
    eq = None
    if args.amplify and tw:
        eq = {"words": tw, "values": (args.amplify,) * len(tw)}
    return make_controller(
        [source, target], pipe.tokenizer, num_steps=num_steps,
        is_replace_controller=is_replace,
        cross_replace_steps=args.cross_replace_steps,
        self_replace_steps=args.self_replace_steps,
        blend_words=blend_words, equalizer_params=eq,
    )


def _cached_nti(pipe, args, image, source, trajectory=None):
    """NTI per-step uncond embeddings with the reference's prompt-keyed
    cache file (`running/sd1.5/edit.py:348-351,363-367,392-397`). The
    key is the source prompt alone, as in the reference (PieBench prompts
    map 1:1 to images); entries whose step count doesn't match the current
    --num_ddim_steps grid are recomputed rather than crashing the sweep.
    Writes re-merge the file and replace it atomically so concurrent
    multi-host sweeps sharing one cache path can't corrupt it."""
    import pickle
    import tempfile

    from invertible_cd_tpu.pipelines import nti as nti_mod

    def _load():
        if args.uncond_cache and os.path.exists(args.uncond_cache):
            with open(args.uncond_cache, "rb") as f:
                return pickle.load(f)
        return {}

    cache = _load()
    hit = cache.get(source)
    if hit is not None and hit.shape[0] == pipe.grid.n_steps:
        return jax.numpy.asarray(hit)
    per_step, _ = nti_mod.null_text_inversion(
        pipe, image, source, num_inner_steps=args.nti_inner_steps,
        guidance_scale=args.nti_guidance_scale, trajectory=trajectory,
    )
    if args.uncond_cache:
        cache = _load()  # merge entries written since we read
        cache[source] = np.asarray(per_step)
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(os.path.abspath(args.uncond_cache)) or "."
        )
        with os.fdopen(fd, "wb") as f:
            pickle.dump(cache, f)
        os.replace(tmp, args.uncond_cache)
    return per_step


def edit_one_baseline(pipe, args, image, source, target, blend_pair):
    """DDIM-inversion editing baselines (reference NTI/NPI launch scripts;
    `edit.py:363-397`): 50-step DDIM inversion of the image under the
    source prompt with the TEACHER model, per-step uncond embeddings from
    NTI (optimised) or NPI (:= cond embeddings) or left as the real uncond
    (plain DDIM), then the 50-step CFG DDIM loop over the [source, target]
    pair with the p2p controller."""
    import invertible_cd_tpu.pipelines.sampler as S
    from invertible_cd_tpu.pipelines import nti as nti_mod
    from invertible_cd_tpu.pipelines.pipeline import to_uint8

    n = pipe.grid.n_steps
    traj, _ = pipe.ddim_invert(image, source)
    inv_latent = traj[-1]
    nti_uncond = None
    if args.baseline == "nti":
        nti_uncond = _cached_nti(pipe, args, image, source, trajectory=traj)
    elif args.baseline == "npi":
        nti_uncond = nti_mod.negative_prompt_inversion(pipe, source)
    if nti_uncond is not None:
        # optimised at batch 1; the edit pair shares it across both rows
        # (reference expands per-step uncond over the batch,
        # `generation.py:246-249`)
        nti_uncond = jnp.broadcast_to(
            nti_uncond, (n, 2) + nti_uncond.shape[2:]
        )
    ctrl = _build_edit_controller(pipe, args, source, target, blend_pair, n)
    # The reference forwards dynamic_guidance/tau1/tau2 to the runner in
    # baseline modes too (`edit.py:435-458`; its launch scripts leave them
    # at the default False) — honor an explicit --dynamic_guidance here
    # instead of silently dropping it.
    tau2 = args.tau if args.tau2 is None else args.tau2
    g = S.GuidanceConfig(
        guidance_scale=args.guidance_scale, w_embed_dim=0,
        dynamic_guidance=args.dynamic_guidance, tau1=args.tau, tau2=tau2,
    )
    latent = jnp.broadcast_to(inv_latent[:1], (2,) + inv_latent.shape[1:])
    imgs, _ = pipe.ddim_generate(
        [source, target], latent=latent, guidance=g, controller=ctrl,
        nti_uncond=nti_uncond, model="teacher",
    )
    u8 = to_uint8(imgs)
    return u8[0], u8[1]


def edit_one(pipe, args, image, source, target, blend_pair):
    from invertible_cd_tpu.pipelines.pipeline import to_uint8

    if args.model == "sdxl":
        return edit_one_sdxl(pipe, args, image, source, target)
    if args.baseline != "none":
        return edit_one_baseline(pipe, args, image, source, target, blend_pair)

    ctrl = _build_edit_controller(
        pipe, args, source, target, blend_pair, pipe.grid.num_reverse_steps
    )
    tau2 = args.tau if args.tau2 is None else args.tau2
    g = pipe.default_guidance(
        guidance_scale=args.guidance_scale,
        dynamic_guidance=args.dynamic_guidance, tau1=args.tau, tau2=tau2,
        edit_pair=True,
    )
    imgs, _ = pipe.edit(
        image, source, target, ctrl, key=jax.random.PRNGKey(args.seed),
        guidance=g,
    )
    u8 = to_uint8(imgs)
    return u8[0], u8[1]  # (reconstruction, edited)


def main(argv=None):
    args = parse_args(argv)
    if args.baseline != "none" and args.model == "sdxl":
        # the reference ships DDIM/NTI/NPI baselines for SD1.5 only
        # (running/sd1.5/launch_editing_NTI/NPI); the SDXL editing
        # protocol is amplify_prompt without a p2p controller
        sys.exit("--baseline is SD1.5-only (the reference has no SDXL "
                 "NTI/NPI baselines); drop --baseline or use --model sd15")
    if args.guidance_scale is None:
        # reference defaults: 19 for cons editing (launch_editing_iCD),
        # 8.0 for the DDIM/NTI/NPI baselines (launch_editing_NTI/NPI)
        args.guidance_scale = 8.0 if args.baseline != "none" else 19.0
    from PIL import Image

    from invertible_cd_tpu.data import load_benchmark
    from invertible_cd_tpu.pipelines import load_512
    from cli.generate import build_pipeline

    os.makedirs(args.out, exist_ok=True)
    pipe = build_pipeline(args)
    pix = pipe.latent_size[0] * (
        2 ** (len(pipe.vae.cfg.block_out_channels) - 1)
    )

    rows = []
    if args.benchmark:
        for r in load_benchmark(args.benchmark, kind="editing",
                                max_count=args.max_cnt):
            rows.append((os.path.join(args.image_root or "", r.file_name),
                         r.source_prompt, r.target_prompt, r.blend_words))
    else:
        assert args.image and args.source and args.target
        rows.append((args.image, args.source, args.target, ()))
    if args.is_replacement:
        # reference `edit.py:355-359`: strict mode keeps only one-word
        # same-length replacements
        def _is_one_word_swap(src, tgt):
            s, t = src.split(), tgt.split()
            return len(s) == len(t) and sum(a != b for a, b in zip(s, t)) == 1

        kept = [r for r in rows if _is_one_word_swap(r[1], r[2])]
        if len(kept) != len(rows):
            print(f"--is_replacement: kept {len(kept)}/{len(rows)} "
                  "one-word-replacement rows")
        rows = kept
    rows = rows[jax.process_index()::jax.process_count()]

    evals = None
    if args.calc_metrics:
        from cli.generate import build_evaluators

        evals = build_evaluators(args)

    results = []
    per_row_metrics = []
    for i, (path, source, target, blend) in enumerate(rows):
        img = load_512(
            path, left=args.crop_left, right=args.crop_right,
            top=args.crop_top, bottom=args.crop_bottom, size=pix,
        )
        rec, edited = edit_one(pipe, args, img, source, target, blend)
        out_path = os.path.join(args.out, f"{i:05d}_edited.jpg")
        Image.fromarray(edited).save(out_path)
        Image.fromarray(rec).save(out_path.replace("_edited", "_rec"))
        results.append({"file": out_path, "source": source, "target": target})
        if evals is not None:
            # the reference's editing bundle (`edit.py:465-486` via
            # metrics.calc_all): preservation CLIP-I/I + DINOv2 vs the
            # original, editing CLIP-I/T + ImageReward vs the target prompt
            orig01 = np.asarray(img, np.float32)[None] / 255.0
            edit01 = np.asarray(edited, np.float32)[None] / 255.0
            per_row_metrics.append(
                evals.calc_all(orig01, edit01, [source], [target])
            )
        print(f"[{i + 1}/{len(rows)}] {source!r} -> {target!r}")

    # Compiled-executable census: every jitted program the sweep used and
    # how many distinct lowerings it holds. A well-formed benchmark sweep
    # compiles each program ONCE — per-row growth here means shape/static
    # churn (recompiles), the silent killer of sweep throughput.
    compiles = {}
    for key, fn in pipe._jit_cache.items():
        size = getattr(fn, "_cache_size", None)
        name = key[0] if isinstance(key, tuple) else str(key)
        if size is not None:
            compiles[name] = compiles.get(name, 0) + int(size())
    summary = {"results": results, "compiled_executables": compiles}
    if per_row_metrics:
        keys = per_row_metrics[0].keys()
        summary["metrics"] = {
            k: (
                float(np.mean([m[k] for m in per_row_metrics]))
                if all(m[k] is not None for m in per_row_metrics) else None
            )
            for k in keys
        }
        if any(v is None for v in summary["metrics"].values()):
            # no absolute anchor without the published scorer weights
            # (zero-egress container); the harness still proves plumbing
            summary["metrics_note"] = (
                "null metrics = scorer weights not provided; pass "
                "--clip_vision_weights/--dino_weights/... (see "
                "scripts/download_fid_files.sh and PARITY.md) to score "
                "with the reference protocol"
            )
        print("metrics:", summary["metrics"])
    with open(os.path.join(args.out, "results.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(f"wrote {len(results)} edits to {args.out}")


if __name__ == "__main__":
    main()
