"""Recorded-reference parity, SDXL: replay the reference's seeded
inputs/latents through the real-weight InvertibleCDXL pipeline.

SDXL twin of tests/test_reference_parity.py — requires two artifacts a
zero-egress container cannot hold:
  * ICD_TPU_REFERENCE_PACK_XL — npz from tools/record_reference_sdxl.py
    (defaults to tests/golden/reference_pack_xl.npz)
  * ICD_TPU_SDXL_DIR — converted-source torch artifacts:
      teacher.safetensors (or .pt)     — guidance-distilled SDXL UNet
      vae.safetensors                  — diffusers SDXL AutoencoderKL
      text_encoder.safetensors         — CLIP ViT-L
      text_encoder_2.safetensors       — OpenCLIP bigG
      reverse.safetensors / forward.safetensors — kohya iCD-SDXL LoRAs

Covers: dual-tokenizer ids, penultimate-concat context + pooled embeds
(reference utils/generation_sdxl.py:9-76), SDXL UNet epsilon per stage,
fp32 VAE, the seeded 4-step generation (sample_deterministic,
generation_sdxl.py:324-473), forward-CD inversion at guidance 0
(inverse_sample_deterministic, :205-305), and the amplify-prompt edit
(running/sdxl/edit.py:201-234) — the full SDXL protocol under the
LPIPS <= 0.05 north-star gate.
"""
import os
import sys

import numpy as np
import pytest

_GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
PACK = os.environ.get(
    "ICD_TPU_REFERENCE_PACK_XL",
    os.path.join(_GOLDEN, "reference_pack_xl.npz"),
)
WEIGHTS = os.environ.get("ICD_TPU_SDXL_DIR", "")
_SYNTH = False
if not (os.path.exists(PACK) and os.path.isdir(WEIGHTS)):
    # Synthetic full-architecture fallback (VERDICT r3 item 1): pack from
    # tools/make_synthetic_pack_sdxl.py (committed), weights regenerated
    # deterministically in the module fixture (~14 GB, not committed).
    _synth_pack = os.path.join(_GOLDEN, "synth_pack_sdxl.npz")
    if os.path.exists(_synth_pack):
        PACK = _synth_pack
        WEIGHTS = os.path.join(_GOLDEN, "synth_sdxl")
        _SYNTH = True

pytestmark = [
    pytest.mark.slow,  # full 2.6B-parameter shapes on the CPU test backend
    pytest.mark.skipif(
        not (os.path.exists(PACK) and (_SYNTH or os.path.isdir(WEIGHTS))),
        reason="no SDXL reference pack (real or synthetic) available",
    ),
]


def _find(name):
    for ext in (".safetensors", ".pt", ".bin"):
        p = os.path.join(WEIGHTS, name + ext)
        if os.path.exists(p):
            return p
    return None


@pytest.fixture(scope="module")
def pack():
    return dict(np.load(PACK))


@pytest.fixture(scope="module")
def tol(pack):
    """(atol, rel) — wider when the pack was recorded at deployment fp16."""
    fp16 = str(pack.get("meta/dtype", "fp32")) == "fp16"
    return (2e-2, 5e-2) if fp16 else (2e-3, 5e-3)


@pytest.fixture(scope="module")
def pipe(pack):
    import jax.numpy as jnp

    from invertible_cd_tpu.models.convert import (
        convert_clip_text_from_transformers,
        load_torch_file,
    )
    from invertible_cd_tpu.pipelines.loading import load_bundle_params
    from invertible_cd_tpu.pipelines.sdxl import InvertibleCDXL

    if _SYNTH:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        from make_synthetic_pack_sdxl import ensure_weights_sdxl

        ensure_weights_sdxl(WEIGHTS)

    p = InvertibleCDXL.sdxl(dtype=jnp.float32)
    p.params = load_bundle_params(
        teacher=_find("teacher"),
        vae=_find("vae"),
        text=_find("text_encoder"),
        reverse_lora=_find("reverse"),
        forward_lora=_find("forward"),
        params=p.params,
    )
    p.params["text_2"] = convert_clip_text_from_transformers(
        load_torch_file(_find("text_encoder_2"))
    )
    return p


def _nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def test_tokenizer_parity(pack, pipe):
    """Both tokenizers must produce the reference ids (tokenizer_2 pads
    with 0, not eot — reference SDXL tokenizer_2 config)."""
    src = str(pack["edit/source"]) if "edit/source" in pack else None
    prompts = [src, str(pack["edit/target"])] if src else None
    if prompts is None:
        pytest.skip("pack lacks prompt strings")
    np.testing.assert_array_equal(
        np.asarray(pipe.tokenizer(prompts)), pack["clip/tokens"]
    )
    np.testing.assert_array_equal(
        np.asarray(pipe.tokenizer_2(prompts)), pack["clip/tokens2"]
    )


def test_dual_encoder_parity(pack, pipe, tol):
    prompts = [str(pack["edit/source"]), str(pack["edit/target"])]
    ctx, pooled = pipe.encode_prompt_xl(prompts)
    atol, rel = tol
    np.testing.assert_allclose(
        np.asarray(ctx), pack["clip/context"], atol=atol, rtol=rel
    )
    np.testing.assert_allclose(
        np.asarray(pooled), pack["clip/pooled"], atol=atol, rtol=rel
    )


def test_unet_epsilon_parity(pack, pipe, tol):
    import jax.numpy as jnp

    latent = jnp.asarray(_nhwc(pack["inputs/latent"]))
    t = jnp.asarray(pack["inputs/t"])
    ctx = jnp.asarray(pack["clip/context"])
    w_emb = jnp.asarray(pack["inputs/w_emb"])
    added = {
        "text_embeds": jnp.asarray(pack["clip/pooled"]),
        "time_ids": jnp.asarray(pack["inputs/time_ids"]),
    }

    n_down = len([k for k in pack if k.startswith("unet/down_")])
    n_up = len([k for k in pack if k.startswith("unet/up_")])
    stages = ["conv_in"]
    stages += [f"down_blocks_{i}" for i in range(n_down)]
    stages += ["mid_block"] + [f"up_blocks_{i}" for i in range(n_up)]
    pack_keys = {
        "conv_in": "unet/conv_in", "mid_block": "unet/mid",
        **{f"down_blocks_{i}": f"unet/down_{i}" for i in range(n_down)},
        **{f"up_blocks_{i}": f"unet/up_{i}" for i in range(n_up)},
    }

    def flt(mdl, method_name):
        return mdl.name in stages and method_name == "__call__"

    got, state = pipe.unet.apply(
        pipe.params["reverse"], latent, t, ctx, w_cond=w_emb,
        added_cond=added, capture_intermediates=flt,
    )
    _, rel_tol = tol
    inter = state["intermediates"]
    for stage in stages:
        key = pack_keys[stage]
        if key not in pack or stage not in inter:
            continue
        act = inter[stage]["__call__"][0]
        if isinstance(act, tuple):
            act = act[0]
        act = np.asarray(act, np.float32)
        want = _nhwc(pack[key])
        err = np.abs(act - want).max() / max(np.abs(want).max(), 1e-6)
        assert err < rel_tol, f"stage {stage} relative error {err}"

    err = np.abs(np.asarray(got) - _nhwc(pack["unet/out"])).max() / max(
        np.abs(pack["unet/out"]).max(), 1e-6
    )
    assert err < rel_tol, f"SDXL UNet epsilon relative error {err}"


def test_vae_parity(pack, pipe):
    import jax.numpy as jnp

    from invertible_cd_tpu.models import AutoencoderKL

    # fp32 either way: the reference decodes the SDXL VAE in fp32
    # (generation_sdxl.py:465-466) and ours stores it fp32.
    pixels = jnp.asarray(_nhwc(pack["inputs/pixels"]))
    mean = np.asarray(
        pipe.vae.apply(pipe.params["vae"], pixels, method=AutoencoderKL.encode_mean)
    )
    np.testing.assert_allclose(mean, _nhwc(pack["vae/mean"]), atol=5e-3, rtol=1e-2)
    dec = np.asarray(
        pipe.vae.apply(
            pipe.params["vae"], jnp.asarray(_nhwc(pack["vae/mean"])),
            method=AutoencoderKL.decode,
        )
    )
    np.testing.assert_allclose(dec, _nhwc(pack["vae/decode"]), atol=5e-3, rtol=1e-2)


def test_generation_trajectory_parity(pack, pipe):
    """Seeded init latent -> 4 hops at static guidance 7.0
    (launch_generation_iCD_sdxl.sh) -> final latent must match."""
    import jax.numpy as jnp

    latent = jnp.asarray(_nhwc(pack["gen/init"]))
    g = pipe.default_guidance(guidance_scale=7.0, dynamic_guidance=False)
    _, final = pipe.generate(
        [str(pack["edit/source"])], latent=latent, guidance=g
    )
    want = _nhwc(pack["gen/latents_final"])
    err = np.abs(np.asarray(final) - want).max()
    # scale-aware: synthetic random-weight trajectories reach larger
    # magnitudes than real ones (each hop multiplies by alpha_s/alpha_t)
    tol = max(0.1, 2e-3 * float(np.abs(want).max()))
    assert err < tol, f"SDXL generation final-latent divergence {err} (tol {tol})"


def _derived_start_noise(pack, pipe):
    """The exact start noise that makes OUR add_noise land on the
    reference's prepare_latents output (inv/start): the reference samples
    the VAE posterior and noises at t=19 inside prepare_latents
    (generation_sdxl.py:271-277); solving add_noise for the noise term
    absorbs the posterior-sample-vs-mean difference exactly."""
    import jax.numpy as jnp

    from invertible_cd_tpu.models import AutoencoderKL

    img = pack["inputs/image_u8"].astype(np.float32) / 255.0 * 2.0 - 1.0
    mean = np.asarray(
        pipe.vae.apply(
            pipe.params["vae"], jnp.asarray(img)[None], method=AutoencoderKL.encode_mean
        )
    )
    z0 = mean * pipe.scaling_factor
    t0 = int(pipe.grid.start_timestep)
    a = float(np.sqrt(np.asarray(pipe.schedule.alphas_cumprod)[t0]))
    s = float(np.sqrt(1.0 - np.asarray(pipe.schedule.alphas_cumprod)[t0]))
    return (_nhwc(pack["inv/start"]) - a * z0) / s


def test_inversion_parity(pack, pipe):
    import jax.numpy as jnp

    noise = _derived_start_noise(pack, pipe)
    inv, _ = pipe.invert(
        pack["inputs/image_u8"], str(pack["edit/source"]),
        noise=jnp.asarray(noise),
    )
    want = _nhwc(pack["inv/latents_final"])
    err = np.abs(np.asarray(inv) - want).max()
    tol = max(0.1, 2e-3 * float(np.abs(want).max()))
    assert err < tol, f"SDXL inversion final-latent divergence {err} (tol {tol})"


def test_amplify_edit_parity_and_lpips(pack, pipe):
    """The reference SDXL editing protocol (running/sdxl/edit.py:221-234):
    sample the TARGET prompt from the inverted latent under dynamic
    guidance 19.0 / tau 0.7 with amplify_prompt=[source]. Gates the final
    latent and, when LPIPS weights exist, the decoded image against the
    reference's (the north star applied to SDXL editing)."""
    import jax.numpy as jnp

    src = str(pack["edit/source"])
    tgt = str(pack["edit/target"])
    g = pipe.default_guidance(
        guidance_scale=19.0, dynamic_guidance=True, tau1=0.7, tau2=0.7
    )
    latent = jnp.asarray(_nhwc(pack["inv/latents_final"]))
    images, final = pipe.generate(
        [tgt], latent=latent, guidance=g, amplify_prompt=[src]
    )
    want = _nhwc(pack["edit/latents_final"])
    err = np.abs(np.asarray(final) - want).max()
    tol = max(0.1, 2e-3 * float(np.abs(want).max()))
    assert err < tol, f"SDXL edited-latent divergence {err} (tol {tol})"

    lpips_w = _find("lpips_vgg"), _find("lpips_lin")
    if all(lpips_w):
        from invertible_cd_tpu.metrics.lpips import LPIPS
        from invertible_cd_tpu.models.convert import (
            convert_lpips_weights,
            load_torch_file,
        )

        params = convert_lpips_weights(
            load_torch_file(lpips_w[0]), load_torch_file(lpips_w[1])
        )
        want = pack["edit/image"].astype(np.float32)[None] / 255.0
        score = float(LPIPS().apply(params, jnp.asarray(want), images))
        assert score <= 0.05, f"SDXL edit LPIPS north star violated: {score}"
