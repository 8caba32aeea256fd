"""Recorded-reference parity: replay the reference's seeded inputs/noise
through the real-weight pipeline and compare activations + trajectories.

Requires two artifacts that cannot exist in this zero-egress container:
  * ICD_TPU_REFERENCE_PACK — npz produced by tools/record_reference.py in a
    weights-capable environment (defaults to tests/golden/reference_pack.npz)
  * ICD_TPU_SD15_DIR — directory with the converted-source torch artifacts:
      teacher.safetensors (or .pt)  — guidance-distilled SD1.5 UNet
      vae.safetensors               — diffusers AutoencoderKL
      text_encoder.safetensors      — transformers CLIPTextModel
      reverse.safetensors / forward.safetensors — kohya iCD LoRAs

When both are present this is the LPIPS <= 0.05 north-star gate
(BASELINE.md); otherwise the whole module skips. Converter/model semantics
are still covered weights-free by tests/test_unet_vae_parity.py.
"""
import os
import sys

import numpy as np
import pytest

_GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
PACK = os.environ.get(
    "ICD_TPU_REFERENCE_PACK", os.path.join(_GOLDEN, "reference_pack.npz")
)
WEIGHTS = os.environ.get("ICD_TPU_SD15_DIR", "")
_SYNTH = False
if not (os.path.exists(PACK) and os.path.isdir(WEIGHTS)):
    # Fall back to the SYNTHETIC full-shape pack (VERDICT r3 item 1):
    # same 860M architecture and replay path, deterministic random
    # weights recorded by tools/make_synthetic_pack.py. The weights dir
    # (3.4 GB) is not committed — it regenerates in ~1 min inside the
    # module fixture below, purely from numpy's seeded PCG64 stream.
    _synth_pack = os.path.join(_GOLDEN, "synth_pack_sd15.npz")
    if os.path.exists(_synth_pack):
        PACK = _synth_pack
        WEIGHTS = os.path.join(_GOLDEN, "synth_sd15")
        _SYNTH = True

pytestmark = [
    pytest.mark.slow,  # full 860M shapes on the CPU test backend
    pytest.mark.skipif(
        not (os.path.exists(PACK) and (_SYNTH or os.path.isdir(WEIGHTS))),
        reason="no reference pack (real or synthetic) available",
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
def pipe():
    import jax.numpy as jnp

    from invertible_cd_tpu.pipelines.loading import load_bundle_params
    from invertible_cd_tpu.pipelines.pipeline import InvertibleCD

    if _SYNTH:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
        from make_synthetic_pack import ensure_weights

        ensure_weights(WEIGHTS)

    p = InvertibleCD.sd15(dtype=jnp.float32)
    p.params = load_bundle_params(
        teacher=_find("teacher"),
        vae=_find("vae"),
        text=_find("text_encoder"),
        reverse_lora=_find("reverse"),
        forward_lora=_find("forward"),
        params=p.params,
    )
    return p


def _nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def test_clip_parity(pack, pipe):
    import jax.numpy as jnp

    fn = pipe._get_jit("encode_text")
    got = np.asarray(fn(pipe.params["text"], jnp.asarray(pack["clip/tokens"])))
    np.testing.assert_allclose(got, pack["clip/last_hidden"], atol=2e-4, rtol=1e-3)


def test_unet_epsilon_parity(pack, pipe):
    import jax.numpy as jnp

    latent = jnp.asarray(_nhwc(pack["inputs/latent"]))
    t = jnp.asarray(pack["inputs/t"])
    ctx = jnp.asarray(pack["clip/last_hidden"])
    w_emb = jnp.asarray(pack["inputs/w_emb"])

    # Per-stage activations (the recorder hooks conv_in / each block):
    # a converter bug fails at the FIRST diverging stage, not just the end.
    stages = ["conv_in"]
    stages += [f"down_blocks_{i}" for i in range(4)]
    stages += ["mid_block"] + [f"up_blocks_{i}" for i in range(4)]
    pack_keys = {
        "conv_in": "unet/conv_in", "mid_block": "unet/mid",
        **{f"down_blocks_{i}": f"unet/down_{i}" for i in range(4)},
        **{f"up_blocks_{i}": f"unet/up_{i}" for i in range(4)},
    }

    def flt(mdl, method_name):
        return mdl.name in stages and method_name == "__call__"

    got, state = pipe.unet.apply(
        pipe.params["reverse"], latent, t, ctx, w_cond=w_emb,
        capture_intermediates=flt,
    )
    inter = state["intermediates"]
    for stage in stages:
        key = pack_keys[stage]
        if key not in pack or stage not in inter:
            continue
        act = inter[stage]["__call__"][0]
        if isinstance(act, tuple):  # down blocks return (x, skips)
            act = act[0]
        act = np.asarray(act, np.float32)
        want = _nhwc(pack[key])
        err = np.abs(act - want).max() / max(np.abs(want).max(), 1e-6)
        assert err < 5e-3, f"stage {stage} relative error {err}"

    got = np.asarray(got)
    want = _nhwc(pack["unet/out"])
    err = np.abs(got - want).max() / max(np.abs(want).max(), 1e-6)
    assert err < 5e-3, f"UNet epsilon relative error {err}"


def test_vae_parity(pack, pipe):
    import jax.numpy as jnp

    from invertible_cd_tpu.models import AutoencoderKL

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
    """Replay the reference's seed-150 start noise through the 4-hop
    reverse-CD sampler (reference utils/generation.py:373-412)."""
    import jax.numpy as jnp

    latent = jnp.asarray(np.broadcast_to(_nhwc(pack["gen/noise"]), (1, 64, 64, 4)))
    g = pipe.default_guidance(guidance_scale=19.0, dynamic_guidance=False)
    images, final = pipe.generate(
        ["a photo of a corgi on the beach"], latent=latent, guidance=g
    )
    want = _nhwc(pack[f"gen/latents_{len([k for k in pack if k.startswith('gen/latents')]) - 1}"])
    # scale-aware gate: real-weight latents are ~3-5 in magnitude (0.1 abs
    # ~ 2% rel); synthetic random-weight trajectories legitimately reach
    # ~70 because each consistency hop multiplies by alpha_s/alpha_t
    err = np.abs(np.asarray(final) - want).max()
    tol = max(0.1, 2e-3 * float(np.abs(want).max()))
    assert err < tol, f"final latent divergence {err} (tol {tol})"


def test_inversion_parity_and_lpips_north_star(pack, pipe):
    import jax.numpy as jnp

    pixels01 = _nhwc(pack["inputs/pixels"]).astype(np.float32) * 0.5 + 0.5
    image = (pixels01[0] * 255).astype(np.uint8)
    # inversion runs under the SOURCE prompt (reference edit.py:369-390;
    # the recorder's init_prompt state) — prompt="" would be a different
    # cross-attention context
    inv, clean = pipe.invert(
        image, str(pack.get("edit/source", "a photo of a corgi on the beach")),
        noise=jnp.asarray(_nhwc(pack["inv/noise"])),
    )
    err = np.abs(np.asarray(inv) - _nhwc(pack["inv/latents_final"])).max()
    assert err < 0.1, f"inversion latent divergence {err}"

    # LPIPS <= 0.05 north star on the reconstruction round trip
    lpips_w = _find("lpips_vgg"), _find("lpips_lin")
    if all(lpips_w):
        from invertible_cd_tpu.metrics.lpips import LPIPS
        from invertible_cd_tpu.models.convert import convert_lpips_weights, load_torch_file

        params = convert_lpips_weights(
            load_torch_file(lpips_w[0]), load_torch_file(lpips_w[1])
        )
        imgs, _ = pipe.generate([""], latent=jnp.broadcast_to(inv[:1], (1, 64, 64, 4)))
        model = LPIPS()
        score = float(
            model.apply(params, jnp.asarray(pixels01[:1]), imgs)
        )
        assert score <= 0.05, f"LPIPS north star violated: {score}"


def test_edit_trajectory_parity(pack, pipe):
    """Replay the recorded p2p-controlled edit (VERDICT r2 item 3): same
    inverted latent, same controller config -> the final [source, target]
    latents and the step-0 16^2 down-cross controller output must match
    the reference's (running/sd1.5/edit.py:369-458, utils/p2p.py:176-265)."""
    import dataclasses

    import jax.numpy as jnp

    from invertible_cd_tpu.edit import make_controller

    if "edit/latents_3" not in pack:
        pytest.skip("pack predates the edit section (re-run record_reference)")

    src = str(pack["edit/source"])
    tgt = str(pack["edit/target"])
    sw = str(pack["edit/blend_src"]).split()
    tw = str(pack["edit/blend_tgt"]).split()
    spec, arrays = make_controller(
        [src, tgt], pipe.tokenizer, num_steps=4,
        is_replace_controller=True,
        cross_replace_steps=float(pack["edit/cross_replace_steps"]),
        self_replace_steps=float(pack["edit/self_replace_steps"]),
        blend_words=[sw, tw] if sw else None,
        equalizer_params={"words": tw, "values": (4.0,) * len(tw)}
        if tw else None,
    )
    spec = dataclasses.replace(spec, store_all=True)
    g = pipe.default_guidance(
        guidance_scale=19.0, dynamic_guidance=True, tau1=0.8, tau2=0.8,
        edit_pair=True,
    )
    inv = _nhwc(pack["inv/latents_final"])
    latent = jnp.asarray(np.broadcast_to(inv, (2,) + inv.shape[1:]))
    images, final, store = pipe.generate(
        [src, tgt], latent=latent, guidance=g, controller=(spec, arrays)
    )
    n_hops = len([k for k in pack if k.startswith("edit/latents")])
    want = _nhwc(pack[f"edit/latents_{n_hops - 1}"])
    err = np.abs(np.asarray(final) - want).max()
    tol = max(0.1, 2e-3 * float(np.abs(want).max()))
    assert err < tol, f"edited latent divergence {err} (tol {tol})"

    # controller-modified attention, step 0, first 16^2 down cross layer:
    # ours is store['down_cross'][2] (call order 1024,1024,256,256 per
    # step); the reference capture is the post-edit cond half (2h,256,77).
    if "edit/attn_down16_step0" in pack:
        maps = [
            np.asarray(m, np.float32) for m in store.get("down_cross", [])
            if m.shape[2] == 256
        ]
        got = maps[0]  # (2, H, 256, 77)
        want_map = pack["edit/attn_down16_step0"].reshape(
            2, -1, 256, want_shape_sk(pack)
        )
        assert got.shape == want_map.shape, (got.shape, want_map.shape)
        err = np.abs(got - want_map).max()
        assert err < 5e-3, f"controller attention divergence {err}"


def want_shape_sk(pack):
    return pack["edit/attn_down16_step0"].shape[-1]
