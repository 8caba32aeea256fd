"""Controller-stack differential test vs a literal torch transcription of
reference `utils/p2p.py` (tests/_torch_p2p_ref.py) — VERDICT r2 item 6.

Both sides are driven in lockstep through a simulated SD1.5 UNet layer
schedule for the full 4-step editing loop on identical random attention
tensors: every controller kind (replace / refine / +reweight / +blend
/ +substruct) must produce numerically equal edited attention at every
layer AND equal blended latents at every step boundary.
"""
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import _torch_p2p_ref as ref  # noqa: E402

from invertible_cd_tpu.edit.controllers import (  # noqa: E402
    ControllerRuntime,
    make_controller,
)
from invertible_cd_tpu.models.attention import AttnMeta  # noqa: E402
from invertible_cd_tpu.utils.tokenizer import HashTokenizer  # noqa: E402

W = 77
H = 2  # heads
NUM_STEPS = 4
PROMPTS = ["a photo of a corgi on the beach", "a photo of a cat on the beach"]
REFINE_PROMPTS = ["a photo of a corgi", "a photo of a small fluffy corgi"]

# (place, query_len, is_cross) per layer in call order — the SD1.5 UNet's
# <=32^2 attention inventory: down 32^2 x2 + 16^2 x2, mid 8^2, up 16^2 x3 +
# 32^2 x3 (so down_cross[2:4] + up_cross[:3] are exactly the 16^2 maps the
# reference LocalBlend consumes, p2p.py:33-35). Self layer precedes cross
# in each block (BasicTransformerBlock order).
SCHEDULE = []
for _place, _sqs in (
    ("down", [1024, 1024, 256, 256]),
    ("mid", [64]),
    ("up", [256, 256, 256, 1024, 1024, 1024]),
):
    for _sq in _sqs:
        SCHEDULE.append((_place, _sq, False))
        SCHEDULE.append((_place, _sq, True))


def _run_pair(kind, equalizer_params=None, blend_words=None,
              substruct_words=None, seed=0):
    tok = HashTokenizer()
    prompts = PROMPTS if kind == "replace" else REFINE_PROMPTS
    b = len(prompts)
    cross_replace = 0.8
    self_replace = 0.4

    spec, arrays = make_controller(
        prompts, tok, NUM_STEPS,
        is_replace_controller=(kind == "replace"),
        cross_replace_steps=cross_replace, self_replace_steps=self_replace,
        blend_words=blend_words, equalizer_params=equalizer_params,
        substruct_words=substruct_words,
        start_blend=0.0,
    )
    runtime = ControllerRuntime(spec, arrays)

    tcontroller = ref.make_controller(
        prompts, kind == "replace", cross_replace, self_replace, tok,
        NUM_STEPS,
        blend_words=blend_words, equilizer_params=equalizer_params,
        substruct_words=substruct_words,
    )
    tcontroller.num_att_layers = len(SCHEDULE)

    rng = np.random.default_rng(seed)
    lat_hw = 8
    for step in range(NUM_STEPS):
        hook = runtime.hook_factory(step)
        for li, (place, sq, is_cross) in enumerate(SCHEDULE):
            sk = W if is_cross else sq
            logits = rng.normal(size=(b, H, sq, sk)).astype(np.float32)
            probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)

            ours = np.asarray(hook(
                jnp.asarray(probs),
                AttnMeta(place=place, is_cross=is_cross, layer_index=li,
                         query_len=sq, key_len=sk, heads=H),
            ))

            # torch side: CFG-doubled flattened batch, uncond half first
            # (reference register_attention_control passes (2B*H, Sq, Sk)
            # and __call__ edits attn[h//2:], p2p.py:98-105)
            uncond = rng.normal(size=(b * H, sq, sk)).astype(np.float32)
            tattn = torch.cat(
                [torch.as_tensor(uncond),
                 torch.as_tensor(probs.reshape(b * H, sq, sk).copy())]
            )
            tout = tcontroller(tattn, is_cross, place)
            theirs = tout[b * H:].reshape(b, H, sq, sk).numpy()

            np.testing.assert_allclose(
                ours, theirs, atol=1e-6, rtol=1e-5,
                err_msg=f"step {step} layer {li} ({place},{sq},"
                        f"{'cross' if is_cross else 'self'})",
            )

        x = rng.normal(size=(b, lat_hw, lat_hw, 4)).astype(np.float32)
        ours_x = np.asarray(runtime.step_callback(jnp.asarray(x), step))
        theirs_x = (
            tcontroller.step_callback(
                torch.as_tensor(x.transpose(0, 3, 1, 2).copy())
            ).numpy().transpose(0, 2, 3, 1)
        )
        np.testing.assert_allclose(
            ours_x, theirs_x, atol=1e-5, rtol=1e-4,
            err_msg=f"step_callback at step {step}",
        )


def test_replace_matches_reference():
    _run_pair("replace")


def test_refine_matches_reference():
    _run_pair("refine")


def test_replace_reweight_matches_reference():
    _run_pair(
        "replace",
        equalizer_params={"words": ["cat"], "values": [3.0]},
        seed=1,
    )


def test_refine_reweight_matches_reference():
    _run_pair(
        "refine",
        equalizer_params={"words": ["fluffy"], "values": [0.2]},
        seed=2,
    )


def test_replace_local_blend_matches_reference():
    _run_pair(
        "replace",
        blend_words=[["corgi"], ["cat"]],
        seed=3,
    )


def test_replace_blend_substruct_matches_reference():
    _run_pair(
        "replace",
        blend_words=[["corgi"], ["cat"]],
        substruct_words=[["beach"], ["beach"]],
        seed=4,
    )
