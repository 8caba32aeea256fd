"""Numeric differential tests for controller math vs the reference
semantics, hand-computed in numpy (reference `utils/p2p.py` formulas).

These catch transpose/axis bugs that shape tests cannot: each case builds
tiny attention tensors, applies our `edit_attention` / `local_blend`, and
compares against a direct numpy transcription of the reference equations.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from invertible_cd_tpu.edit.controllers import (
    ControllerArrays,
    ControllerSpec,
    edit_attention,
    get_time_words_attention_alpha,
    local_blend,
    make_controller,
)
from invertible_cd_tpu.models.attention import AttnMeta
from invertible_cd_tpu.utils.tokenizer import HashTokenizer

W = 77  # MAX_NUM_WORDS


def meta(is_cross, sq=4, sk=W):
    return AttnMeta(place="down", is_cross=is_cross, layer_index=0,
                    query_len=sq, key_len=sk, heads=2)


def make_arrays(spec, **kw):
    z = jnp.zeros((0,), jnp.float32)
    defaults = dict(
        cross_replace_alpha=jnp.ones((spec.num_steps + 1, spec.batch_size - 1, 1, 1, W)),
        mapper_matrix=z, mapper_idx=z, refine_alphas=z,
        equalizer=z, alpha_layers=z, substruct_layers=z,
    )
    defaults.update(kw)
    return ControllerArrays(**defaults)


class TestReplaceMath:
    def test_einsum_matches_reference_formula(self):
        """reference: torch.einsum('hpw,bwn->bhpn', attn_base, mapper)
        (p2p.py:226) then alpha-mix into attn_replace (p2p.py:205-207)."""
        rng = np.random.default_rng(0)
        h, sq = 2, 3
        probs = rng.uniform(size=(2, h, sq, W)).astype(np.float32)  # [base, edit]
        mapper = rng.uniform(size=(1, W, W)).astype(np.float32)
        alpha = rng.uniform(size=(1, 1, 1, W)).astype(np.float32)

        spec = ControllerSpec(kind="replace", batch_size=2, num_steps=4)
        arrays = make_arrays(
            spec,
            mapper_matrix=jnp.asarray(mapper),
            cross_replace_alpha=jnp.asarray(
                np.broadcast_to(alpha, (5, 1, 1, 1, W)).copy()
            ),
        )
        out = np.asarray(
            edit_attention(spec, arrays, jnp.asarray(probs), meta(True, sq), 0)
        )

        base, repl = probs[0], probs[1:]
        replaced = np.einsum("hpw,bwn->bhpn", base, mapper)
        expected = replaced * alpha + (1 - alpha) * repl
        np.testing.assert_allclose(out[1:], expected, atol=1e-4, rtol=1e-5)
        np.testing.assert_allclose(out[0], base, atol=1e-6)  # base untouched


class TestRefineMath:
    def test_gather_matches_reference_formula(self):
        """reference: attn_base[:, :, mapper].permute(2, 0, 1, 3) then
        alphas-mix (p2p.py:237-241)."""
        rng = np.random.default_rng(1)
        h, sq = 2, 3
        probs = rng.uniform(size=(2, h, sq, W)).astype(np.float32)
        mapper = rng.integers(0, W, size=(1, W)).astype(np.int32)
        alphas = rng.uniform(size=(1, W)).astype(np.float32)

        spec = ControllerSpec(kind="refine", batch_size=2, num_steps=4)
        arrays = make_arrays(
            spec,
            mapper_idx=jnp.asarray(mapper),
            refine_alphas=jnp.asarray(alphas.reshape(1, 1, 1, W)),
        )
        out = np.asarray(
            edit_attention(spec, arrays, jnp.asarray(probs), meta(True, sq), 0)
        )

        base, repl = probs[0], probs[1:]
        gathered = base[:, :, mapper]  # (h, sq, 1, W)
        gathered = np.transpose(gathered, (2, 0, 1, 3))  # (1, h, sq, W)
        a = alphas.reshape(1, 1, 1, W)
        expected = gathered * a + repl * (1 - a)
        # cross_replace_alpha is all ones -> expected passes through fully
        np.testing.assert_allclose(out[1:], expected, atol=1e-6)


class TestReweightMath:
    def test_equalizer_scaling(self):
        """reference: attn_base[None] * equalizer[:, None, None, :]
        (p2p.py:253-256) chained after replace."""
        rng = np.random.default_rng(2)
        h, sq = 2, 3
        probs = rng.uniform(size=(2, h, sq, W)).astype(np.float32)
        eye = np.eye(W, dtype=np.float32)[None]
        eq = np.ones((1, W), np.float32)
        eq[0, 5] = 3.0

        spec = ControllerSpec(kind="replace", reweight=True, batch_size=2, num_steps=4)
        arrays = make_arrays(
            spec, mapper_matrix=jnp.asarray(eye), equalizer=jnp.asarray(eq)
        )
        out = np.asarray(
            edit_attention(spec, arrays, jnp.asarray(probs), meta(True, sq), 0)
        )
        expected = probs[0] * eq.reshape(1, 1, 1, W)
        np.testing.assert_allclose(out[1:], expected[None][0:1] if expected.ndim == 3 else expected, atol=1e-6)


class TestSelfReplace:
    def test_self_attention_window(self):
        rng = np.random.default_rng(3)
        probs = rng.uniform(size=(2, 2, 4, 4)).astype(np.float32)
        spec = ControllerSpec(
            kind="replace", batch_size=2, num_steps=4, self_replace_range=(0, 2)
        )
        arrays = make_arrays(spec, mapper_matrix=jnp.asarray(np.eye(W)[None]))
        m = meta(False, 4, 4)
        # inside the window: edited rows get the base map
        out = np.asarray(edit_attention(spec, arrays, jnp.asarray(probs), m, 1))
        np.testing.assert_allclose(out[1], probs[0], atol=1e-6)
        # outside: untouched
        out2 = np.asarray(edit_attention(spec, arrays, jnp.asarray(probs), m, 2))
        np.testing.assert_allclose(out2, probs, atol=1e-6)

    def test_large_maps_never_replaced(self):
        rng = np.random.default_rng(4)
        sq = 33 * 33  # > 32^2
        probs = rng.uniform(size=(2, 1, sq, sq)).astype(np.float32)
        spec = ControllerSpec(
            kind="replace", batch_size=2, num_steps=4, self_replace_range=(0, 4)
        )
        arrays = make_arrays(spec, mapper_matrix=jnp.asarray(np.eye(W)[None]))
        out = np.asarray(
            edit_attention(spec, arrays, jnp.asarray(probs), meta(False, sq, sq), 0)
        )
        np.testing.assert_allclose(out, probs, atol=1e-6)


class TestCrossReplaceAlpha:
    def test_window_semantics(self):
        """reference update_alpha_time_word (p2p.py:423-433): 1 inside
        [start, end) step fractions, 0 outside."""
        tok = HashTokenizer()
        alpha = get_time_words_attention_alpha(
            ["a cat", "a dog"], num_steps=4, cross_replace_steps=0.5, tokenizer=tok
        )
        assert alpha.shape == (5, 1, 1, 1, W)
        np.testing.assert_array_equal(alpha[0].ravel()[:5], [1, 1, 1, 1, 1])
        np.testing.assert_array_equal(alpha[2].ravel()[:5], [0, 0, 0, 0, 0])

    def test_per_word_override(self):
        tok = HashTokenizer()
        alpha = get_time_words_attention_alpha(
            ["a cat", "a dog"], num_steps=4,
            cross_replace_steps={"default_": 1.0, "dog": 0.25}, tokenizer=tok,
        )
        # token index of "dog" in "a dog" is 2 (bos, a, dog)
        col = alpha[:, 0, 0, 0, 2]
        np.testing.assert_array_equal(col, [1, 0, 0, 0, 0])
        other = alpha[:, 0, 0, 0, 1]
        np.testing.assert_array_equal(other, [1, 1, 1, 1, 1])


class TestLocalBlendMath:
    def test_mask_follows_attended_region(self):
        """A synthetic 16x16 cross map attending word 1 strongly in the
        top-left quadrant must keep base pixels elsewhere."""
        b, h = 2, 2
        maps = np.zeros((b, h, 256, W), np.float32)
        grid = np.zeros((16, 16), np.float32)
        grid[:8, :8] = 1.0
        maps[:, :, :, 1] = grid.reshape(-1)
        word_mask = np.zeros((b, 1, 1, 1, 1, W), np.float32)
        word_mask[:, ..., 1] = 1.0

        spec = ControllerSpec(
            kind="replace", batch_size=b, num_steps=4, local_blend=True,
            start_blend=0, blend_th=(0.3, 0.3),
        )
        arrays = make_arrays(spec, alpha_layers=jnp.asarray(word_mask))
        x_base = np.zeros((b, 16, 16, 4), np.float32)
        x = x_base.copy()
        x[1] = 1.0  # edited latent differs everywhere
        out = np.asarray(
            local_blend(spec, arrays, jnp.asarray(x), [jnp.asarray(maps)], step=1)
        )
        # inside the attended quadrant (+1px maxpool halo): edit kept
        assert out[1, 4, 4, 0] == 1.0
        # far outside: reverted to base row
        assert out[1, 15, 15, 0] == 0.0
