"""Tokenizer + prompt alignment unit tests (host-side, no models)."""
import numpy as np
import pytest

from invertible_cd_tpu.edit.aligner import (
    get_refinement_mapper,
    get_replacement_mapper,
    get_word_inds,
    needleman_wunsch,
    word_token_spans,
)
from invertible_cd_tpu.utils.tokenizer import ClipTokenizer, HashTokenizer


def make_mini_clip_tokenizer():
    """A miniature BPE vocab exercising the real ClipTokenizer code path."""
    chars = list("abcdefghijklmnopqrstuvwxyz ")
    vocab = {}
    for c in "abcdefghijklmnopqrstuvwxyz":
        vocab[c] = len(vocab)
        vocab[c + "</w>"] = len(vocab)
    merges = [("c", "a"), ("t</w>", ""), ("ca", "t</w>")]
    merges = [("c", "a"), ("ca", "t</w>")]
    for m in merges:
        vocab["".join(m)] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    return ClipTokenizer(vocab, merges)


class TestClipTokenizer:
    def test_bpe_merges(self):
        tok = make_mini_clip_tokenizer()
        ids = tok.tokenize("cat")
        assert ids == [tok.encoder["cat</w>"]]

    def test_padded_encoding(self):
        tok = make_mini_clip_tokenizer()
        out = tok("cat ab")
        assert out.shape == (1, 77)
        assert out[0, 0] == tok.bos_token_id
        # cat -> 1 token; "ab" -> a, b</w> -> 2 tokens; eos at position 4
        assert out[0, 4] == tok.eos_token_id
        assert (out[0, 5:] == tok.pad_token_id).all()

    def test_decode_roundtrip(self):
        tok = make_mini_clip_tokenizer()
        out = tok("cat hat")
        assert tok.decode(out[0]) == "cat hat"


class TestHashTokenizer:
    def test_deterministic(self):
        tok = HashTokenizer()
        a, b = tok("a photo of a cat"), tok("a photo of a cat")
        np.testing.assert_array_equal(a, b)
        assert a.shape == (1, 77)

    def test_same_word_same_id(self):
        tok = HashTokenizer()
        out = tok("cat dog cat")[0]
        assert out[1] == out[3] and out[1] != out[2]


class TestNeedlemanWunsch:
    def test_identical(self):
        pairs = needleman_wunsch([1, 2, 3], [1, 2, 3])
        assert pairs == [(0, 0), (1, 1), (2, 2)]

    def test_insertion_marked(self):
        # y has an extra token 9 somewhere: it must map to -1
        pairs = needleman_wunsch([1, 2, 3], [1, 9, 2, 3])
        assert (1, -1) in pairs
        assert (0, 0) in pairs and (2, 1) in pairs and (3, 2) in pairs

    def test_substitution(self):
        # With gap=0/match=1/mismatch=-1 (the reference's ScoreParams,
        # `seq_aligner.py:97`) a substitution scores worse than
        # delete+insert, so the substituted target token maps to -1
        # (alpha 0 -> it keeps the edited prompt's own attention).
        pairs = needleman_wunsch([1, 2, 3], [1, 7, 3])
        assert (1, -1) in pairs
        assert (0, 0) in pairs and (2, 2) in pairs


class TestMappers:
    def setup_method(self):
        self.tok = HashTokenizer()

    def test_refinement_identity(self):
        mapper, alphas = get_refinement_mapper(["a cat", "a cat"], self.tok)
        assert mapper.shape == (1, 77) and alphas.shape == (1, 77)
        # identical prompts: mapper is identity on the occupied prefix
        np.testing.assert_array_equal(mapper[0, :4], np.arange(4))
        assert alphas[0, :4].all()

    def test_refinement_insertion_alpha_zero(self):
        mapper, alphas = get_refinement_mapper(["a cat", "a red cat"], self.tok)
        # token "red" at position 2 (bos, a, red, cat) is new -> alpha 0
        assert alphas[0, 2] == 0.0
        assert alphas[0, 1] == 1.0 and alphas[0, 3] == 1.0

    def test_replacement_mapper_permutes(self):
        m = get_replacement_mapper(["a cat", "a dog"], self.tok)
        assert m.shape == (1, 77, 77)
        # each source position maps somewhere with weight 1 (equal lengths)
        np.testing.assert_allclose(m[0].sum(-1)[:5], 1.0)
        # unchanged word "a" at position 1 keeps the diagonal
        assert m[0, 1, 1] == 1.0

    def test_replacement_requires_equal_lengths(self):
        with pytest.raises(ValueError):
            get_replacement_mapper(["a cat", "a big dog"], self.tok)

    def test_word_inds(self):
        inds = get_word_inds("a photo of a cat", "cat", self.tok)
        np.testing.assert_array_equal(inds, [5])
        inds = get_word_inds("a photo of a cat", 1, self.tok)
        np.testing.assert_array_equal(inds, [2])

    def test_word_token_spans(self):
        spans = word_token_spans("a photo", self.tok)
        assert spans == [(1, 2), (2, 3)]
