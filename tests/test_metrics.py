"""Metric suite tests: pure math exactness + architecture smoke tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from invertible_cd_tpu.metrics import (
    FIDScorer,
    InceptionV3Features,
    batch_psnr,
    compute_statistics,
    frechet_distance,
    make_random_evaluators,
    psnr,
)


class TestFrechet:
    def test_identical_distributions_zero(self):
        rng = np.random.default_rng(0)
        f = rng.normal(size=(500, 16))
        mu, sigma = compute_statistics(f)
        assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6

    def test_mean_shift(self):
        rng = np.random.default_rng(0)
        f1 = rng.normal(size=(2000, 8))
        f2 = rng.normal(size=(2000, 8)) + 2.0
        mu1, s1 = compute_statistics(f1)
        mu2, s2 = compute_statistics(f2)
        d = frechet_distance(mu1, s1, mu2, s2)
        # ||mu_diff||^2 = 8 * 4 = 32 dominates
        assert 28 < d < 36

    def test_against_scipy_sqrtm_formula(self):
        # cross-check the eigh-based trace-sqrt against a direct PSD sqrtm
        rng = np.random.default_rng(1)
        a = rng.normal(size=(50, 5))
        b = rng.normal(size=(60, 5)) * 1.5 + 0.3
        mu1, s1 = compute_statistics(a)
        mu2, s2 = compute_statistics(b)
        d = frechet_distance(mu1, s1, mu2, s2, eps=0.0)

        def sqrtm_psd(m):
            vals, vecs = np.linalg.eigh(m)
            return (vecs * np.sqrt(np.clip(vals, 0, None))) @ vecs.T

        s1h = sqrtm_psd(s1)
        covmean = sqrtm_psd(s1h @ s2 @ s1h)
        ref = (mu1 - mu2) @ (mu1 - mu2) + np.trace(s1) + np.trace(s2) - 2 * np.trace(covmean)
        np.testing.assert_allclose(d, ref, rtol=1e-8)


class TestPSNR:
    def test_identical_infinite(self):
        a = np.zeros((4, 4, 3))
        assert psnr(a, a) == float("inf")

    def test_known_value(self):
        a = np.zeros((10, 10))
        b = np.full((10, 10), 16.0)
        # mse=256 -> psnr = 20log10(255) - 10log10(256) = 24.0484
        assert abs(psnr(a, b) - 24.0484) < 1e-3

    def test_batch(self):
        a = np.zeros((2, 4, 4, 3))
        b = np.stack([np.full((4, 4, 3), 16.0), np.full((4, 4, 3), 32.0)])
        p = batch_psnr(a, b)
        assert p[0] > p[1]


class TestInception:
    def test_feature_shape(self):
        mod = InceptionV3Features(resize_input=False)
        params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3)))
        feats = mod.apply(params, jnp.zeros((2, 299, 299, 3)))
        assert feats.shape == (2, 2048)
        assert np.isfinite(np.asarray(feats)).all()


class TestFIDScorer:
    @pytest.fixture(scope="class")
    def scorer(self):
        return FIDScorer.random_init()

    def test_same_images_zero_fid(self, scorer):
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 255, (64, 64, 3), np.uint8) for _ in range(8)]
        d = scorer.fid(imgs, reference_images=imgs)
        assert abs(d) < 1e-3

    def test_stats_roundtrip(self, scorer, tmp_path):
        rng = np.random.default_rng(1)
        imgs = [rng.integers(0, 255, (64, 64, 3), np.uint8) for _ in range(6)]
        p = str(tmp_path / "stats.npz")
        scorer.save_statistics(imgs, p)
        d = scorer.fid(imgs, reference_stats_path=p)
        assert abs(d) < 1e-3


class TestEvaluators:
    @pytest.fixture(scope="class")
    def ev(self):
        return make_random_evaluators()

    def test_calc_all_keys(self, ev):
        rng = np.random.default_rng(0)
        a = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
        b = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
        out = ev.calc_all(a, b, ["a cat", "x"], ["a dog", "y"])
        assert set(out) == {
            "preservation_clip_image_image", "preservation_dinov2",
            "editing_clip_image_text", "editing_image_reward",
        }
        assert out["editing_image_reward"] is None  # gated
        assert -1.0 <= out["preservation_clip_image_image"] <= 1.0

    def test_identical_images_similarity_one(self, ev):
        rng = np.random.default_rng(1)
        a = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
        assert abs(ev.clip_image_image(a, a) - 1.0) < 1e-4
        assert abs(ev.dino_image_image(a, a) - 1.0) < 1e-4

    def test_calc_inversion(self, ev):
        rng = np.random.default_rng(2)
        a = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
        out = ev.calc_inversion(a, a)
        # batch_psnr clamps mse at 1e-12, so identical images give a large
        # finite value rather than inf
        assert out["psnr"] > 100
        assert abs(out["lpips"]) < 1e-5


class TestImageReward:
    def test_architecture_runs(self):
        import dataclasses as dc

        import jax.numpy as jnp

        from invertible_cd_tpu.metrics.image_reward import (
            BertConfig, ImageReward, make_image_reward_fn,
        )
        from invertible_cd_tpu.metrics.vit import ViTConfig
        from invertible_cd_tpu.utils.tokenizer import HashTokenizer

        vcfg = dc.replace(ViTConfig.tiny(), projection_dim=None)
        bcfg = BertConfig.tiny(encoder_width=vcfg.hidden_size)
        model = ImageReward(vcfg, bcfg)
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.uniform(size=(2, 28, 28, 3)), jnp.float32)
        ids = jnp.asarray(rng.integers(0, 999, (2, 77)), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), imgs, ids)
        scores = model.apply(params, imgs, ids)
        assert scores.shape == (2,)
        assert np.isfinite(np.asarray(scores)).all()

        # through the Evaluators adapter
        tok = HashTokenizer(vocab_size=1000)
        fn = make_image_reward_fn(model, params, tok)
        out = fn(np.asarray(imgs), ["a cat", "a dog"])
        assert out.shape == (2,)


class TestImageRewardTextMask:
    def test_mask_from_sep_position(self):
        """The valid span is defined by the last [SEP], not the pad value:
        BERT's pad id is 0, which reduced vocabs can collide with."""
        from invertible_cd_tpu.metrics.image_reward import _text_mask_from_ids

        class Tok:
            sep_id = 3
            pad_id = 0

        ids = np.array([
            [2, 9, 0, 3, 0, 0],   # real token id 0 inside the span
            [2, 3, 0, 0, 0, 0],
            [2, 9, 9, 9, 9, 9],   # no SEP (truncated): everything valid
        ])
        m = _text_mask_from_ids(ids, Tok())
        assert m.tolist() == [
            [True, True, True, True, False, False],
            [True, True, False, False, False, False],
            [True] * 6,
        ]

    def test_pad_fallback_without_sep(self):
        from invertible_cd_tpu.metrics.image_reward import _text_mask_from_ids

        class Tok:
            pad_token_id = 7

        ids = np.array([[1, 2, 7, 7], [7, 2, 3, 4]])
        m = _text_mask_from_ids(ids, Tok())
        assert m.tolist() == [
            [True, True, False, False],
            [True, True, True, True],  # position 0 always valid
        ]

    def test_masked_scores_ignore_pad(self):
        """Scores must not change when garbage lands in [PAD] positions —
        the reference passes the tokenizer attention_mask (ADVICE r2)."""
        import dataclasses as dc

        import jax
        import jax.numpy as jnp

        from invertible_cd_tpu.metrics.image_reward import (
            BertConfig, ImageReward,
        )
        from invertible_cd_tpu.metrics.vit import ViTConfig

        vcfg = dc.replace(ViTConfig.tiny(), projection_dim=None)
        bcfg = BertConfig.tiny(encoder_width=vcfg.hidden_size)
        model = ImageReward(vcfg, bcfg)
        rng = np.random.default_rng(1)
        imgs = jnp.asarray(rng.uniform(size=(1, 28, 28, 3)), jnp.float32)
        ids = np.full((1, 12), 0, np.int32)
        ids[0, :4] = [2, 50, 60, 3]
        mask = jnp.asarray(np.arange(12)[None, :] < 4)
        params = model.init(jax.random.PRNGKey(0), imgs, jnp.asarray(ids))
        a = model.apply(params, imgs, jnp.asarray(ids), mask)
        ids2 = ids.copy()
        ids2[0, 6:] = 123  # garbage in masked positions
        b = model.apply(params, imgs, jnp.asarray(ids2), mask)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
        # and without the mask the garbage DOES leak (the r2 bug)
        c = model.apply(params, imgs, jnp.asarray(ids))
        d = model.apply(params, imgs, jnp.asarray(ids2))
        assert abs(float(c[0]) - float(d[0])) > 1e-8


class TestImageGrid:
    """utils/images.py — reference to_pil_images/view_images twins
    (`utils/generation.py:569-626`)."""

    def test_grid_shape_and_gutters(self):
        from invertible_cd_tpu.utils import image_grid

        imgs = [np.full((10, 20, 3), i * 10, np.uint8) for i in range(6)]
        grid = image_grid(imgs, num_rows=2, offset_ratio=0.1)
        # offset = int(10 * 0.1) = 1; 2 rows x 3 cols
        assert grid.shape == (10 * 2 + 1, 20 * 3 + 2, 3)
        assert (grid[:10, :20] == imgs[0]).all()
        assert (grid[11:, 42:] == imgs[5]).all()
        assert (grid[10, :] == 255).all()  # white gutter row

    def test_ragged_row_pads_white_and_floats_rescale(self):
        from invertible_cd_tpu.utils import image_grid

        imgs = np.stack([np.full((4, 4, 3), 0.5, np.float32)] * 3)
        grid = image_grid(imgs, num_rows=2, offset_ratio=0.0)
        assert grid.shape == (8, 8, 3)
        assert (grid[:4, :4] == 127).all()  # 0.5 -> 127 uint8
        assert (grid[4:, 4:] == 255).all()  # padded 4th tile is white

    def test_single_image_and_pil(self):
        from invertible_cd_tpu.utils import to_pil_images, view_images

        img = np.zeros((8, 8, 3), np.uint8)
        assert to_pil_images(img).size == (8, 8)
        import os
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".png") as f:
            view_images([img, img], num_rows=1, save_path=f.name)
            assert os.path.getsize(f.name) > 0
