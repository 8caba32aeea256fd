"""SDXL pipeline tests (tiny dual-encoder bundle, CPU)."""
import jax
import numpy as np
import pytest

from invertible_cd_tpu.testing import tiny_bundle_xl


@pytest.fixture(scope="module")
def pipe():
    return tiny_bundle_xl()


class TestSDXL:
    def test_encode_prompt_xl_shapes(self, pipe):
        ctx, pooled = pipe.encode_prompt_xl(["a cat"])
        assert ctx.shape == (1, 77, 64)  # 32 + 32 concat
        assert pooled.shape == (1, 16)

    def test_generate(self, pipe):
        imgs, lat = pipe.generate(["a cat"], key=jax.random.PRNGKey(1))
        assert imgs.shape == (1, 32, 32, 3)
        assert lat.shape == (1, 16, 16, 4)
        assert np.isfinite(np.asarray(imgs)).all()

    def test_added_cond_changes_output(self, pipe):
        """Pooled-text conditioning must reach the UNet."""
        imgs_a, _ = pipe.generate(["a cat"], key=jax.random.PRNGKey(2))
        # tamper with the pooled path: different prompt -> different pooled
        imgs_b, _ = pipe.generate(["a dog"], key=jax.random.PRNGKey(2))
        assert not np.array_equal(np.asarray(imgs_a), np.asarray(imgs_b))

    def test_invert(self, pipe):
        img = np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8)
        inv, clean = pipe.invert(img, "a cat")
        assert inv.shape == (1, 16, 16, 4)
        assert np.isfinite(np.asarray(inv)).all()

    def test_time_ids(self, pipe):
        ids = pipe.add_time_ids(2)
        np.testing.assert_array_equal(
            np.asarray(ids), [[32, 32, 0, 0, 32, 32]] * 2
        )
