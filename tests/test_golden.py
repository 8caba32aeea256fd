"""Seed-pinned golden regression tests (SURVEY.md §4: the rebuild's
substitute for the reference's visual golden samples).

The recorded arrays come from the tiny bundle on the CPU backend with
jax's threefry PRNG; regenerate with the snippet in tests/golden/README
if an intentional numeric change (or a jax upgrade) shifts them.
"""
import os

import jax
import numpy as np
import pytest

from invertible_cd_tpu.testing import tiny_bundle

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tiny_pipeline.npz")


@pytest.fixture(scope="module")
def golden():
    if not os.path.exists(GOLDEN):
        pytest.skip("golden file missing")
    return np.load(GOLDEN)


class TestGolden:
    def test_generation_pinned(self, golden, tiny_pipe):
        p = tiny_pipe
        imgs, lat = p.generate(["a photo of a cat"], key=jax.random.PRNGKey(150))
        np.testing.assert_allclose(
            np.asarray(imgs), golden["gen_images"], atol=1e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(lat), golden["gen_latents"], atol=1e-5, rtol=1e-4
        )

    def test_inversion_pinned(self, golden, tiny_pipe):
        p = tiny_pipe
        img2 = np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8)
        inv, _ = p.invert(img2, "a photo of a cat", key=jax.random.PRNGKey(1))
        np.testing.assert_allclose(
            np.asarray(inv), golden["inv_latents"], atol=1e-5, rtol=1e-4
        )
