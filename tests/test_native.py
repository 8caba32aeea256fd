"""Native image-ops library: correctness vs PIL and batch API."""
import numpy as np
import pytest

from invertible_cd_tpu.utils import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built (native/build.sh)"
)


def _pil_ref(img, size):
    from PIL import Image

    pil = Image.fromarray(img)
    w, h = pil.size
    scale = size / min(w, h)
    pil = pil.resize(
        (max(size, round(w * scale)), max(size, round(h * scale))), Image.BICUBIC
    )
    w, h = pil.size
    left, top = (w - size) // 2, (h - size) // 2
    pil = pil.crop((left, top, left + size, top + size))
    return np.asarray(pil, np.float32) / 127.5 - 1.0


class TestNativeImageOps:
    def test_matches_pil_bicubic(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (75, 101, 3), np.uint8)
        out = native.resize_crop_normalize(img, 32)
        ref = _pil_ref(img, 32)
        assert out.shape == (32, 32, 3)
        # PIL uses fixed-point arithmetic; allow small per-pixel slack.
        diff = np.abs(out - ref)
        assert np.mean(diff) < 0.01, np.mean(diff)
        assert np.max(diff) < 0.1, np.max(diff)

    def test_identity_size(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (32, 32, 3), np.uint8)
        out = native.resize_crop_normalize(img, 32)
        ref = img.astype(np.float32) / 127.5 - 1.0
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_batch_matches_single(self):
        rng = np.random.default_rng(2)
        imgs = [
            rng.integers(0, 255, (50 + i, 64, 3), np.uint8) for i in range(5)
        ]
        batch = native.resize_crop_normalize_batch(imgs, 24, num_threads=3)
        assert batch.shape == (5, 24, 24, 3)
        for i, im in enumerate(imgs):
            single = native.resize_crop_normalize(im, 24)
            np.testing.assert_allclose(batch[i], single, atol=1e-6)

    def test_scale_offset(self):
        img = np.full((16, 16, 3), 255, np.uint8)
        out = native.resize_crop_normalize(img, 16, scale=1 / 255.0, offset=0.0)
        np.testing.assert_allclose(out, 1.0, atol=1e-5)
