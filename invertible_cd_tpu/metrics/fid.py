"""In-memory FID (reference C25, `training/src/fid_score_in_memory.py`).

`FIDScorer` extracts InceptionV3 pool3 features batched under jit and
compares against either a second image set or precomputed reference
statistics (`.npz` with mu/sigma — the format of the reference's
`fid_stats_mscoco256_val.npz`, `train_icd_sd15_lora.py:380-384`).

Preprocessing matches the reference: 256^2 LANCZOS resize + center crop
happens host-side per image (`fid_score_in_memory.py:100-105`); the
299^2 bilinear resize + [-1,1] scaling lives inside the Inception module.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .frechet import compute_statistics, frechet_distance
from .inception import InceptionV3Features


def _resize_crop_256(img: np.ndarray) -> np.ndarray:
    """uint8 HWC -> 256x256 uint8 (LANCZOS short-side resize + center crop)."""
    from PIL import Image

    pil = Image.fromarray(img)
    w, h = pil.size
    scale = 256 / min(w, h)
    pil = pil.resize(
        (max(256, round(w * scale)), max(256, round(h * scale))), Image.LANCZOS
    )
    w, h = pil.size
    left, top = (w - 256) // 2, (h - 256) // 2
    return np.asarray(pil.crop((left, top, left + 256, top + 256)))


class FIDScorer:
    def __init__(self, params, batch_size: int = 50, dtype=jnp.float32):
        self.module = InceptionV3Features(dtype=dtype)
        self.params = params
        self.batch_size = batch_size
        self._jit = jax.jit(lambda p, x: self.module.apply(p, x))

    @staticmethod
    def random_init(seed: int = 0, dtype=jnp.float32) -> "FIDScorer":
        """Architecture-only scorer (tests; FID numbers need real weights)."""
        mod = InceptionV3Features(dtype=dtype, resize_input=False)
        params = mod.init(jax.random.PRNGKey(seed), jnp.zeros((1, 299, 299, 3)))
        s = FIDScorer(params, dtype=dtype)
        s.module = mod
        s._jit = jax.jit(lambda p, x: mod.apply(p, x))
        return s

    def features(self, images: Sequence[np.ndarray]) -> np.ndarray:
        """uint8 images (any size) -> (N, 2048) pool3 features."""
        prepped = np.stack([_resize_crop_256(np.asarray(im)) for im in images])
        prepped = prepped.astype(np.float32) / 255.0
        if not self.module.resize_input:  # random_init test path
            prepped = np.asarray(
                jax.image.resize(
                    jnp.asarray(prepped),
                    (prepped.shape[0], 299, 299, 3), "bilinear",
                )
            )
            prepped = prepped * 2 - 1
        out = []
        bs = self.batch_size
        for i in range(0, len(prepped), bs):
            chunk = prepped[i : i + bs]
            pad = 0
            if len(chunk) < bs and len(prepped) > bs:
                pad = bs - len(chunk)
                chunk = np.concatenate([chunk, chunk[:pad][::-1] * 0 + chunk[-1:]])
            f = np.asarray(self._jit(self.params, jnp.asarray(chunk)))
            out.append(f[: len(f) - pad] if pad else f)
        return np.concatenate(out, axis=0)

    def statistics(self, images: Sequence[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
        return compute_statistics(self.features(images))

    def fid(
        self,
        images: Sequence[np.ndarray],
        reference_images: Optional[Sequence[np.ndarray]] = None,
        reference_stats_path: Optional[str] = None,
    ) -> float:
        """FID of `images` against reference images or a stats npz
        (reference `calculate_fid`, `fid_score_in_memory.py:243-270`)."""
        mu1, s1 = self.statistics(images)
        if reference_stats_path is not None:
            with np.load(reference_stats_path) as f:
                mu2, s2 = f["mu"], f["sigma"]
        else:
            assert reference_images is not None
            mu2, s2 = self.statistics(reference_images)
        return frechet_distance(mu1, s1, mu2, s2)

    def save_statistics(self, images: Sequence[np.ndarray], path: str) -> None:
        mu, sigma = self.statistics(images)
        np.savez(path, mu=mu, sigma=sigma)
