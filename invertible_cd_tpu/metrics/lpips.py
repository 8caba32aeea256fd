"""LPIPS perceptual distance (VGG16 backbone) in Flax.

The reference computes LPIPS through `piq.LPIPS()` at 224x224
(`utils/metrics.py:310-324`). This is the standard Zhang et al. LPIPS:
VGG16 relu1_2/relu2_2/relu3_3/relu4_3/relu5_3 activations, unit-normalised
per channel, squared differences reduced by learned 1x1 linear heads,
averaged over space and layers.

Weights (torchvision VGG16 + LPIPS linear heads) load via
`models.convert.convert_torch_tree`; with random weights the class is
architecture-exercise only.
"""
from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

VGG16_CFG: Tuple[Tuple[int, int], ...] = (
    # (num convs, channels) per stage; maxpool between stages
    (2, 64), (2, 128), (3, 256), (3, 512), (3, 512),
)

# ImageNet normalisation in the [-1, 1] convention LPIPS uses.
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    """Returns the five post-ReLU stage outputs."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> List[jax.Array]:
        feats = []
        for stage, (n_convs, ch) in enumerate(VGG16_CFG):
            for i in range(n_convs):
                x = nn.Conv(
                    ch, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name=f"conv{stage}_{i}",
                )(x)
                x = nn.relu(x)
            feats.append(x)
            if stage < len(VGG16_CFG) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """lpips(a, b): images in [-1, 1] NHWC -> (B,) distances."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        shift = jnp.asarray(_SHIFT)[None, None, None, :]
        scale = jnp.asarray(_SCALE)[None, None, None, :]
        vgg = VGG16Features(dtype=self.dtype, name="vgg")
        fa = vgg((a - shift) / scale)
        fb = vgg((b - shift) / scale)
        total = jnp.zeros((a.shape[0],), jnp.float32)
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / (jnp.linalg.norm(xa, axis=-1, keepdims=True) + 1e-10)
            nb = xb / (jnp.linalg.norm(xb, axis=-1, keepdims=True) + 1e-10)
            diff = (na - nb) ** 2
            head = nn.Conv(
                1, (1, 1), use_bias=False, dtype=self.dtype, name=f"lin{i}"
            )(diff.astype(self.dtype))
            total = total + jnp.mean(head.astype(jnp.float32), axis=(1, 2, 3))
        return total
