"""InceptionV3 (FID variant) in Flax — NHWC, bf16-friendly, jit-able.

Capability twin of the reference's vendored pytorch-fid InceptionV3
(`utils/inception.py`, `training/src/inception.py` — identical copies,
SURVEY.md C13). The FID network is torchvision's inception_v3 with three
changes (mirrored here, matching pytorch-fid's FIDInceptionA/C/E classes):
  * all average pools exclude padding from the divisor
    (count_include_pad=False),
  * Mixed_7c (E_2) uses max-pool in its pool branch,
  * the classifier head is dropped; the 2048-dim pool3 activations are the
    FID features.

Input contract (reference `fid_score_in_memory.py:100-105` + pytorch-fid
defaults): float images in [0, 1], NHWC; resized to 299x299 bilinear
(antialias off, matching torch's default interpolate) and normalised to
[-1, 1] inside the model.

Weights load from the published `pt_inception-2015-12-05` torch state dict
via `metrics.convert.convert_inception_weights` when available; random
init otherwise (architecture tests only — FID numbers need real weights).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBN(nn.Module):
    """conv -> batchnorm(eps=1e-3, no affine scale=False? torchvision uses
    affine BN) -> relu. Inference-only: BN runs in stats-folding mode using
    stored moving statistics."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides,
            padding=self.padding, use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, momentum=0.9,
            dtype=jnp.float32, name="bn",
        )(x)
        return nn.relu(x)


def _avg_pool_nopad(x, window: int = 3):
    """3x3 stride-1 average pool with count_include_pad=False semantics."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return summed / counts


def _max_pool(x, window=3, stride=2):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1),
        "VALID",
    )


class InceptionA(nn.Module):
    pool_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), dtype=self.dtype, name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=((2, 2), (2, 2)), dtype=self.dtype,
                    name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="branch3x3dbl_3")(b3)
        bp = _avg_pool_nopad(x)
        bp = ConvBN(self.pool_features, (1, 1), dtype=self.dtype,
                    name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), strides=(2, 2), dtype=self.dtype,
                    name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), strides=(2, 2), dtype=self.dtype,
                    name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b1 = ConvBN(192, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b7 = ConvBN(c7, (1, 1), dtype=self.dtype, name="branch7x7_1")(x)
        b7 = ConvBN(c7, (1, 7), padding=p17, dtype=self.dtype, name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=p71, dtype=self.dtype, name="branch7x7_3")(b7)
        bd = ConvBN(c7, (1, 1), dtype=self.dtype, name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, (7, 1), padding=p71, dtype=self.dtype, name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, (1, 7), padding=p17, dtype=self.dtype, name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, (7, 1), padding=p71, dtype=self.dtype, name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), padding=p17, dtype=self.dtype, name="branch7x7dbl_5")(bd)
        bp = _avg_pool_nopad(x)
        bp = ConvBN(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b3 = ConvBN(192, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), strides=(2, 2), dtype=self.dtype,
                    name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), dtype=self.dtype, name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), padding=p17, dtype=self.dtype, name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=p71, dtype=self.dtype, name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), strides=(2, 2), dtype=self.dtype,
                    name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    use_max_pool: bool = False  # Mixed_7c (E_2) uses max pool (pytorch-fid)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p01 = ((0, 0), (1, 1))
        p10 = ((1, 1), (0, 0))
        b1 = ConvBN(320, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = jnp.concatenate(
            [
                ConvBN(384, (1, 3), padding=p01, dtype=self.dtype,
                       name="branch3x3_2a")(b3),
                ConvBN(384, (3, 1), padding=p10, dtype=self.dtype,
                       name="branch3x3_2b")(b3),
            ],
            axis=-1,
        )
        bd = ConvBN(448, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate(
            [
                ConvBN(384, (1, 3), padding=p01, dtype=self.dtype,
                       name="branch3x3dbl_3a")(bd),
                ConvBN(384, (3, 1), padding=p10, dtype=self.dtype,
                       name="branch3x3dbl_3b")(bd),
            ],
            axis=-1,
        )
        if self.use_max_pool:
            bp = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1),
                [(0, 0), (1, 1), (1, 1), (0, 0)],
            )
        else:
            bp = _avg_pool_nopad(x)
        bp = ConvBN(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """The FID feature extractor: images [0,1] NHWC -> (B, 2048) pool3."""

    dtype: jnp.dtype = jnp.float32
    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x):
        if self.resize_input:
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear"
            )
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = x.astype(self.dtype)

        x = ConvBN(32, (3, 3), strides=(2, 2), dtype=self.dtype, name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), dtype=self.dtype, name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
                   name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = ConvBN(80, (1, 1), dtype=self.dtype, name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), dtype=self.dtype, name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, dtype=self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5d")(x)
        x = InceptionB(dtype=self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=self.dtype, name="Mixed_6e")(x)
        x = InceptionD(dtype=self.dtype, name="Mixed_7a")(x)
        x = InceptionE(dtype=self.dtype, name="Mixed_7b")(x)
        x = InceptionE(use_max_pool=True, dtype=self.dtype, name="Mixed_7c")(x)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (B, 2048)
        return x.astype(jnp.float32)
