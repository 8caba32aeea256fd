"""Vision transformers for the metric suite (CLIP ViT-L/14, DINOv2 ViT-B/14).

The reference scores images with transformers' `CLIPModel` vision tower
(`utils/metrics.py:211-280`) and torch-hub DINOv2 (`metrics.py:176-207`).
One configurable Flax ViT covers both:
  * CLIP vision: class token, pre-LN blocks, quick-gelu, post-LN on the
    class token, linear projection to the shared space;
  * DINOv2: patch 14, gelu, LayerScale residual scaling, no projection —
    the CLS feature of the final norm is the embedding.

Weights load from the published torch checkpoints via
`convert.convert_vit_weights`-style mapping; architecture tests run with
random weights.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    hidden_act: str = "quick_gelu"  # "gelu" for DINOv2
    projection_dim: Optional[int] = 768  # None for DINOv2
    layer_scale_init: Optional[float] = None  # 1e-5 for DINOv2
    pre_ln: bool = True  # CLIP has an embedding pre-LN; DINOv2 doesn't
    norm_eps: float = 1e-5  # CLIP; timm-style ViTs (DINOv2, BLIP) use 1e-6

    @staticmethod
    def clip_vit_l14() -> "ViTConfig":
        return ViTConfig()

    @staticmethod
    def dinov2_vit_b14() -> "ViTConfig":
        return ViTConfig(
            patch_size=14, hidden_size=768, num_layers=12, num_heads=12,
            intermediate_size=3072, hidden_act="gelu", projection_dim=None,
            layer_scale_init=1e-5, pre_ln=False, norm_eps=1e-6,
        )

    @staticmethod
    def blip_vit_l16() -> "ViTConfig":
        """BLIP ViT-L/16 image encoder (ImageReward-v1.0 backbone,
        reference `utils/metrics.py:283-293` via the image_reward pkg)."""
        return ViTConfig(
            image_size=224, patch_size=16, hidden_size=1024, num_layers=24,
            num_heads=16, intermediate_size=4096, hidden_act="gelu",
            projection_dim=None, pre_ln=False, norm_eps=1e-6,
        )

    @staticmethod
    def tiny() -> "ViTConfig":
        return ViTConfig(
            image_size=28, patch_size=14, hidden_size=32, num_layers=2,
            num_heads=2, intermediate_size=64, projection_dim=16,
        )


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return lambda x: nn.gelu(x, approximate=False)


class ViTBlock(nn.Module):
    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        b, s, _ = x.shape

        h = nn.LayerNorm(epsilon=c.norm_eps, dtype=self.dtype, name="norm1")(x)
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="v_proj")(h)
        q = q.reshape(b, s, c.num_heads, head_dim)
        k = k.reshape(b, s, c.num_heads, head_dim)
        v = v.reshape(b, s, c.num_heads, head_dim)
        attn = jax.nn.dot_product_attention(q, k, v).reshape(b, s, c.hidden_size)
        attn = nn.Dense(c.hidden_size, dtype=self.dtype, name="out_proj")(attn)
        if c.layer_scale_init is not None:
            gamma1 = self.param(
                "ls1", nn.initializers.constant(c.layer_scale_init),
                (c.hidden_size,),
            )
            attn = attn * gamma1
        x = x + attn

        h = nn.LayerNorm(epsilon=c.norm_eps, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(c.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _act(c.hidden_act)(h)
        h = nn.Dense(c.hidden_size, dtype=self.dtype, name="fc2")(h)
        if c.layer_scale_init is not None:
            gamma2 = self.param(
                "ls2", nn.initializers.constant(c.layer_scale_init),
                (c.hidden_size,),
            )
            h = h * gamma2
        return x + h


class ViTEncoder(nn.Module):
    """images (B, H, W, 3), already normalised -> (B, D) embedding."""

    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        c = self.cfg
        b = images.shape[0]
        x = nn.Conv(
            c.hidden_size, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), padding="VALID",
            use_bias=not c.pre_ln,  # CLIP's patch embed has no bias
            dtype=self.dtype, name="patch_embed",
        )(images.astype(self.dtype))
        x = x.reshape(b, -1, c.hidden_size)

        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.hidden_size,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, c.hidden_size)).astype(self.dtype), x],
            axis=1,
        )
        n_pos = (c.image_size // c.patch_size) ** 2 + 1
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (n_pos, c.hidden_size),
        )
        x = x + pos[None, : x.shape[1]].astype(self.dtype)

        if c.pre_ln:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="pre_layernorm")(x)
        for i in range(c.num_layers):
            x = ViTBlock(c, dtype=self.dtype, name=f"blocks_{i}")(x)
        x = nn.LayerNorm(epsilon=c.norm_eps, dtype=self.dtype, name="post_layernorm")(x)

        feat = x[:, 0]  # CLS token
        if c.projection_dim is not None:
            feat = nn.Dense(
                c.projection_dim, use_bias=False, dtype=self.dtype,
                name="projection",
            )(feat)
        return feat.astype(jnp.float32)


CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def preprocess_for(images: jax.Array, size: int, mean, std) -> jax.Array:
    """float [0,1] NHWC any size -> normalised (B, size, size, 3)
    (bicubic resize, the torchvision/transformers preprocessing the
    reference relies on)."""
    x = jax.image.resize(
        images, (images.shape[0], size, size, images.shape[3]), method="cubic"
    )
    mean = jnp.asarray(mean)[None, None, None, :]
    std = jnp.asarray(std)[None, None, None, :]
    return (x - mean) / std
