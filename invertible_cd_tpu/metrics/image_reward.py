"""ImageReward scorer architecture (BLIP backbone + reward MLP) in Flax.

Capability twin of the reference's `calc_ir` (reference
`utils/metrics.py:283-293`), which loads `ImageReward-v1.0` via the
`image_reward` package. The model is:
  * BLIP ViT-L/16 image encoder (pre-LN ViT, 224x224, patch 16, 1024-d),
  * BLIP text encoder = BERT-base (12 layers, 768-d) in multimodal mode —
    every layer runs self-attention THEN cross-attention over the image
    patch embeddings,
  * reward head: MLP 768 -> 1024 -> 128 -> 64 -> 16 -> 1 on the CLS
    feature, with the published mean/std normalisation.

Weights are gated (zero-egress container); `convert`-style loaders can map
the published torch checkpoint with the same conventions as
models/convert.py. Random-init exercises the full code path in tests.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .vit import ViTConfig, ViTEncoder, preprocess_for

# published normalisation of ImageReward-v1.0 raw scores
IR_MEAN = 0.16717362830052426
IR_STD = 1.0333394966054072

BLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
BLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30524  # bert-base + BLIP special tokens
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    encoder_width: int = 1024  # image feature dim for cross-attention

    @staticmethod
    def tiny(encoder_width: int = 16) -> "BertConfig":
        return BertConfig(
            vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, encoder_width=encoder_width,
        )


class BertAttention(nn.Module):
    cfg: BertConfig
    cross: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv, mask=None):
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        b, s, _ = x.shape
        sk = kv.shape[1]
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="query")(x)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, name="key")(kv)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="value")(kv)
        q = q.reshape(b, s, c.num_heads, head_dim)
        k = k.reshape(b, sk, c.num_heads, head_dim)
        v = v.reshape(b, sk, c.num_heads, head_dim)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * head_dim**-0.5
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, c.hidden_size)
        out = nn.Dense(c.hidden_size, dtype=self.dtype, name="output")(out)
        return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="norm")(out + x)


class BertLayer(nn.Module):
    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, image_embeds, text_mask):
        x = BertAttention(self.cfg, dtype=self.dtype, name="attention")(
            x, x, text_mask
        )
        x = BertAttention(self.cfg, cross=True, dtype=self.dtype,
                          name="crossattention")(x, image_embeds)
        h = nn.Dense(self.cfg.intermediate_size, dtype=self.dtype,
                     name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="output")(h)
        return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="norm")(h + x)


class BlipTextEncoder(nn.Module):
    """BERT in BLIP multimodal mode: text self-attn + image cross-attn."""

    cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids, image_embeds, text_mask=None):
        c = self.cfg
        b, s = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                       name="word_embeddings")(input_ids)
        pos = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (c.max_position_embeddings, c.hidden_size),
        )
        x = tok + pos[None, :s].astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="embed_norm")(x)
        # image patch embeds projected to encoder width happen upstream;
        # BLIP's BERT cross-attends to encoder_width features directly.
        for i in range(c.num_layers):
            x = BertLayer(c, dtype=self.dtype, name=f"layer_{i}")(
                x, image_embeds, text_mask
            )
        return x


class RewardHead(nn.Module):
    """768 -> 1024 -> 128 -> 64 -> 16 -> 1 reward MLP.

    NOTE: the published ImageReward-v1.0 MLP has its ReLU activations
    commented out upstream (ImageReward/models/ImageReward.py `MLP` — only
    Dropout sits between the Linears), so at inference it is a chain of
    plain linear layers. We reproduce that exactly; adding activations here
    would silently break weight parity."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat):
        h = nn.Dense(1024, dtype=self.dtype, name="fc1")(feat)
        h = nn.Dense(128, dtype=self.dtype, name="fc2")(h)
        h = nn.Dense(64, dtype=self.dtype, name="fc3")(h)
        h = nn.Dense(16, dtype=self.dtype, name="fc4")(h)
        return nn.Dense(1, dtype=self.dtype, name="fc5")(h)[..., 0]


class ImageReward(nn.Module):
    """score(images01, input_ids) -> (B,) normalised reward."""

    vit_cfg: ViTConfig
    bert_cfg: BertConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images01, input_ids, text_mask=None):
        # BLIP ViT returns the full patch sequence for cross-attention;
        # reuse ViTEncoder's trunk by asking for tokens.
        vit = PatchSequenceViT(self.vit_cfg, dtype=self.dtype, name="visual_encoder")
        image_embeds = vit(
            preprocess_for(images01, self.vit_cfg.image_size,
                           BLIP_IMAGE_MEAN, BLIP_IMAGE_STD)
        )
        txt = BlipTextEncoder(self.bert_cfg, dtype=self.dtype, name="text_encoder")(
            input_ids, image_embeds, text_mask
        )
        raw = RewardHead(dtype=self.dtype, name="mlp")(txt[:, 0])
        return (raw - IR_MEAN) / IR_STD


class PatchSequenceViT(nn.Module):
    """ViT trunk that returns the (B, N+1, D) token sequence (BLIP needs
    all patch tokens for cross-attention, not just CLS)."""

    cfg: ViTConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        from .vit import ViTBlock

        c = self.cfg
        b = images.shape[0]
        x = nn.Conv(
            c.hidden_size, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), padding="VALID",
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
        for i in range(c.num_layers):
            x = ViTBlock(c, dtype=self.dtype, name=f"blocks_{i}")(x)
        x = nn.LayerNorm(epsilon=c.norm_eps, dtype=self.dtype, name="post_layernorm")(x)
        return x.astype(jnp.float32)


def _text_mask_from_ids(ids: np.ndarray, tokenizer) -> np.ndarray:
    """Attention mask over the padded token ids.

    The reference scores with the HF tokenizer's `attention_mask`
    (padding='max_length', 35 tokens), so [PAD] positions must not be
    attended. BERT's pad id is 0, which can collide with a real id in
    reduced test vocabs — so when the tokenizer exposes `sep_id`, the
    position of the last [SEP] defines the valid span instead of the pad
    value (BLIP pads strictly after [SEP])."""
    pos = np.arange(ids.shape[1])[None, :]
    sep = getattr(tokenizer, "sep_id", None)
    if sep is not None:
        is_sep = ids == sep
        last = np.where(
            is_sep.any(axis=1), (is_sep * pos).max(axis=1), ids.shape[1] - 1
        )
        return pos <= last[:, None]
    pad = getattr(tokenizer, "pad_id", getattr(tokenizer, "pad_token_id", None))
    if pad is None:
        return np.ones(ids.shape, bool)
    mask = ids != pad
    mask[:, 0] = True  # CLS is always valid even if its id equals pad
    return mask


def make_image_reward_fn(module: ImageReward, params, tokenizer):
    """Adapter producing the `Evaluators.image_reward_fn` signature."""
    apply = jax.jit(lambda p, im, ids, m: module.apply(p, im, ids, m))

    def fn(images01, prompts: Sequence[str]):
        ids = np.asarray(tokenizer(list(prompts)))
        mask = jnp.asarray(_text_mask_from_ids(ids, tokenizer))
        return np.asarray(
            apply(params, jnp.asarray(images01), jnp.asarray(ids), mask)
        )

    return fn
