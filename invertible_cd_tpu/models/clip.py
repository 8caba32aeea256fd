"""CLIP text encoders in Flax (SD1.5's ViT-L and SDXL's ViT-L + OpenCLIP bigG).

Replaces the transformers `CLIPTextModel(WithProjection)` forward passes the
reference uses for prompt encoding (reference `utils/generation.py:286-303`,
`utils/generation_sdxl.py:9-76`). Supports:
  * last or penultimate hidden state output (SDXL takes hidden_states[-2]),
  * pooled output at the EOS token + text projection (SDXL's second encoder).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    intermediate_size: int = 3072
    hidden_act: str = "quick_gelu"  # OpenCLIP bigG uses "gelu"
    projection_dim: Optional[int] = None
    eos_token_id: int = 49407

    @staticmethod
    def vit_l() -> "CLIPTextConfig":
        return CLIPTextConfig()

    @staticmethod
    def open_clip_big_g() -> "CLIPTextConfig":
        return CLIPTextConfig(
            hidden_size=1280, num_layers=32, num_heads=20,
            intermediate_size=5120, hidden_act="gelu", projection_dim=1280,
        )

    @staticmethod
    def tiny(vocab_size: int = 1000) -> "CLIPTextConfig":
        return CLIPTextConfig(
            vocab_size=vocab_size, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64,
        )


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(name)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        c = self.cfg
        head_dim = c.hidden_size // c.num_heads
        b, s, _ = x.shape
        q = nn.Dense(c.hidden_size, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(c.hidden_size, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c.hidden_size, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, s, c.num_heads, head_dim)
        k = k.reshape(b, s, c.num_heads, head_dim)
        v = v.reshape(b, s, c.num_heads, head_dim)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (head_dim**-0.5)
        logits = jnp.where(causal_mask, logits, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, c.hidden_size)
        return nn.Dense(c.hidden_size, dtype=self.dtype, name="out_proj")(out)


class CLIPLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(self.cfg, dtype=self.dtype, name="self_attn")(h, causal_mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(self.cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _act(self.cfg.hidden_act)(h)
        h = nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Returns (hidden_states tuple is avoided: we return what SD needs).

    __call__(input_ids, output_hidden_state=-1) ->
      dict(last_hidden_state, penultimate_hidden_state, pooled_output,
           projected_pooled)
    """

    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array):
        c = self.cfg
        b, s = input_ids.shape
        tok = nn.Embed(c.vocab_size, c.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (c.max_position_embeddings, c.hidden_size),
        )
        x = tok + pos[None, :s, :].astype(self.dtype)
        causal = jnp.tril(jnp.ones((s, s), dtype=bool))[None, None, :, :]

        penultimate = None
        for i in range(c.num_layers):
            if i == c.num_layers - 1:
                penultimate = x
            x = CLIPLayer(c, dtype=self.dtype, name=f"layers_{i}")(x, causal)

        last = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")(x)

        # Pooled output: hidden state at the EOS token (highest id occurrence,
        # matching CLIP's argmax-based pooling for standard tokenizers).
        eos_pos = jnp.argmax(
            (input_ids == c.eos_token_id).astype(jnp.int32), axis=-1
        )
        pooled = jnp.take_along_axis(last, eos_pos[:, None, None], axis=1)[:, 0, :]

        out = {
            "last_hidden_state": last,
            "penultimate_hidden_state": penultimate,
            "pooled_output": pooled,
        }
        if c.projection_dim is not None:
            out["projected_pooled"] = nn.Dense(
                c.projection_dim, use_bias=False, dtype=self.dtype,
                name="text_projection",
            )(pooled)
        return out
