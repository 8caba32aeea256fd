"""SDXL pipeline: dual text encoders + added conditioning (C3/C17).

Capability twin of the reference SDXL path (`utils/loading.py:93-147
load_models_xl`, `utils/generation_sdxl.py` samplers). Differences from
SD1.5 handled here:
  * two tokenizers/encoders; the context is the concatenation of both
    encoders' PENULTIMATE hidden states (768 + 1280 = 2048,
    reference `generation_sdxl.py:9-44`),
  * added conditioning: the second encoder's projected pooled embedding
    plus micro-conditioning time_ids [orig_h, orig_w, crop_top, crop_left,
    target_h, target_w] (reference `generation_sdxl.py:47-76`),
  * fp32 VAE decode (SDXL's fp16 VAE overflows; reference
    `generation_sdxl.py:465-466`) — we keep the VAE module in fp32 while
    the UNet runs bf16,
  * default 1024x1024 resolution (128x128 latents), scaling 0.13025.

The samplers themselves are shared with SD1.5 (pipelines/sampler.py): the
multi-boundary consistency math is identical; only conditioning differs
(reference `sample_deterministic`/`inverse_sample_deterministic`,
`generation_sdxl.py:203-305,324-473`, mirror `cons_generation`/
`cons_inversion`).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..diffusion.schedule import make_schedule
from ..diffusion.solver import SolverGrid, make_solver_grid
from ..models import (
    AutoencoderKL,
    CLIPTextConfig,
    CLIPTextModel,
    UNet2DCondition,
    UNetConfig,
    VAEConfig,
)
from ..utils.tokenizer import default_tokenizer
from .pipeline import InvertibleCD, init_zero_params


@dataclasses.dataclass
class InvertibleCDXL(InvertibleCD):
    """SDXL variant; `params` gains a "text_2" entry."""

    text_encoder_2: Optional[CLIPTextModel] = None
    tokenizer_2: Optional[object] = None
    default_resolution: int = 1024

    @staticmethod
    def sdxl(
        params: Optional[Dict[str, dict]] = None,
        tokenizer=None,
        tokenizer_2=None,
        grid: Optional[SolverGrid] = None,
        dtype=jnp.bfloat16,
        unet_cfg: Optional[UNetConfig] = None,
        latent_size: Tuple[int, int] = (128, 128),
        quantize: str = "off",
        vae_dtype=jnp.float32,
    ) -> "InvertibleCDXL":
        unet_cfg = unet_cfg or UNetConfig.sdxl()
        clip_cfg = CLIPTextConfig.vit_l()
        clip2_cfg = CLIPTextConfig.open_clip_big_g()
        vae_cfg = VAEConfig.sdxl()
        unet = UNet2DCondition(unet_cfg, dtype=dtype)
        text = CLIPTextModel(clip_cfg, dtype=dtype)
        text2 = CLIPTextModel(clip2_cfg, dtype=dtype)
        # fp32 VAE by default: SDXL's decoder overflows in FP16 (the
        # reference's rationale, `generation_sdxl.py:465-466`). bf16 has
        # fp32's exponent range, so vae_dtype=jnp.bfloat16 is a safe
        # opt-in precision/speed trade on TPU (the fp32 decode runs at
        # half the MXU rate) — measured quality/speed in README.
        vae = AutoencoderKL(vae_cfg, dtype=vae_dtype)
        tok = tokenizer or default_tokenizer()
        # OpenCLIP pads with 0, not eot (reference tokenizer_2 config).
        tok2 = tokenizer_2 or default_tokenizer(pad_token_id=0)
        if params is None:
            # bf16 param storage: SDXL fp32 zero-init (~13 GB with both text
            # encoders) exceeds one v5e's HBM.
            params = init_zero_params(
                unet, text, vae, unet_cfg, clip_cfg, latent_size,
                param_dtype=jnp.bfloat16,
            )
            shapes2 = jax.eval_shape(
                lambda: text2.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)
                )
            )
            params["text_2"] = jax.tree.map(
                lambda s: jnp.zeros(
                    s.shape,
                    jnp.bfloat16 if jnp.issubdtype(s.dtype, jnp.floating) else s.dtype,
                ),
                shapes2,
            )
        return InvertibleCDXL(
            unet=unet,
            text_encoder=text,
            vae=vae,
            params=params,
            tokenizer=tok,
            schedule=make_schedule(),
            grid=grid or make_solver_grid(
                # iCD-SDXL checkpoints train on these endpoints (reference
                # running/sdxl/README.md:4) — NOT the SD1.5 259/519/779 grid
                reverse_timesteps=[249, 499, 699, 999],
                forward_timesteps=[19, 249, 499, 699],
            ),
            scaling_factor=vae_cfg.scaling_factor,
            latent_size=latent_size,
            text_encoder_2=text2,
            tokenizer_2=tok2,
            quantize=quantize,
        )

    # ------------------------------------------------------------------
    def _build_encode_text_xl(self):
        def encode(text_params, text2_params, tokens, tokens2):
            out1 = self.text_encoder.apply(text_params, tokens)
            out2 = self.text_encoder_2.apply(text2_params, tokens2)
            ctx = jnp.concatenate(
                [out1["penultimate_hidden_state"], out2["penultimate_hidden_state"]],
                axis=-1,
            )
            return ctx, out2["projected_pooled"]
        return jax.jit(encode)

    def encode_prompt_xl(self, prompts: Sequence[str]):
        """(context (B,77,2048), pooled (B,1280)) per prompt list
        (reference `encode_prompt`, `generation_sdxl.py:9-44`)."""
        tokens = jnp.asarray(self.tokenizer(list(prompts)))
        tokens2 = jnp.asarray(self.tokenizer_2(list(prompts)))
        fn = self._get_jit("encode_text_xl")
        return fn(self.params["text"], self.params["text_2"], tokens, tokens2)

    def add_time_ids(self, batch: int, original_size=None, crop=(0, 0),
                     target_size=None) -> jax.Array:
        """[orig_h, orig_w, crop_top, crop_left, tgt_h, tgt_w]
        (reference `compute_embeddings`, `generation_sdxl.py:47-76`)."""
        r = self.default_resolution
        o = original_size or (r, r)
        t = target_size or (r, r)
        row = jnp.asarray([o[0], o[1], crop[0], crop[1], t[0], t[1]], jnp.float32)
        return jnp.broadcast_to(row, (batch, 6))

    def _encode_all(self, prompts: Sequence[str], need_uncond: bool = True):
        # need_uncond is free here: SDXL's uncond context is zeros, not a
        # second encoder pass (see below).
        ctx_c, pooled_c = self.encode_prompt_xl(prompts)
        # SDXL zeroes the uncond context instead of encoding "" (diffusers
        # force_zeros_for_empty_prompt; reference trains with
        # zeros(B,77,2048) uncond embeds, `train_icd_xl_lora.py:900-903`).
        ctx_u = jnp.zeros_like(ctx_c)
        added = {
            "text_embeds": pooled_c,
            "time_ids": self.add_time_ids(len(prompts)),
        }
        return ctx_u, ctx_c, added

    def encode_prompt(self, prompts: Sequence[str]):
        ctx_u, ctx_c, _ = self._encode_all(list(prompts))
        return ctx_u, ctx_c

    def edit(
        self,
        image,
        source_prompt: str,
        target_prompt: str,
        controller=None,
        key=None,
        guidance=None,
        invert_guidance=None,
    ):
        """SDXL invert-then-edit. Without a controller this is the
        reference's SDXL protocol (`running/sdxl/edit.py:201-234`):
        forward-CD inversion under the source prompt at guidance 0, then
        dynamic-guidance sampling of the TARGET prompt with
        `amplify_prompt=[source]` (the source context replaces the
        target's while t > tau1*1000). With a controller it falls back to
        the SD1.5-style p2p path (a TPU-side extension — the reference
        never combines SDXL with p2p).

        Returns (images (2,H,W,3) float [0,1]: row 0 reconstruction,
        row 1 edit; edited latents)."""
        if controller is not None:
            return super().edit(
                image, source_prompt, target_prompt, controller,
                key=key, guidance=guidance, invert_guidance=invert_guidance,
            )
        import jax as _jax

        inv_latent, _ = self.invert(
            image, source_prompt,
            key=key if key is not None else _jax.random.PRNGKey(0),
            guidance=invert_guidance,
        )
        g = guidance or self.default_guidance(
            guidance_scale=19.0, dynamic_guidance=True, tau1=0.7, tau2=0.7,
        )
        latent = jnp.broadcast_to(inv_latent[:1], (2,) + inv_latent.shape[1:])
        return self.generate(
            [source_prompt, target_prompt], latent=latent, guidance=g,
            amplify_prompt=[source_prompt],
        )
