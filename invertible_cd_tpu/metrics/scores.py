"""Metric harness: CLIP / DINOv2 / PSNR / LPIPS scoring + batch drivers.

Capability twin of reference `utils/metrics.py` (C12):
  calc_clip_score_images_images  (metrics.py:211-245)
  calc_clip_score_images_text    (metrics.py:248-280)
  calc_dinov2_similarities       (metrics.py:176-207)
  calculate_psnr                 (metrics.py:295-308)
  calculate_lpips                (metrics.py:310-324)
  calc_all  — editing metric bundle -> dict (metrics.py:327-390)
  calc_inversion — inversion quality bundle (metrics.py:392-435)

Design: an `Evaluators` bundle owns whichever scorer networks have loaded
weights; each metric jit-compiles its feature extractor once and batches
internally. Missing models make the corresponding metric return None
(gated — this container has no pretrained weights; the reference downloads
them at run time, which a zero-egress TPU pod cannot).

ImageReward (metrics.py:283-293) is a BLIP-based reward model; it is
exposed behind the same gate (`image_reward_fn`) and reported as None
when unavailable.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.clip import CLIPTextConfig, CLIPTextModel
from .basic import batch_psnr
from .lpips import LPIPS
from .vit import (
    CLIP_IMAGE_MEAN,
    CLIP_IMAGE_STD,
    IMAGENET_MEAN,
    IMAGENET_STD,
    ViTConfig,
    ViTEncoder,
    preprocess_for,
)


@dataclasses.dataclass
class Evaluators:
    """Scorer bundle. Fields are (module, params) pairs or None."""

    clip_vision: Optional[tuple] = None  # (ViTEncoder, params)
    clip_text: Optional[tuple] = None  # (CLIPTextModel w/ projection, params)
    clip_tokenizer: Optional[object] = None
    dino: Optional[tuple] = None  # (ViTEncoder, params)
    lpips: Optional[tuple] = None  # (LPIPS, params)
    image_reward_fn: Optional[Callable] = None  # (images01, prompts) -> scores

    def __post_init__(self):
        self._jit: Dict = {}

    # -- feature extractors (jitted once) --------------------------------
    def clip_image_features(self, images01) -> jax.Array:
        module, params = self.clip_vision
        key = "clip_img"
        if key not in self._jit:
            def fn(p, images01):
                x = preprocess_for(images01, 224, CLIP_IMAGE_MEAN, CLIP_IMAGE_STD)
                f = module.apply(p, x)
                return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-10)
            self._jit[key] = jax.jit(fn)
        return self._jit[key](params, jnp.asarray(images01))

    def clip_text_features(self, prompts: Sequence[str]) -> jax.Array:
        module, params = self.clip_text
        tokens = jnp.asarray(self.clip_tokenizer(list(prompts)))
        key = "clip_txt"
        if key not in self._jit:
            def fn(p, toks):
                out = module.apply(p, toks)
                f = out["projected_pooled"]
                return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-10)
            self._jit[key] = jax.jit(fn)
        return self._jit[key](params, tokens)

    def dino_features(self, images01) -> jax.Array:
        module, params = self.dino
        key = "dino"
        if key not in self._jit:
            def fn(p, images01):
                x = preprocess_for(images01, 224, IMAGENET_MEAN, IMAGENET_STD)
                f = module.apply(p, x)
                return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-10)
            self._jit[key] = jax.jit(fn)
        return self._jit[key](params, jnp.asarray(images01))

    # -- scores ----------------------------------------------------------
    def clip_image_image(self, a01, b01) -> Optional[float]:
        """Mean CLIP cosine between image pairs (preservation metric)."""
        if self.clip_vision is None:
            return None
        fa, fb = self.clip_image_features(a01), self.clip_image_features(b01)
        return float(jnp.mean(jnp.sum(fa * fb, axis=-1)))

    def clip_image_text(self, images01, prompts) -> Optional[float]:
        """Mean CLIP cosine between images and their prompts (editing
        fidelity)."""
        if self.clip_vision is None or self.clip_text is None:
            return None
        fi = self.clip_image_features(images01)
        ft = self.clip_text_features(prompts)
        return float(jnp.mean(jnp.sum(fi * ft, axis=-1)))

    def dino_image_image(self, a01, b01) -> Optional[float]:
        if self.dino is None:
            return None
        fa, fb = self.dino_features(a01), self.dino_features(b01)
        return float(jnp.mean(jnp.sum(fa * fb, axis=-1)))

    def lpips_distance(self, a01, b01) -> Optional[float]:
        """Mean LPIPS at 224^2 (reference uses piq at 224,
        metrics.py:318-321)."""
        if self.lpips is None:
            return None
        module, params = self.lpips
        key = "lpips"
        if key not in self._jit:
            def fn(p, a, b):
                a = jax.image.resize(a, (a.shape[0], 224, 224, 3), "bilinear")
                b = jax.image.resize(b, (b.shape[0], 224, 224, 3), "bilinear")
                return module.apply(p, a * 2 - 1, b * 2 - 1)
            self._jit[key] = jax.jit(fn)
        return float(
            jnp.mean(self._jit[key](params, jnp.asarray(a01), jnp.asarray(b01)))
        )

    def image_reward(self, images01, prompts) -> Optional[float]:
        if self.image_reward_fn is None:
            return None
        return float(np.mean(self.image_reward_fn(images01, prompts)))

    # -- batch drivers ---------------------------------------------------
    def calc_all(
        self,
        orig_images01,
        edited_images01,
        source_prompts: Sequence[str],
        target_prompts: Sequence[str],
    ) -> Dict[str, Optional[float]]:
        """The reference's editing metric bundle (metrics.py:327-390):
        preservation (CLIP-I/I + DINO between original and edited) and
        editing fidelity (CLIP-I/T + ImageReward of edited vs target)."""
        return {
            "preservation_clip_image_image": self.clip_image_image(
                orig_images01, edited_images01
            ),
            "preservation_dinov2": self.dino_image_image(
                orig_images01, edited_images01
            ),
            "editing_clip_image_text": self.clip_image_text(
                edited_images01, target_prompts
            ),
            "editing_image_reward": self.image_reward(
                edited_images01, target_prompts
            ),
        }

    def calc_inversion(
        self, real_images01, reconstructed_images01
    ) -> Dict[str, Optional[float]]:
        """Inversion quality bundle (metrics.py:392-435): DINO similarity,
        PSNR, LPIPS between the real image and its round-trip."""
        psnr = batch_psnr(
            np.asarray(real_images01) * 255.0,
            np.asarray(reconstructed_images01) * 255.0,
        )
        return {
            "dinov2": self.dino_image_image(real_images01, reconstructed_images01),
            "psnr": float(np.mean(psnr)),
            "lpips": self.lpips_distance(real_images01, reconstructed_images01),
        }


def make_random_evaluators(seed: int = 0, tiny: bool = True) -> Evaluators:
    """Random-weight evaluators for tests (scores are meaningless but the
    full code path runs)."""
    from ..utils.tokenizer import HashTokenizer

    k = jax.random.PRNGKey(seed)
    k1, k2, k3, k4 = jax.random.split(k, 4)
    vcfg = ViTConfig.tiny() if tiny else ViTConfig.clip_vit_l14()
    vit = ViTEncoder(vcfg)
    vp = vit.init(k1, jnp.zeros((1, vcfg.image_size, vcfg.image_size, 3)))
    dcfg = dataclasses.replace(
        ViTConfig.tiny(), projection_dim=None, layer_scale_init=1e-5, pre_ln=False
    )
    dino = ViTEncoder(dcfg)
    dp = dino.init(k2, jnp.zeros((1, dcfg.image_size, dcfg.image_size, 3)))
    tcfg = CLIPTextConfig.tiny()
    tcfg = dataclasses.replace(tcfg, projection_dim=vcfg.projection_dim)
    text = CLIPTextModel(tcfg)
    tp = text.init(k3, jnp.zeros((1, 77), jnp.int32))
    lp_mod = LPIPS()
    lp = lp_mod.init(k4, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3)))

    evals = Evaluators(
        clip_vision=(vit, vp),
        clip_text=(text, tp),
        clip_tokenizer=HashTokenizer(vocab_size=tcfg.vocab_size),
        dino=(dino, dp),
        lpips=(lp_mod, lp),
    )
    # tiny ViT expects 28x28 inputs; patch the jitted preprocess size
    if tiny:
        size = vcfg.image_size

        def feat(p, images01, module=vit):
            x = preprocess_for(images01, size, CLIP_IMAGE_MEAN, CLIP_IMAGE_STD)
            f = module.apply(p, x)
            return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-10)

        def dfeat(p, images01, module=dino):
            x = preprocess_for(images01, size, IMAGENET_MEAN, IMAGENET_STD)
            f = module.apply(p, x)
            return f / (jnp.linalg.norm(f, axis=-1, keepdims=True) + 1e-10)

        evals._jit["clip_img"] = jax.jit(feat)
        evals._jit["dino"] = jax.jit(dfeat)
    return evals


def evaluators_from_weights(
    clip_vision_path: Optional[str] = None,
    clip_text_path: Optional[str] = None,
    dino_path: Optional[str] = None,
    vgg_path: Optional[str] = None,
    lpips_heads_path: Optional[str] = None,
    image_reward_path: Optional[str] = None,
    bert_vocab_path: Optional[str] = None,
    tokenizer=None,
) -> Evaluators:
    """Assemble real evaluators from torch checkpoint files using the
    converters in models/convert.py — the loading story the reference gets
    from transformers/torchhub/piq downloads (`utils/metrics.py:139-321`).
    Any missing path leaves that metric gated (None)."""
    from ..models.convert import (
        convert_clip_text_from_transformers,
        convert_clip_vision_from_transformers,
        convert_dinov2_weights,
        convert_lpips_weights,
        load_torch_file,
    )
    from ..utils.tokenizer import default_tokenizer
    from .lpips import LPIPS

    clip_vision = clip_text = dino = lpips = None
    if clip_vision_path:
        vit = ViTEncoder(ViTConfig.clip_vit_l14())
        clip_vision = (
            vit, convert_clip_vision_from_transformers(load_torch_file(clip_vision_path))
        )
    if clip_text_path:
        cfg = dataclasses.replace(CLIPTextConfig.vit_l(), projection_dim=768)
        text = CLIPTextModel(cfg)
        clip_text = (
            text, convert_clip_text_from_transformers(load_torch_file(clip_text_path))
        )
    if dino_path:
        dvit = ViTEncoder(ViTConfig.dinov2_vit_b14())
        dino = (dvit, convert_dinov2_weights(load_torch_file(dino_path)))
    if vgg_path and lpips_heads_path:
        mod = LPIPS()
        lpips = (
            mod,
            convert_lpips_weights(
                load_torch_file(vgg_path), load_torch_file(lpips_heads_path)
            ),
        )
    image_reward_fn = None
    if image_reward_path and bert_vocab_path:
        from ..models.convert import convert_image_reward_weights
        from ..utils.tokenizer import BertWordPieceTokenizer
        from .image_reward import BertConfig, ImageReward, make_image_reward_fn

        module = ImageReward(ViTConfig.blip_vit_l16(), BertConfig())
        params = convert_image_reward_weights(load_torch_file(image_reward_path))
        image_reward_fn = make_image_reward_fn(
            module, params, BertWordPieceTokenizer(bert_vocab_path)
        )
    return Evaluators(
        clip_vision=clip_vision,
        clip_text=clip_text,
        clip_tokenizer=tokenizer or default_tokenizer(),
        dino=dino,
        lpips=lpips,
        image_reward_fn=image_reward_fn,
    )
