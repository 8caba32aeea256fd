"""Checkpoint loading for the full pipeline bundle.

The reference's `load_models` (`utils/loading.py:27-90`) builds a
StableDiffusionPipeline — which brings VAE + CLIP along with the UNet —
then deep-copies it per student and fuses the kohya LoRAs. Our bundle
keeps the three UNet param sets plus text/vae params in one dict; this
module fills that dict from on-disk torch artifacts:

  * teacher UNet: diffusers state dict (`.pt` / `.safetensors`;
    the guidance-distilled teacher of `loading.py:46-58`),
  * VAE / CLIP text encoder: diffusers / transformers state dicts,
  * reverse/forward students: kohya LoRA safetensors fused into the
    teacher weights (C2 conversion + `fuse_lora`, `loading.py:64-88`).

Everything is converted on the host in numpy and device_put once at the
end — no per-tensor host->device chatter over the TPU tunnel.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..models.convert import (
    convert_clip_text_from_transformers,
    convert_lora_from_kohya,
    convert_unet_from_diffusers,
    convert_vae_from_diffusers,
    load_torch_file,
)
from ..models.lora import merge_lora


def _fuse_lora_file(base_params: Dict, lora_path: str) -> Dict:
    adapters, alphas = convert_lora_from_kohya(load_torch_file(lora_path))
    if not adapters:
        raise ValueError(f"no kohya LoRA tensors found in {lora_path}")
    alpha = next(iter(alphas.values()), 8.0)
    rank = next(iter(adapters.values()))["down"].shape[-1]
    return {"params": merge_lora(base_params["params"], adapters, alpha=alpha, rank=rank)}


def load_bundle_params(
    teacher: Optional[str] = None,
    vae: Optional[str] = None,
    text: Optional[str] = None,
    reverse_lora: Optional[str] = None,
    forward_lora: Optional[str] = None,
    params: Optional[Dict[str, dict]] = None,
    dtype=None,
) -> Dict[str, dict]:
    """Fill a bundle's params dict from torch checkpoint files.

    `params` (an existing dict, e.g. zero-initialised) supplies anything
    not given a file. LoRA students fuse into the teacher; without a LoRA
    file the student shares the teacher weights (the reference's students
    are teacher+LoRA, `loading.py:64-88`).
    """
    out = dict(params or {})
    if teacher:
        base = convert_unet_from_diffusers(load_torch_file(teacher))
        out["teacher"] = base
        out["reverse"] = base
        out["forward"] = base
    if vae:
        out["vae"] = convert_vae_from_diffusers(load_torch_file(vae))
    if text:
        out["text"] = convert_clip_text_from_transformers(load_torch_file(text))
    for name, path in (("reverse", reverse_lora), ("forward", forward_lora)):
        if path:
            if "teacher" not in out:
                raise ValueError("LoRA given without a teacher checkpoint")
            out[name] = _fuse_lora_file(out["teacher"], path)

    def _cast(x):
        x = jnp.asarray(x)
        return x.astype(dtype) if dtype is not None and jnp.issubdtype(x.dtype, jnp.floating) else x

    return jax.tree.map(_cast, out)
