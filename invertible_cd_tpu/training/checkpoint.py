"""Checkpoint / resume with rotation + inference-format export.

Replaces the reference's accelerate `save_state` flow
(`training/train_icd_sd15_lora.py:666-724,994-1034`, SURVEY.md §5):
  * every save writes BOTH students' LoRA + optimizer state + step as one
    orbax checkpoint (the resume format; the reference keeps two separate
    accelerator states and asserts their steps match, `:828-857`),
  * rotation keeps the newest `keep` checkpoints (the reference's
    `checkpoints_total_limit`),
  * `export_inference` additionally writes kohya-format LoRA safetensors
    per student — the artifact the inference loaders (ours and the
    reference's `utils/loading.py:64-88`) consume,
  * `latest_step` re-implements `recover_resume_step`
    (`training/src/utils.py:7-20`).
"""
from __future__ import annotations

import os
import re
from typing import Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..models.convert import export_lora_to_kohya
from .trainer import ICDTrainState


def _manager(ckpt_dir: str, keep: Optional[int]) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=keep, create=True, enable_async_checkpointing=False
        ),
    )


def save_checkpoint(
    ckpt_dir: str, state: ICDTrainState, keep: Optional[int] = 5
) -> int:
    """Write an orbax checkpoint at the state's step; rotate old ones."""
    step = int(jax.device_get(state.step))
    mgr = _manager(ckpt_dir, keep)
    mgr.save(step, args=ocp.args.StandardSave(_to_pytree(state)))
    mgr.wait_until_finished()
    mgr.close()
    return step


def latest_step(ckpt_dir: str) -> Optional[int]:
    """Newest checkpoint step under `ckpt_dir` (reference
    `recover_resume_step`)."""
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(m.group(1))
        for name in os.listdir(ckpt_dir)
        if (m := re.fullmatch(r"(\d+)", name))
    ]
    return max(steps) if steps else None


def restore_checkpoint(
    ckpt_dir: str, template: ICDTrainState, step: Optional[int] = None
) -> ICDTrainState:
    """Restore into the structure of `template` (shapes/dtypes must match)."""
    mgr = _manager(ckpt_dir, None)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    restored = mgr.restore(
        step, args=ocp.args.StandardRestore(_to_pytree(template))
    )
    mgr.close()
    return _from_pytree(restored)


def _to_pytree(state: ICDTrainState) -> Dict:
    return {
        "step": state.step,
        "lora_reverse": state.lora_reverse,
        "lora_forward": state.lora_forward,
        "opt_reverse": state.opt_reverse,
        "opt_forward": state.opt_forward,
    }


def _from_pytree(tree: Dict) -> ICDTrainState:
    return ICDTrainState(
        step=tree["step"],
        lora_reverse=tree["lora_reverse"],
        lora_forward=tree["lora_forward"],
        opt_reverse=tree["opt_reverse"],
        opt_forward=tree["opt_forward"],
    )


def export_inference(
    out_dir: str, state: ICDTrainState, lora_alpha: float = 8.0
) -> Dict[str, str]:
    """Write kohya-format LoRA safetensors for both students (the
    reference's inference artifact layout: `unet_lora/
    pytorch_lora_weights.safetensors` + `forward_unet_lora/...`,
    `train_icd_sd15_lora.py:676-692`)."""
    from safetensors.numpy import save_file

    paths = {}
    for name, lora in (
        ("unet_lora", state.lora_reverse),
        ("forward_unet_lora", state.lora_forward),
    ):
        d = os.path.join(out_dir, name)
        os.makedirs(d, exist_ok=True)
        flat = export_lora_to_kohya(jax.device_get(lora), alpha=lora_alpha)
        # safetensors writes the raw buffer: transposed views MUST be made
        # contiguous or the file silently holds permuted data.
        flat = {k: np.ascontiguousarray(v) for k, v in flat.items()}
        path = os.path.join(d, "lora_weights.safetensors")
        save_file(flat, path)
        paths[name] = path
    return paths


def load_inference_lora(path: str):
    """Read a kohya LoRA safetensors file back into our adapter pytree
    (the inference loader side of C2)."""
    from safetensors.numpy import load_file

    from ..models.convert import convert_lora_from_kohya

    return convert_lora_from_kohya(load_file(path))
