"""Training observability: JSONL metrics log + optional TensorBoard.

The reference logs scalars/images through accelerate's tensorboard tracker
(`train_icd_sd15_lora.py:1097-1105`, SURVEY.md §5). Here the primary sink
is an append-only JSONL file (robust, dependency-free, trivially parsed);
TensorBoard event files are written too when `torch.utils.tensorboard` is
importable (torch is in the image).
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a", buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict, prefix: str = "") -> None:
        row = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            key = f"{prefix}{k}"
            try:
                row[key] = float(v)
            except (TypeError, ValueError):
                continue
            if self._tb is not None:
                self._tb.add_scalar(key, row[key], int(step))
        self._f.write(json.dumps(row) + "\n")

    def log_images(self, step: int, tag: str, images01: np.ndarray) -> None:
        """(B, H, W, 3) float [0,1] -> tensorboard grid + PNG fallback."""
        arr = np.asarray(images01)
        if self._tb is not None:
            self._tb.add_images(tag, arr.transpose(0, 3, 1, 2), int(step))
        else:
            try:
                from PIL import Image

                d = os.path.join(os.path.dirname(self.path), "samples")
                os.makedirs(d, exist_ok=True)
                grid = (np.concatenate(list(arr), axis=1) * 255).astype(np.uint8)
                Image.fromarray(grid).save(
                    os.path.join(d, f"{tag.replace('/', '_')}_{step}.png")
                )
            except Exception:
                pass

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()
