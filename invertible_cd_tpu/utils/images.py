"""Image-grid helpers (reference `utils/generation.py:569-626`).

The reference exposes `to_pil_images` / `view_images` — tile a list (or
(N, H, W, 3) stack) of uint8 images into one grid with white gutters —
as its notebook-facing presentation surface. Twin here, with the
duplicated body factored once: `view_images` is `to_pil_images` plus a
side effect (the reference calls notebook `display()`; headless here we
save or `PIL.Image.show`).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np

try:  # PIL ships with the image stack but stay importable without it
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def image_grid(
    images: Union[np.ndarray, Sequence[np.ndarray]],
    num_rows: int = 1,
    offset_ratio: float = 0.02,
) -> np.ndarray:
    """Tile images into one (grid_h, grid_w, 3) uint8 array.

    Accepts a single (H, W, 3) image, an (N, H, W, 3) stack, or a list of
    equal-shape images; floats in [0, 1] are rescaled. A ragged last row
    is padded with white tiles, matching the reference's `num_empty`
    behavior (`generation.py:570-580`); the gutter is
    `int(H * offset_ratio)` white pixels.
    """
    if isinstance(images, np.ndarray) and images.ndim == 3:
        imgs: List[np.ndarray] = [images]
    else:
        imgs = [np.asarray(im) for im in images]
    if not imgs:
        raise ValueError("image_grid needs at least one image")
    norm = []
    for im in imgs:
        if im.dtype != np.uint8:
            im = np.clip(np.asarray(im, np.float32) * 255.0, 0, 255)
        norm.append(im.astype(np.uint8))
    imgs = norm
    num_empty = len(imgs) % num_rows
    if num_empty:
        num_empty = num_rows - num_empty  # pad the ragged row to full width
        # (reference computes `len % num_rows` and appends that many — a
        # quirk that UNDER-pads unless the list already divides evenly; we
        # pad to a full rectangle, which is the evident intent)
        imgs = imgs + [np.full_like(imgs[0], 255)] * num_empty
    h, w, _ = imgs[0].shape
    offset = int(h * offset_ratio)
    num_cols = len(imgs) // num_rows
    grid = np.full(
        (h * num_rows + offset * (num_rows - 1),
         w * num_cols + offset * (num_cols - 1), 3), 255, np.uint8
    )
    for i in range(num_rows):
        for j in range(num_cols):
            grid[i * (h + offset): i * (h + offset) + h,
                 j * (w + offset): j * (w + offset) + w] = imgs[i * num_cols + j]
    return grid


def to_pil_images(
    images: Union[np.ndarray, Sequence[np.ndarray]],
    num_rows: int = 1,
    offset_ratio: float = 0.02,
):
    """Reference `to_pil_images` twin: the grid as a PIL image."""
    if Image is None:  # pragma: no cover
        raise ImportError("to_pil_images needs Pillow")
    return Image.fromarray(image_grid(images, num_rows, offset_ratio))


def view_images(
    images: Union[np.ndarray, Sequence[np.ndarray]],
    num_rows: int = 1,
    offset_ratio: float = 0.02,
    save_path: Optional[str] = None,
):
    """Reference `view_images` twin. The reference `display()`s into a
    notebook; headless, pass `save_path` to write the grid (else
    PIL's viewer is attempted). Returns the PIL image either way."""
    pil = to_pil_images(images, num_rows, offset_ratio)
    if save_path is not None:
        pil.save(save_path)
    else:  # pragma: no cover — needs a display
        pil.show()
    return pil
