"""Input pipeline: image+caption dataset with per-host sharded infinite
sampling (reference C27, `training/src/datasets.py`).

The reference wraps a folder-scan dataset in a torch DataLoader with an
EDM-style `InfiniteSampler` (rank-strided shuffled infinite iterator with
window swapping, `datasets.py:113-150`). On TPU the equivalent concerns:
  * each *host* (jax process) reads only its shard (`rank::world_size`
    striding, matching the reference's sampler semantics),
  * batches come out as numpy NHWC float32 in [-1, 1] ready for
    device_put onto the dp-sharded mesh,
  * decoding/resize run in a thread pool that overlaps with device steps
    (the reference leans on torch DataLoader workers).
"""
from __future__ import annotations

import csv
import os
import threading
import queue
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def load_and_preprocess(path: str, resolution: int = 512) -> np.ndarray:
    """Load -> bicubic resize (short side) -> center crop -> [-1, 1]
    float32 HWC (the reference transform, `datasets.py:15-22`).

    The resize/crop/normalise hot path runs in the native C++ library
    (native/image_ops.cc) when built; PIL otherwise."""
    from PIL import Image

    from ..utils import native

    img = Image.open(path).convert("RGB")
    if native.available():
        return native.resize_crop_normalize(np.asarray(img), resolution)
    w, h = img.size
    scale = resolution / min(w, h)
    img = img.resize(
        (max(resolution, round(w * scale)), max(resolution, round(h * scale))),
        Image.BICUBIC,
    )
    w, h = img.size
    left = (w - resolution) // 2
    top = (h - resolution) // 2
    img = img.crop((left, top, left + resolution, top + resolution))
    arr = np.asarray(img, np.float32) / 127.5 - 1.0
    return arr


class ImageCaptionDataset:
    """Folder of images + `{subset}.csv` captions (reference `COCODataset`,
    `datasets.py:46-110`). CSV columns: file_name, caption (extra columns
    ignored)."""

    def __init__(
        self,
        root: str,
        subset: str = "train",
        resolution: int = 512,
        captions_csv: Optional[str] = None,
    ):
        self.root = root
        self.resolution = resolution
        csv_path = captions_csv or os.path.join(root, f"{subset}.csv")
        self.items: List[Tuple[str, str]] = []
        if os.path.exists(csv_path):
            with open(csv_path, newline="", encoding="utf-8") as f:
                reader = csv.DictReader(f)
                for row in reader:
                    name = row.get("file_name") or row.get("image")
                    cap = row.get("caption") or row.get("text") or ""
                    if name:
                        self.items.append((name, cap))
        else:
            for name in sorted(os.listdir(root)):
                if name.lower().endswith(IMG_EXTENSIONS):
                    self.items.append((name, ""))
        if not self.items:
            raise FileNotFoundError(f"no images found under {root}")

    def __len__(self) -> int:
        return len(self.items)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, str]:
        name, caption = self.items[idx]
        img = load_and_preprocess(os.path.join(self.root, name), self.resolution)
        return img, caption


class InfiniteSampler:
    """Infinite shuffled index stream with window swapping and rank
    striding (EDM-style; reference `datasets.py:113-150`).

    Deterministic given (seed, rank): every host sees a disjoint stride of
    one global shuffled order, reshuffled locally by window swaps.
    """

    def __init__(
        self,
        dataset_size: int,
        rank: int = 0,
        num_replicas: int = 1,
        shuffle: bool = True,
        seed: int = 0,
        window_size: float = 0.5,
    ):
        assert dataset_size > 0
        assert 0 <= rank < num_replicas
        assert 0 <= window_size <= 1
        self.dataset_size = dataset_size
        self.rank = rank
        self.num_replicas = num_replicas
        self.shuffle = shuffle
        self.seed = seed
        self.window_size = window_size

    def __iter__(self) -> Iterator[int]:
        order = np.arange(self.dataset_size)
        rnd = None
        window = 0
        if self.shuffle:
            rnd = np.random.RandomState(self.seed)
            rnd.shuffle(order)
            window = int(np.rint(order.size * self.window_size))
        idx = 0
        while True:
            i = idx % order.size
            if idx % self.num_replicas == self.rank:
                yield int(order[i])
            if window >= 2:
                j = (i - rnd.randint(window)) % order.size
                order[i], order[j] = order[j], order[i]
            idx += 1


def make_train_iterator(
    dataset: ImageCaptionDataset,
    batch_size: int,
    rank: int = 0,
    num_replicas: int = 1,
    seed: int = 0,
    num_workers: int = 4,
    prefetch: int = 2,
) -> Iterator[Tuple[np.ndarray, List[str]]]:
    """Infinite (images (B,H,W,3) float32 [-1,1], captions) batches with
    threaded decode overlapping accelerator steps."""
    sampler = iter(
        InfiniteSampler(len(dataset), rank=rank, num_replicas=num_replicas, seed=seed)
    )
    if num_workers <= 0:
        while True:
            pairs = [dataset[next(sampler)] for _ in range(batch_size)]
            yield np.stack([p[0] for p in pairs]), [p[1] for p in pairs]

    out_q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    idx_q: "queue.Queue" = queue.Queue(maxsize=batch_size * (prefetch + 1))
    item_q: "queue.Queue" = queue.Queue(maxsize=batch_size * (prefetch + 1))

    def feeder():
        while True:
            idx_q.put(next(sampler))

    def worker():
        while True:
            i = idx_q.get()
            item_q.put(dataset[i])

    def collator():
        while True:
            pairs = [item_q.get() for _ in range(batch_size)]
            out_q.put((np.stack([p[0] for p in pairs]), [p[1] for p in pairs]))

    threads = [threading.Thread(target=feeder, daemon=True)]
    threads += [threading.Thread(target=worker, daemon=True) for _ in range(num_workers)]
    threads.append(threading.Thread(target=collator, daemon=True))
    for t in threads:
        t.start()
    while True:
        yield out_q.get()
