from .dataset import (
    ImageCaptionDataset,
    InfiniteSampler,
    make_train_iterator,
    load_and_preprocess,
)
from .benchmarks import load_benchmark

__all__ = [
    "ImageCaptionDataset",
    "InfiniteSampler",
    "make_train_iterator",
    "load_and_preprocess",
    "load_benchmark",
]
