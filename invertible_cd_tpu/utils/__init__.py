from .images import image_grid, to_pil_images, view_images
from .tokenizer import ClipTokenizer, HashTokenizer, default_tokenizer

__all__ = [
    "ClipTokenizer",
    "HashTokenizer",
    "default_tokenizer",
    "image_grid",
    "to_pil_images",
    "view_images",
]
