from .tokenizer import ClipTokenizer, HashTokenizer, default_tokenizer

__all__ = ["ClipTokenizer", "HashTokenizer", "default_tokenizer"]
