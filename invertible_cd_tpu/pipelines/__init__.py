from .sampler import (
    GuidanceConfig,
    cons_generation,
    cons_inversion,
    ddim_loop,
    predict_noise,
    w_embedding_for,
)
from .pipeline import (
    InvertibleCD,
    init_zero_params,
    load_512,
    to_model_pixels,
    to_uint8,
)

__all__ = [
    "GuidanceConfig",
    "cons_generation",
    "cons_inversion",
    "ddim_loop",
    "predict_noise",
    "w_embedding_for",
    "InvertibleCD",
    "init_zero_params",
    "load_512",
    "to_model_pixels",
    "to_uint8",
]
