from .unet2d import UNet2DCondition, UNetConfig, count_attention_layers
from .vae import AutoencoderKL, VAEConfig
from .clip import CLIPTextModel, CLIPTextConfig
from .lora import (
    DEFAULT_TARGET_PATTERNS,
    find_lora_targets,
    init_lora,
    lora_delta,
    merge_lora,
)
from .attention import AttnMeta

__all__ = [
    "UNet2DCondition",
    "UNetConfig",
    "count_attention_layers",
    "AutoencoderKL",
    "VAEConfig",
    "CLIPTextModel",
    "CLIPTextConfig",
    "DEFAULT_TARGET_PATTERNS",
    "find_lora_targets",
    "init_lora",
    "lora_delta",
    "merge_lora",
    "AttnMeta",
]
