from .basic import batch_psnr, mse, psnr
from .fid import FIDScorer
from .frechet import compute_statistics, frechet_distance, frechet_from_features
from .inception import InceptionV3Features
from .lpips import LPIPS, VGG16Features
from .image_reward import BertConfig, ImageReward, make_image_reward_fn
from .scores import Evaluators, make_random_evaluators
from .vit import ViTConfig, ViTEncoder, preprocess_for

__all__ = [
    "batch_psnr",
    "mse",
    "psnr",
    "FIDScorer",
    "compute_statistics",
    "frechet_distance",
    "frechet_from_features",
    "InceptionV3Features",
    "LPIPS",
    "VGG16Features",
    "BertConfig",
    "ImageReward",
    "make_image_reward_fn",
    "Evaluators",
    "make_random_evaluators",
    "ViTConfig",
    "ViTEncoder",
    "preprocess_for",
]
