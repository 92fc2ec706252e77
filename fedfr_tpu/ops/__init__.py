from .losses import bce_loss, cosine_similarity, moon_contrastive, softmax_cross_entropy
from .margins import MARGINS, arcface, cosface, reweight_negatives

__all__ = [
    "bce_loss",
    "cosine_similarity",
    "moon_contrastive",
    "softmax_cross_entropy",
    "MARGINS",
    "arcface",
    "cosface",
    "reweight_negatives",
]
