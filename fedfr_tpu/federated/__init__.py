from .client import Client
from .embed import (
    class_mean_features,
    embed_dataset,
    hard_negative_mask,
    auto_embed_fn,
    make_embed_fn,
)
from .server import Server
from .state import ClientTrainState, normalize_images, random_hflip, train_preprocess
from .trainer import (
    init_client_state,
    make_branch_train_step,
    make_plain_train_step,
)

__all__ = [
    "Client",
    "Server",
    "ClientTrainState",
    "normalize_images",
    "random_hflip",
    "train_preprocess",
    "init_client_state",
    "make_branch_train_step",
    "make_plain_train_step",
    "class_mean_features",
    "embed_dataset",
    "hard_negative_mask",
    "auto_embed_fn",
    "make_embed_fn",
]
