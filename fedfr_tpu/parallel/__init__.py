from .fedavg import (
    fed_weighted_average,
    fedavg_on_fc,
    spreadout,
    stack_trees,
    unstack_tree,
)
from .mesh import AXES, make_mesh, model_mesh, replicated, shard_over
from .partial_fc import (
    pad_classes,
    partial_fc_loss,
    sample_negatives,
    sampled_partial_fc_loss,
)

__all__ = [
    "fed_weighted_average",
    "fedavg_on_fc",
    "spreadout",
    "stack_trees",
    "unstack_tree",
    "AXES",
    "make_mesh",
    "model_mesh",
    "replicated",
    "shard_over",
    "pad_classes",
    "partial_fc_loss",
    "sample_negatives",
    "sampled_partial_fc_loss",
]
