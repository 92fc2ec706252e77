from .align import ARCFACE_SRC, align_face, landmarks5, umeyama
from .local_eval import (
    append_local_log,
    client_query_mask,
    local_11_roc,
    mean_tpr_tables,
    open_set_identification,
)
from .verification import BinVerificationCallback, load_bin, test_bin

__all__ = [
    "ARCFACE_SRC",
    "align_face",
    "landmarks5",
    "umeyama",
    "append_local_log",
    "client_query_mask",
    "local_11_roc",
    "mean_tpr_tables",
    "open_set_identification",
    "BinVerificationCallback",
    "load_bin",
    "test_bin",
]
