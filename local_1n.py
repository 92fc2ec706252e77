"""Standalone personalized open-set 1:n evaluation helper.

API-compatible stand-in for the reference local_1n.py: exposes
``evaluation(query_feats, gallery_feats, mask)`` returning the TPIR list at
FPIR {1e-6, 1e-5, 1e-4, 1e-3} with the 40-images-per-identity recall
denominator (reference local_1n.py:8-44).
"""

from fedfr_tpu.evalsuite.local_eval import open_set_identification


def evaluation(query_feats, gallery_feats, mask):
    result, _ = open_set_identification(query_feats, gallery_feats, mask)
    return result
