"""Personalized (per-client) local evaluation: 1:1 ROC and 1:n retrieval.

In-process replacement for the reference's subprocess chain
(eval_local.py -> os.system roc_cuda.py; local_all.py:142-177 for 1:n):
embedding, all-pairs histogram ROC, and open-set retrieval all run as jitted
device code in the same process.
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..ops.roc_histogram import client_roc

logger = logging.getLogger("fedfr_tpu.local_eval")


def append_local_log(output_dir: str, start_id: int, end_id: int, epoch: int,
                     table: List[float]) -> None:
    """Same line format as roc_cuda.plot_ROC (roc_cuda.py:84-87) so
    parse-log tooling keeps working."""
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, "local_log.txt")
    with open(path, "a") as f:
        f.write("Target label from %d to %d\n" % (start_id, end_id - 1))
        f.write("Epoch %d, TPR (-1 to -6) = %r\n" % (epoch, table))


def local_11_roc(feats: np.ndarray, labels: np.ndarray, start_id: int,
                 end_id: int, epoch: int = 0,
                 output_dir: Optional[str] = None) -> List[float]:
    """One client's 1:1 TPR@FPR(-1..-6) table over the local veri set."""
    table = client_roc(feats, labels, start_id, end_id)
    logger.info("Target label from %d to %d", start_id, end_id - 1)
    logger.info("Epoch %d, TPR (-1 to -6) = %r", epoch, table)
    if output_dir is not None:
        append_local_log(output_dir, start_id, end_id, epoch, table)
    return table


def mean_tpr_tables(tables: Sequence[Sequence[float]]) -> List[float]:
    """Average per-client tables; reported -6..-1 (local_all.py:433-453)."""
    arr = np.asarray(tables, dtype=np.float64)
    mean = arr.mean(axis=0)
    return [float("%.2f" % mean[len(mean) - 1 - i]) for i in range(len(mean))]


def open_set_identification(query_feats: np.ndarray, gallery_feats: np.ndarray,
                            mask: np.ndarray,
                            fars: Sequence[float] = (1e-6, 1e-5, 1e-4, 1e-3),
                            recall_denominator: Optional[int] = None
                            ) -> Tuple[List[float], List[float]]:
    """Personalized 1:n evaluation (reference local_all.py:142-177).

    ``mask[i]`` is the gallery index of query i's identity, or -1 for
    out-of-gallery probes.  TPIR@FPIR: thresholds are the top-k negative
    scores; recall denominator is 40*gallery by the reference's convention
    (40 veri images per identity).
    """
    from .openset import openset_thresholds

    q, g = query_feats.shape[0], gallery_feats.shape[0]
    sim = query_feats @ gallery_feats.T
    # sim is local and dead after this call -> skip the defensive copy
    pos_sims, ths = openset_thresholds(sim, mask, fars, inplace=True)
    denom = recall_denominator if recall_denominator is not None else 40 * g
    result = [float(np.sum(pos_sims > th)) / denom for th in ths]
    return result, list(fars)


def client_query_mask(labels: np.ndarray, start_id: int,
                      end_id: int) -> np.ndarray:
    """Build the query->gallery mask for one client (local_all.py:399-406).

    The reference slices rows positionally ([start_id*40, end_id*40)),
    relying on the veri rec's by-identity ordering with 40 imgs each; masking
    by label value is identical on that layout and also correct for any
    image-per-identity count (hence no imgs-per-id parameter).
    """
    labels = np.asarray(labels)
    in_client = (labels >= start_id) & (labels < end_id)
    return np.where(in_client, labels - start_id, -1).astype(np.int64)


class LocalVerificationCallback:
    """Per-round personalized 1:1 verification for sampled clients.

    In-process equivalent of the reference CallBack_LocalVerifi
    (eval_local.py:74-105), which re-embedded the 160k-image local set and
    shelled out to roc_cuda.py per client.  Here embedding reuses the shared
    jitted forward and the ROC histogram runs as one device dispatch.
    """

    def __init__(self, backbone, bce_module, veri_dataset, output_dir: str,
                 batch_size: int = 512, frequent: int = 1, threshold: int = -1,
                 plain_embed_fn=None):
        from ..federated.embed import auto_embed_fn

        self.embed_fn = auto_embed_fn(backbone, bce_module)
        # reuse an existing jitted forward when provided (avoids recompiling
        # the identical embedding program)
        self.plain_embed_fn = plain_embed_fn or auto_embed_fn(backbone)
        self.dataset = veri_dataset
        self.output_dir = output_dir
        self.batch_size = batch_size
        self.frequent = frequent
        self.threshold = threshold
        self.client_record: dict = {}

    def veri_test(self, backbone_vars, global_step: int, id_list,
                  client_id: int, bce_params=None) -> Optional[List[float]]:
        if global_step < self.threshold or global_step % self.frequent != 0:
            return None
        from ..federated.embed import embed_dataset

        # features stay on device end-to-end: embedding -> reorder ->
        # histogram kernel (320 MB per client at reference scale never
        # round-trips the host)
        if bce_params is not None:
            feats, labels = embed_dataset(self.embed_fn, backbone_vars,
                                          self.dataset, self.batch_size,
                                          bce_params=bce_params,
                                          return_device=True)
        else:
            feats, labels = embed_dataset(self.plain_embed_fn, backbone_vars,
                                          self.dataset, self.batch_size,
                                          return_device=True)
        client_dir = os.path.join(self.output_dir, "clients",
                                  f"client_{client_id}")
        table = local_11_roc(feats, labels, id_list[0], id_list[-1] + 1,
                             epoch=global_step, output_dir=client_dir)
        self.client_record.setdefault(client_id, []).append((global_step, table))
        return table


