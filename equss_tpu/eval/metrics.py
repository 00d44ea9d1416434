"""Streaming confusion matrix + Hungarian-matched mIoU/Accuracy.

Equivalent of UnSegMetrics (/root/reference/model/metric.py:13-125):
bincount confusion accumulation (:44-58), cross-replica sum (:63),
Hungarian assignment incl. the extra-classes over-clustering path
(:65-82), and mIoU/Acc/precision (:88-97).

Design: ``confusion_update`` is a pure jit-able function (runs in-graph,
sharded batch -> GSPMD all-reduces the sum); the Hungarian assignment is
a tiny (27x27) host-side scipy call at ``compute()`` time, the natural
host/device seam.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment


def confusion_update(
    preds: jnp.ndarray,
    label: jnp.ndarray,
    num_classes: int,
    extra_classes: int = 0,
) -> jnp.ndarray:
    """One batch's confusion matrix, shape (num_classes+extra, num_classes).

    Rows = predictions, cols = labels (after the transpose, matching
    metric.py:53-58).  Invalid labels/preds are masked out.
    """
    preds = preds.reshape(-1)
    label = label.reshape(-1)
    # exactness precondition of the f32 one-hot matmul below: no single
    # confusion cell may exceed 2^24 (f32 integer range).  The pixel
    # count per call bounds every cell, so enforce it statically here
    # (chunk the batch if a future eval ever trips this).
    if label.size >= 2 ** 24:
        raise ValueError(
            f"confusion_update saw {label.size} pixels in one call; f32 "
            f"one-hot-matmul counts are only exact below 2^24 per cell — "
            f"split the batch")
    n_pred = num_classes + extra_classes
    mask = (
        (label >= 0) & (label < num_classes)
        & (preds >= 0) & (preds < num_classes)
    )
    # one-hot matmul instead of a scatter-add: .at[idx].add(1) over the
    # b x H x W pixel stream is DMA-bound on TPU (the dominant cost of
    # the 320^2 valid step); as one_hot(label)^T @ one_hot(pred) the
    # count rides the MXU.  Products are exact 0/1 and the f32
    # accumulator is exact below 2^24 — far above any per-batch
    # pixel count per cell — so the counts are bit-exact integers.
    oh_l = ((label[:, None] == jnp.arange(num_classes)[None, :])
            & mask[:, None]).astype(jnp.bfloat16)
    oh_p = (preds[:, None] == jnp.arange(n_pred)[None, :]).astype(jnp.bfloat16)
    conf = jax.lax.dot_general(
        oh_l, oh_p, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                  # (num_classes, n_pred)
    return conf.T.astype(jnp.int32)  # host accumulator widens to int64


class UnSegMetrics:
    """Host-side accumulator.  update() takes device or numpy arrays."""

    def __init__(self, num_classes: int, extra_classes: int = 0,
                 compute_hungarian: bool = True) -> None:
        if (not compute_hungarian) and extra_classes != 0:
            raise ValueError("extra_classes requires Hungarian matching")
        self.num_classes = num_classes
        self.extra_classes = extra_classes
        self.compute_hungarian = compute_hungarian
        self.reset()

    def reset(self) -> None:
        n = self.num_classes
        self.confusion = np.zeros((n + self.extra_classes, n), np.int64)
        self.assignments: Optional[Tuple[np.ndarray, np.ndarray]] = None
        self.histogram: Optional[np.ndarray] = None

    def update(self, preds, label) -> None:
        conf = confusion_update(
            jnp.asarray(preds), jnp.asarray(label),
            self.num_classes, self.extra_classes,
        )
        self.confusion += np.asarray(conf)

    def update_confusion(self, conf) -> None:
        """Add a precomputed (in-graph) confusion matrix."""
        self.confusion += np.asarray(conf)

    def compute(self) -> Dict[str, float]:
        n = self.num_classes
        conf = self.confusion
        if self.compute_hungarian:
            self.assignments = linear_sum_assignment(conf, maximize=True)
            if self.extra_classes == 0:
                histogram = conf[np.argsort(self.assignments[1]), :]
            else:
                # over-clustering: map extra clusters onto best classes
                assignments_t = linear_sum_assignment(conf.T, maximize=True)
                histogram = conf[assignments_t[1], :]
                missing = sorted(
                    set(range(n + self.extra_classes)) - set(self.assignments[0])
                )
                new_row = conf[missing, :].sum(0, keepdims=True)
                histogram = np.concatenate([histogram, new_row], axis=0)
                new_col = np.zeros((n + 1, 1), histogram.dtype)
                histogram = np.concatenate([histogram, new_col], axis=1)
        else:
            self.assignments = (np.arange(n), np.arange(n))
            histogram = conf
        self.histogram = histogram

        tp = np.diag(histogram).astype(np.float64)
        fp = histogram.sum(0) - tp[: histogram.shape[1]]
        fn = histogram.sum(1) - tp
        with np.errstate(divide="ignore", invalid="ignore"):
            iou = tp / (tp + fp[: len(tp)] + fn)
        miou = np.nanmean(np.where(np.isfinite(iou), iou, np.nan))
        accuracy = tp.sum() / max(histogram.sum(), 1)
        return {"iou": 100.0 * float(miou), "accuracy": 100.0 * float(accuracy)}

    def map_clusters(self, clusters):
        """Cluster-id -> class-id remap for visualization (metric.py:112-125)."""
        if self.assignments is None:
            raise RuntimeError("call compute() first")
        if self.extra_classes == 0:
            return np.asarray(self.assignments[1])[np.asarray(clusters)]
        missing = sorted(
            set(range(self.num_classes + self.extra_classes))
            - set(self.assignments[0])
        )
        cluster_to_class = np.asarray(self.assignments[1])
        for m in missing:
            if m >= cluster_to_class.shape[0]:
                cluster_to_class = np.append(cluster_to_class, -1)
            else:
                cluster_to_class = np.insert(cluster_to_class, m + 1, -1)
        return cluster_to_class[np.asarray(clusters)]
