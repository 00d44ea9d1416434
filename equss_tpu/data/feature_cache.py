"""Frozen-backbone feature cache.

The DINO backbone is frozen (dino_featurizer.py:18-21), so its dense
features are constants of the dataset — yet the reference recomputes
them every step (2 ViT forwards per batch, ~2/3 of step time).  This
job precomputes them once on device and the trainer consumes
``feat``/``feat_pos`` batches, skipping the ViT entirely: head+PQ
training then runs ~5-10x faster per step.  A capability the reference
does not have (enabled by the functional split of backbone vs heads).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp

from equss_tpu.data.transforms import normalize_images


def precompute_features(
    model,
    params: Dict[str, Any],
    data,                          # UnSegData (train mode w/ positives ok)
    out_path: str,
    *,
    batch_size: int = 32,
    max_items: Optional[int] = None,
) -> str:
    """Dense features for every image -> compressed npz (feats, labels)."""

    @jax.jit
    def feats_fn(params, img):
        return model.features(params, normalize_images(img))

    feats, labels = [], []
    seen = 0
    for batch in data.batches(batch_size, shuffle=False, drop_last=False):
        feats.append(np.asarray(feats_fn(params, jnp.asarray(batch["img"]))))
        labels.append(np.asarray(batch["label"]))
        seen += len(batch["img"])
        if max_items is not None and seen >= max_items:
            break
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez_compressed(out_path,
                        feats=np.concatenate(feats)[:max_items],
                        labels=np.concatenate(labels)[:max_items])
    return out_path


def cached_feature_batches(
    cache_path: str,
    nns: Optional[np.ndarray],
    batch_size: int,
    *,
    num_neighbors: int = 7,
    seed: int = 0,
    shuffle: bool = True,
) -> Iterator[Dict[str, np.ndarray]]:
    """Epoch iterator over cached features with kNN positives
    (mirrors the image pipeline contract, feat/feat_pos/label keys)."""
    blob = np.load(cache_path)
    feats, labels = blob["feats"], blob["labels"]
    n = len(feats)
    rng = np.random.RandomState(seed)
    order = np.arange(n)
    if shuffle:
        rng.shuffle(order)
    stop = n - (n % batch_size) if shuffle else n
    for start in range(0, stop, batch_size):
        idx = order[start: start + batch_size]
        batch = {"feat": feats[idx], "label": labels[idx]}
        if nns is not None:
            k = rng.randint(1, num_neighbors + 1, size=len(idx))
            pos_idx = nns[idx, np.minimum(k, nns.shape[1] - 1)]
            batch["feat_pos"] = feats[pos_idx]
        else:
            batch["feat_pos"] = feats[idx]
        yield batch
