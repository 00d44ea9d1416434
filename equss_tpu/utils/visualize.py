"""Qualitative visualization of predictions.

Equivalent of /root/reference/utils/visualize_utils.py: saves per-image
cluster/linear/label PNGs with dataset colormaps (cluster ids remapped
through the Hungarian assignment, :38-62) and per-subspace
codeword-index maps upsampled x8 (pq_visualization, :65-91).
"""
from __future__ import annotations

import os
from os.path import join
from typing import Optional, Sequence

import numpy as np
from PIL import Image

from equss_tpu.data.catalog import (
    create_cityscapes_colormap,
    create_pascal_label_colormap,
    create_pq_colormap,
)


def _colormap_for(dataset_name: str) -> np.ndarray:
    if dataset_name in ("voc", "pascal", "cocostuff27", "cocostuff15",
                        "cocostuff3", "potsdam"):
        return create_pascal_label_colormap()
    return create_cityscapes_colormap()


def _save_colored(arr: np.ndarray, cmap: np.ndarray, path: str) -> None:
    arr = np.asarray(arr).astype(np.int32)   # labels may arrive int8
    safe = np.clip(arr, 0, len(cmap) - 1)
    rgb = cmap[safe].astype(np.uint8)
    rgb[arr < 0] = 0
    Image.fromarray(rgb).save(path)


def visualization(
    save_dir: str,
    dataset_name: str,
    saved_data: dict,
    metrics_cluster=None,
    is_label: bool = True,
) -> None:
    """Dump linear/cluster/label PNGs (visualize_utils.py:38-62).

    saved_data: dict with 'linear_preds' (N, H, W), 'cluster_preds',
    optionally 'label'; cluster ids are remapped through the Hungarian
    assignment when a computed UnSegMetrics is provided.
    """
    cmap = _colormap_for(dataset_name)
    for sub in ("linear", "cluster") + (("label",) if is_label else ()):
        os.makedirs(join(save_dir, sub), exist_ok=True)

    linear = np.asarray(saved_data["linear_preds"])
    cluster = np.asarray(saved_data["cluster_preds"])
    label = np.asarray(saved_data["label"]) if is_label else None
    for i in range(linear.shape[0]):
        _save_colored(linear[i], cmap, join(save_dir, "linear", f"{i}.png"))
        c = cluster[i]
        if metrics_cluster is not None:
            c = metrics_cluster.map_clusters(c)
        _save_colored(np.asarray(c), cmap,
                      join(save_dir, "cluster", f"{i}.png"))
        if label is not None:
            _save_colored(label[i], cmap, join(save_dir, "label", f"{i}.png"))


def pq_visualization(
    save_dir: str,
    indices: np.ndarray,          # (N, h, w, M) per-subspace codeword ids
    subspaces: Optional[Sequence[int]] = None,
    upsample: int = 8,
) -> None:
    """Per-subspace codeword-index maps, upsampled x8
    (visualize_utils.py:65-91)."""
    cmap = create_pq_colormap()
    indices = np.asarray(indices)
    n, h, w, M = indices.shape
    subspaces = list(subspaces) if subspaces is not None else list(range(M))
    for m in subspaces:
        os.makedirs(join(save_dir, f"pq_{m}"), exist_ok=True)
    for i in range(n):
        for m in subspaces:
            idx_map = indices[i, :, :, m] % len(cmap)
            big = np.repeat(np.repeat(idx_map, upsample, 0), upsample, 1)
            _save_colored(big, cmap, join(save_dir, f"pq_{m}", f"{i}.png"))
