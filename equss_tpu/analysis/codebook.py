"""Offline analysis tools.

Library equivalents of the reference's ad-hoc analysis scripts
(/root/reference/cross_entropy.py — per-class codeword entropy;
edit_distance.py — inter-class cosine-similarity and codebook-usage
heatmaps; plot_dino_correspondence.py — DINO feature correlation
heatmaps between image pairs).  Pure functions over arrays so they run
on device and plug into notebooks/CLIs instead of editing script
globals.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def per_class_codeword_entropy(
    indices: np.ndarray,          # (N, h, w, M) codeword ids
    labels: np.ndarray,           # (N, h, w) class ids (-1 ignore)
    num_classes: int,
    num_codebook: int,
) -> Dict[str, np.ndarray]:
    """Per-(class, subspace) codeword distribution entropy
    (cross_entropy.py:5-76): how many codewords a class uses."""
    indices = np.asarray(indices)
    labels = np.asarray(labels)
    n, h, w, M = indices.shape
    flat_idx = indices.reshape(-1, M)
    flat_lab = labels.reshape(-1)
    valid = (flat_lab >= 0) & (flat_lab < num_classes)
    flat_idx = flat_idx[valid]
    flat_lab = flat_lab[valid]

    counts = np.zeros((num_classes, M, num_codebook), np.int64)
    for m in range(M):
        np.add.at(counts[:, m, :], (flat_lab, flat_idx[:, m]), 1)
    probs = counts / np.maximum(counts.sum(-1, keepdims=True), 1)
    with np.errstate(divide="ignore", invalid="ignore"):
        ent = -np.where(probs > 0, probs * np.log(probs), 0.0).sum(-1)
    return {"counts": counts, "entropy": ent,       # (C, M)
            "mean_entropy_per_class": ent.mean(-1)}


def inter_class_similarity(
    features: np.ndarray,         # (N, h, w, D) quantized features
    labels: np.ndarray,           # (N, h, w)
    num_classes: int,
) -> np.ndarray:
    """Cosine similarity between per-class mean quantized features
    (edit_distance.py:11-65) -> (C, C) heatmap matrix."""
    D = features.shape[-1]
    flat_f = np.asarray(features).reshape(-1, D)
    flat_l = np.asarray(labels).reshape(-1)
    means = np.zeros((num_classes, D))
    for c in range(num_classes):
        sel = flat_l == c
        if sel.any():
            means[c] = flat_f[sel].mean(0)
    norms = np.maximum(np.linalg.norm(means, axis=-1, keepdims=True), 1e-12)
    normed = means / norms
    return normed @ normed.T


def codebook_usage_heatmap(
    indices: np.ndarray,          # (N, h, w, M)
    num_codebook: int,
) -> np.ndarray:
    """(M, K) usage counts (edit_distance.py usage heatmaps)."""
    indices = np.asarray(indices)
    M = indices.shape[-1]
    flat = indices.reshape(-1, M)
    out = np.zeros((M, num_codebook), np.int64)
    for m in range(M):
        out[m] = np.bincount(flat[:, m], minlength=num_codebook)
    return out


def dino_correspondence(
    feat_a: np.ndarray,           # (h, w, C) dense DINO features
    feat_b: np.ndarray,           # (h, w, C)
    query_yx: Tuple[int, int],
) -> np.ndarray:
    """Correlation heatmap of one query patch in image A against all of
    image B (plot_dino_correspondence.py:73-93)."""
    fa = np.asarray(feat_a)
    fb = np.asarray(feat_b)
    q = fa[query_yx[0], query_yx[1]]
    q = q / max(np.linalg.norm(q), 1e-12)
    fbn = fb / np.maximum(np.linalg.norm(fb, axis=-1, keepdims=True), 1e-12)
    return fbn @ q
