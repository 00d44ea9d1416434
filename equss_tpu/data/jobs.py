"""Offline data jobs: five-crop materialization + kNN precompute.

1. ``materialize_crops`` — the five-crop corpus builder
   (/root/reference/data/crop_dataset.py:87-140): crops every train image
   into 5 sub-images at crop_ratio, saving img/{i}.jpg and label/{i}.png
   with the label+1 offset consumed by CroppedDataset.

2. ``precompute_knns`` — the kNN-positive cache
   (/root/reference/data/precompute_knns.py:258-319): global-average-
   pooled, L2-normalized DINO features for the whole corpus, followed by
   a chunked cosine-similarity matmul + top-k.  TPU-native: feature
   extraction is a jitted batched forward; the O(N^2 d) similarity runs
   as device matmul tiles with jax.lax.top_k (the reference's einsum+topk,
   :305-317), so the full similarity matrix never materializes in HBM.
"""
from __future__ import annotations

import os
from os.path import join
from typing import Any, Dict, Optional

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from equss_tpu.data.datasets import build_base_dataset
from equss_tpu.data.transforms import five_crop_np, normalize_images, random_crops_np


def materialize_crops(
    dataset_name: str,
    data_dir: str,
    out_dir: Optional[str] = None,
    *,
    mode: str = "train",
    crop_type: str = "five",
    crop_ratio: float = 0.5,
    res: int = 0,
    limit: Optional[int] = None,
) -> str:
    """Write cropped/{ds}_{type}_crop_{ratio}/img|label/{mode}/{i}.jpg|png."""
    out_root = join(out_dir or data_dir, "cropped",
                    f"{dataset_name}_{crop_type}_crop_{crop_ratio}")
    img_dir = join(out_root, "img", mode)
    label_dir = join(out_root, "label", mode)
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(label_dir, exist_ok=True)

    # full-resolution source (no resize/crop): loader_crop_type none
    ds = build_base_dataset(dataset_name, mode, data_dir, res=res or 320,
                            crop_type=None, loader_crop_type="none")
    # we need original resolution, so bypass the resize: use raw files
    n = len(ds) if limit is None else min(limit, len(ds))
    for item_idx in range(n):
        img_path = ds.image_files[item_idx]
        lbl_path = ds.label_files[item_idx]
        img = np.asarray(Image.open(img_path).convert("RGB"), np.uint8)
        label = ds.remap_label(
            np.asarray(Image.open(lbl_path), np.int32))
        ch = int(img.shape[0] * crop_ratio)
        cw = int(img.shape[1] * crop_ratio)
        if crop_type == "five":
            img_crops = five_crop_np(img, ch, cw)
            lbl_crops = five_crop_np(label, ch, cw)
        elif crop_type == "random":
            img_crops = random_crops_np(img, ch, cw, item_idx, 5)
            lbl_crops = random_crops_np(label, ch, cw, item_idx, 5)
        else:
            raise ValueError(f"Unknown crop type {crop_type}")
        for crop_num, (ic, lc) in enumerate(zip(img_crops, lbl_crops)):
            i = item_idx * 5 + crop_num
            Image.fromarray(ic).save(join(img_dir, f"{i}.jpg"), "JPEG")
            # label+1 so 0 encodes ignore (crop_dataset.py:130-131)
            Image.fromarray((lc + 1).astype(np.uint8)).save(
                join(label_dir, f"{i}.png"), "PNG")
    return out_root


def extract_pooled_features(
    model,                        # EQUSS or a VisionTransformer bundle
    params: Dict[str, Any],
    data,                         # UnSegData
    *,
    batch_size: int = 32,
    max_items: Optional[int] = None,
) -> np.ndarray:
    """Mean-pooled, L2-normalized dense features for every image
    (precompute_knns.py:165-171)."""

    @jax.jit
    def feats_fn(params, img):
        f = model.features(params, normalize_images(img))   # (b, gh, gw, C)
        f = jnp.mean(f, axis=(1, 2))
        n = jnp.linalg.norm(f, axis=-1, keepdims=True)
        return f / jnp.maximum(n, 1e-12)

    out = []
    seen = 0
    for batch in data.batches(batch_size, shuffle=False, drop_last=False):
        f = feats_fn(params, jnp.asarray(batch["img"]))
        out.append(np.asarray(f))
        seen += len(batch["img"])
        if max_items is not None and seen >= max_items:
            break
    feats = np.concatenate(out, axis=0)
    return feats[:max_items] if max_items else feats


def topk_neighbors(feats: np.ndarray, k: int = 30,
                   chunk: int = 1024) -> np.ndarray:
    """Chunked cosine top-k over the full corpus
    (precompute_knns.py:305-317).  feats assumed L2-normalized."""
    feats_j = jnp.asarray(feats)

    @jax.jit
    def chunk_topk(q):
        sim = jnp.einsum("nf,mf->nm", q, feats_j,
                         preferred_element_type=jnp.float32)
        _, idx = jax.lax.top_k(sim, k)
        return idx

    outs = []
    for start in range(0, feats.shape[0], chunk):
        outs.append(np.asarray(chunk_topk(feats_j[start: start + chunk])))
    return np.concatenate(outs, axis=0)


def precompute_knns(
    model,
    params: Dict[str, Any],
    data,
    out_path: str,
    *,
    k: int = 30,
    batch_size: int = 32,
    max_items: Optional[int] = None,
) -> str:
    """Full job: features -> top-k -> compressed npz cache
    (precompute_knns.py:319 naming contract handled by the caller)."""
    feats = extract_pooled_features(model, params, data,
                                    batch_size=batch_size,
                                    max_items=max_items)
    k_eff = min(k, feats.shape[0])
    nns = topk_neighbors(feats, k_eff)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez_compressed(out_path, nns=nns)
    return out_path
