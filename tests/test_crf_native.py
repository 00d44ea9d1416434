"""Native permutohedral CRF vs the exact JAX mean-field CRF."""
import numpy as np
import pytest

import jax.numpy as jnp

from equss_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
from equss_tpu.ops.crf import CRFConfig, dense_crf
from equss_tpu.ops.crf_native import (
    batched_crf_native,
    dense_crf_native,
    permutohedral_filter,
)


def test_filter_approximates_gaussian():
    rng = np.random.RandomState(0)
    feats = rng.randn(300, 5).astype(np.float32)
    vals = rng.randn(300, 3).astype(np.float32)
    out = permutohedral_filter(feats, vals)
    d2 = ((feats[:, None] - feats[None]) ** 2).sum(-1)
    expected = np.exp(-0.5 * d2) @ vals
    for c in range(3):
        r = np.corrcoef(out[:, c], expected[:, c])[0, 1]
        assert r > 0.95, (c, r)


def test_filter_constant_scale_cancels():
    """Symmetric normalization makes the lattice's constant scale factor
    irrelevant: filter(ones) and filter(x) share the same factor."""
    rng = np.random.RandomState(1)
    feats = rng.randn(200, 2).astype(np.float32)
    ones = np.ones((200, 1), np.float32)
    x = rng.rand(200, 1).astype(np.float32)
    deg = permutohedral_filter(feats, ones)[:, 0]
    filt = permutohedral_filter(feats, x)[:, 0]
    # normalized value stays within the convex-ish hull of inputs
    normalized = filt / np.maximum(deg, 1e-12)
    assert normalized.min() > x.min() - 0.15
    assert normalized.max() < x.max() + 0.15


def _two_region(h, w):
    img = np.zeros((h, w, 3), np.float32)
    img[:, : w // 2] = [0.9, 0.1, 0.1]
    img[:, w // 2:] = [0.1, 0.1, 0.9]
    return img


def test_native_crf_denoises_and_matches_exact():
    rng = np.random.RandomState(2)
    h = w = 24
    img01 = _two_region(h, w)
    true = np.zeros((h, w), np.int32)
    true[:, w // 2:] = 1
    logits = np.zeros((h, w, 2), np.float32)
    flip = rng.rand(h, w) < 0.25
    noisy = np.where(flip, 1 - true, true)
    logits[np.arange(h)[:, None], np.arange(w)[None], noisy] = 2.0
    log_p = logits - np.log(np.exp(logits).sum(-1, keepdims=True))

    cfg = CRFConfig(max_iter=10, block=64)
    out_native = dense_crf_native(img01 * 255.0, log_p, cfg)
    after = np.argmax(out_native, -1)
    acc = float((after == true).mean())
    assert acc > 0.95, acc

    # agreement with the exact TPU-path CRF (lattice is approximate:
    # compare argmax decisions)
    img_norm = jnp.asarray((img01 - IMAGENET_MEAN) / IMAGENET_STD)
    out_exact = np.asarray(dense_crf(img_norm, jnp.asarray(log_p), cfg))
    agree = float((np.argmax(out_exact, -1) == after).mean())
    assert agree > 0.95, agree


def test_batched_native_crf_shapes():
    rng = np.random.RandomState(3)
    imgs = rng.rand(2, 8, 8, 3).astype(np.float32) * 255
    lp = rng.randn(2, 8, 8, 4).astype(np.float32)
    out = batched_crf_native(imgs, lp, CRFConfig(max_iter=2))
    assert out.shape == (2, 8, 8, 4)
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-4)


def test_native_image_loader_matches_pil():
    """Native decode+resize+crop vs the PIL path on synthetic JPEGs."""
    import os
    import tempfile

    from PIL import Image

    from equss_tpu.data.native_loader import load_image_batch
    from equss_tpu.data.transforms import load_image

    rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as td:
        paths = []
        for i, (h, w) in enumerate([(64, 96), (100, 50), (64, 64)]):
            img = rng.randint(0, 255, (h, w, 3), np.uint8)
            p = os.path.join(td, f"{i}.jpg")
            Image.fromarray(img).save(p, quality=95)
            paths.append(p)

        res = 32
        native = load_image_batch(paths, res, n_threads=2)
        assert native.shape == (3, res, res, 3)
        for i, p in enumerate(paths):
            pil = load_image(p, res, "center")
            # JPEG decode + NEAREST rounding conventions can differ on a
            # thin boundary band; the overwhelming majority must agree
            agree = float((native[i] == pil).mean())
            assert agree > 0.85, (i, agree)
            # and values must be close everywhere (decoder differences)
            assert float(np.abs(native[i].astype(int) -
                                pil.astype(int)).mean()) < 8.0
