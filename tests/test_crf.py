"""Dense CRF: blocked-streamed kernel == dense oracle; refinement
cleans label noise along color edges."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from equss_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
from equss_tpu.ops.crf import (
    CRFConfig,
    batched_crf,
    dense_crf,
    dense_crf_naive,
    _blocked_kernel_apply,
    _bilateral_features,
)


def _normalize(img01):
    return (img01 - IMAGENET_MEAN) / IMAGENET_STD


def _two_region_image(h=16, w=16):
    """Left half red-ish, right half blue-ish."""
    img = np.zeros((h, w, 3), np.float32)
    img[:, : w // 2] = [0.9, 0.1, 0.1]
    img[:, w // 2:] = [0.1, 0.1, 0.9]
    return img


def test_blocked_kernel_matches_dense():
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(37, 5).astype(np.float32))
    vals = jnp.asarray(rng.randn(37, 4).astype(np.float32))
    # the blocked path rounds features to bf16 once (see
    # _blocked_kernel_apply); the oracle uses the same rounded values so
    # this test isolates the streaming/blocking logic
    feats_r = feats.astype(jnp.bfloat16).astype(jnp.float32)
    d2 = jnp.sum((feats_r[:, None] - feats_r[None]) ** 2, -1)
    expected = jnp.exp(-0.5 * d2) @ vals
    got = _blocked_kernel_apply(feats, vals, block=16,
                                message_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)
    # production default: bf16 message operands, f32 accumulation
    got_b = _blocked_kernel_apply(feats, vals, block=16)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(expected),
                               rtol=0, atol=5e-2)


def test_dense_crf_matches_naive_oracle():
    rng = np.random.RandomState(1)
    img01 = _two_region_image(12, 12)
    img = jnp.asarray(_normalize(img01))
    logits = jnp.asarray(rng.randn(12, 12, 3).astype(np.float32))
    cfg = CRFConfig(max_iter=3, block=32)
    out_fast = dense_crf(img, logits, cfg)
    out_naive = dense_crf_naive(img, logits, cfg)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_naive),
                               rtol=2e-3, atol=2e-4)


def test_crf_denoises_labels_along_color_edges():
    """Noisy unaries on a two-color image: CRF should recover the
    color-aligned segmentation (the reference's purpose at final eval)."""
    rng = np.random.RandomState(2)
    h = w = 24
    img01 = _two_region_image(h, w)
    img = jnp.asarray(_normalize(img01))

    true = np.zeros((h, w), np.int32)
    true[:, w // 2:] = 1
    # unary: correct class logit +1, but 25% of pixels flipped
    logits = np.full((h, w, 2), 0.0, np.float32)
    flip = rng.rand(h, w) < 0.25
    noisy = np.where(flip, 1 - true, true)
    logits[np.arange(h)[:, None], np.arange(w)[None], noisy] = 2.0

    before_acc = float(np.mean(noisy == true))
    out = dense_crf(img, jnp.asarray(logits), CRFConfig(max_iter=10, block=64))
    after = np.argmax(np.asarray(out), -1)
    after_acc = float(np.mean(after == true))
    assert after_acc > before_acc, (before_acc, after_acc)
    assert after_acc > 0.97, after_acc


def test_batched_crf_shapes():
    rng = np.random.RandomState(3)
    imgs = jnp.asarray(_normalize(
        rng.rand(2, 8, 8, 3).astype(np.float32)))
    lp = jnp.asarray(rng.randn(2, 8, 8, 5).astype(np.float32))
    out = batched_crf(imgs, lp, CRFConfig(max_iter=2, block=32))
    o = np.asarray(out)
    assert o.shape == (2, 8, 8, 5)
    np.testing.assert_allclose(o.sum(-1), 1.0, atol=1e-4)


def test_trainer_validate_crf():
    import sys
    sys.path.insert(0, "tests")
    from test_trainer import tiny_cfg
    from equss_tpu.data.synthetic import synthetic_batches
    from equss_tpu.parallel.mesh import make_mesh
    from equss_tpu.train.trainer import Trainer

    cfg = tiny_cfg()
    cfg["eval"]["crf"] = {"max_iter": 2, "block": 128}
    trainer = Trainer(cfg, mesh=make_mesh(1))
    ts = trainer.init_state(jax.random.PRNGKey(0), img_hw=(32, 32))
    val = trainer.validate_crf(
        ts, synthetic_batches(1, 1, batch_size=2, res=32, with_pos=False))
    for k in ("Cluster_mIoU", "Linear_Accuracy"):
        assert 0.0 <= val[k] <= 100.0
