"""Visualization + analysis utilities."""
import os

import numpy as np
from PIL import Image

from equss_tpu.analysis.codebook import (
    codebook_usage_heatmap,
    dino_correspondence,
    inter_class_similarity,
    per_class_codeword_entropy,
)
from equss_tpu.eval.metrics import UnSegMetrics
from equss_tpu.utils.visualize import pq_visualization, visualization


def test_visualization_writes_pngs(tmp_path):
    rng = np.random.RandomState(0)
    data = {
        "linear_preds": rng.randint(0, 4, (3, 8, 8)),
        "cluster_preds": rng.randint(0, 4, (3, 8, 8)),
        "label": rng.randint(-1, 4, (3, 8, 8)),
    }
    m = UnSegMetrics(4, 0, compute_hungarian=True)
    m.update(data["cluster_preds"], data["label"])
    m.compute()
    visualization(str(tmp_path), "cocostuff27", data, metrics_cluster=m)
    for sub in ("linear", "cluster", "label"):
        files = os.listdir(tmp_path / sub)
        assert len(files) == 3
        img = Image.open(tmp_path / sub / "0.png")
        assert img.size == (8, 8)


def test_pq_visualization(tmp_path):
    rng = np.random.RandomState(1)
    idx = rng.randint(0, 16, (2, 4, 4, 3))
    pq_visualization(str(tmp_path), idx, subspaces=[0, 2], upsample=8)
    img = Image.open(tmp_path / "pq_0" / "0.png")
    assert img.size == (32, 32)
    assert not (tmp_path / "pq_1").exists()


def test_per_class_entropy_and_usage():
    rng = np.random.RandomState(2)
    idx = rng.randint(0, 8, (4, 6, 6, 2))
    labels = rng.randint(0, 3, (4, 6, 6))
    out = per_class_codeword_entropy(idx, labels, 3, 8)
    assert out["entropy"].shape == (3, 2)
    assert (out["entropy"] >= 0).all()
    # a class using exactly one codeword has zero entropy
    idx_const = np.zeros((1, 4, 4, 1), np.int64)
    lab_const = np.zeros((1, 4, 4), np.int64)
    out = per_class_codeword_entropy(idx_const, lab_const, 1, 8)
    assert out["entropy"][0, 0] == 0.0

    usage = codebook_usage_heatmap(idx, 8)
    assert usage.shape == (2, 8)
    assert usage.sum() == 4 * 36 * 2


def test_inter_class_similarity_and_correspondence():
    rng = np.random.RandomState(3)
    feats = rng.randn(2, 4, 4, 8).astype(np.float32)
    labels = rng.randint(0, 3, (2, 4, 4))
    sim = inter_class_similarity(feats, labels, 3)
    assert sim.shape == (3, 3)
    np.testing.assert_allclose(np.diag(sim), 1.0, atol=1e-5)

    corr = dino_correspondence(feats[0], feats[1], (1, 2))
    assert corr.shape == (4, 4)
    assert np.abs(corr).max() <= 1.0 + 1e-5
