"""Evaluation probes: linear probe + cluster lookup.

Functional equivalent of UnSegEvaluator / ClusterLookup
(/root/reference/model/evaluator.py:11-111).

TPU-first deviation (documented): probes run at FEATURE resolution and
the (num_classes)-channel logit maps are bilinearly upsampled to label
resolution, instead of upsampling the 1024-channel feature map first
(evaluator.py:53-54) — the upsample moves 27 channels instead of 1024,
~38x less resize bandwidth.  The linear probe is affine, so its
predictions are bit-identical either way.  The cluster probe L2-
normalizes per pixel, which does not commute with interpolation, so
cluster predictions can differ on a <1% boundary band (tested); set
``probe_res='label'`` for the reference's exact order and loss
weighting.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from equss_tpu.ops.resize import resize2d


@dataclasses.dataclass(frozen=True)
class EvaluatorConfig:
    embed_dim: int
    num_classes: int
    extra_classes: int = 0
    # cluster-probe assignment sharpness for the TRAINING loss: the
    # reference's standard eval path passes alpha=None — HARD one-hot
    # assignment, gradients flow only through the inner products
    # (evaluator.py:70, ClusterLookup at :100-106).  The CRF branch's
    # log-probs always use alpha=2 (evaluator.py:58), independent of
    # this.  Set a float (e.g. 2.0) for soft-assignment training.
    alpha: Optional[float] = None
    probe_res: str = "feat"     # 'feat' (fast) | 'label' (reference-exact)
    with_cluster: bool = True   # False: supervised linear-only (sl_train.py)


class LinearProbe(nn.Module):
    """1x1-conv linear probe (evaluator.py:22)."""

    num_classes: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.num_classes, name="linear")(x)


class ClusterProbe(nn.Module):
    """ClusterLookup (evaluator.py:85-111): cosine cluster centroids."""

    num_clusters: int
    dim: int

    def setup(self):
        self.clusters = self.param(
            "clusters", nn.initializers.normal(1.0),
            (self.num_clusters, self.dim), jnp.float32,
        )

    def inner_products(self, x: jnp.ndarray) -> jnp.ndarray:
        """Normalized inner products (evaluator.py:95-98)."""
        normed_clusters = self.clusters / jnp.maximum(
            jnp.linalg.norm(self.clusters, axis=1, keepdims=True), 1e-12)
        normed_feat = x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        return jnp.einsum("bhwc,nc->bhwn", normed_feat, normed_clusters,
                          preferred_element_type=jnp.float32)

    def __call__(
        self, x: jnp.ndarray, alpha: Optional[float] = 2.0,
        log_probs: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        inner = self.inner_products(x)
        if alpha is None:
            probs = jax.nn.one_hot(jnp.argmax(inner, axis=-1),
                                   self.num_clusters, dtype=jnp.float32)
        else:
            probs = jax.nn.softmax(inner * alpha, axis=-1)
        loss = -jnp.mean(jnp.sum(probs * inner, axis=-1))
        if log_probs:
            if alpha is None:
                # the reference only combines log-prob output (its CRF
                # branch) with the softmax path (evaluator.py:99-104);
                # alpha=None means hard assignment, which has no finite
                # log-probs — fail at trace time instead of `inner*None`
                raise ValueError(
                    "ClusterProbe(log_probs=True) requires a finite "
                    "alpha; alpha=None selects the hard-assignment "
                    "branch (evaluator.py:99-104)")
            return loss, jax.nn.log_softmax(inner * alpha, axis=-1)
        return loss, probs


def masked_cross_entropy(
    logits: jnp.ndarray, label: jnp.ndarray, num_classes: int
) -> jnp.ndarray:
    """Masked CE over valid labels (evaluator.py:72-80).

    logits: (..., C); label: (...) int32 (may be -1 / >= C for ignore).
    """
    mask = (label >= 0) & (label < num_classes)
    safe_label = jnp.where(mask, label, 0)
    log_p = jax.nn.log_softmax(logits, axis=-1)
    # one-hot multiply-sum instead of take_along_axis: the per-pixel
    # class gather at label resolution is DMA-bound on TPU (profiled
    # 11.8 ms of a 64 ms pqgo train step at b=16); the one-hot product
    # fuses into a single elementwise+reduce pass and selects exactly
    # the same element (multiply by 1.0 is exact)
    ce = -jnp.sum(log_p * jax.nn.one_hot(safe_label, num_classes,
                                         dtype=log_p.dtype), axis=-1)
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, ce, 0.0)) / denom


class Evaluator(nn.Module):
    """UnSegEvaluator: linear probe + cluster probe over (detached)
    features, losses + upsampled predictions (evaluator.py:46-82).

    __call__(out, label) -> dict with linear_loss, cluster_loss,
    linear_preds, cluster_preds (at label resolution), and the
    label-res log-probs needed by the CRF branch.
    """

    cfg: EvaluatorConfig

    @nn.compact
    def __call__(
        self,
        out: jnp.ndarray,                 # (b, h, w, D) detached features
        label: jnp.ndarray,               # (b, H, W) int
        *,
        want_log_probs: bool = False,     # for CRF refinement
    ) -> Dict[str, Any]:
        cfg = self.cfg
        label_hw = label.shape[-2:]

        if cfg.probe_res == "label" and out.shape[1:3] != label_hw:
            out = resize2d(out, label_hw, "bilinear", align_corners=False)

        linear_logits = LinearProbe(cfg.num_classes, name="linear_probe")(out)
        cluster_inner = None
        cluster_loss = None
        probe = None
        if cfg.with_cluster:
            probe = ClusterProbe(cfg.num_classes + cfg.extra_classes,
                                 out.shape[-1], name="cluster_probe")
            cluster_loss, _ = probe(out, alpha=cfg.alpha)
            # both probes are affine in the features, so upsampling the
            # LOGITS (inner products) then softmaxing matches the
            # reference's upsample-features-then-probe exactly for preds
            # AND for the CRF log-probs (evaluator.py:53-58)
            cluster_inner = probe.inner_products(out)

        if linear_logits.shape[1:3] != label_hw:
            linear_logits = resize2d(linear_logits, label_hw, "bilinear",
                                     align_corners=False)
            if cluster_inner is not None:
                cluster_inner = resize2d(cluster_inner, label_hw, "bilinear",
                                         align_corners=False)

        linear_preds = jnp.argmax(linear_logits, axis=-1).astype(jnp.int32)
        linear_loss = masked_cross_entropy(linear_logits, label, cfg.num_classes)

        result: Dict[str, Any] = {
            "linear_loss": linear_loss,
            "linear_preds": linear_preds,
        }
        if cluster_inner is not None:
            result["cluster_loss"] = cluster_loss
            result["cluster_preds"] = jnp.argmax(
                cluster_inner, axis=-1).astype(jnp.int32)
        if want_log_probs:
            result["linear_log_probs"] = jax.nn.log_softmax(linear_logits, axis=-1)
            if cluster_inner is not None:
                # CRF log-probs always use alpha=2 (evaluator.py:58)
                result["cluster_log_probs"] = jax.nn.log_softmax(
                    cluster_inner * 2.0, axis=-1)
        return result
