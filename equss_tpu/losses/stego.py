"""STEGO correspondence-distillation loss, NHWC / TPU-native.

Re-implements STEGOLoss (/root/reference/model/loss.py:647-739): random
coordinate sampling via bilinear grid-sample, feature/code correlation
tensors, and pos-intra / pos-inter / neg-inter terms with shifts and
zero-clamping.  Differences from the reference are layout only (NHWC
instead of NCHW) and RNG (explicit JAX keys; distribution-equivalent, not
bit-equal, per SURVEY §7.4).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class StegoLossConfig:
    """Mirrors cfg['loss']['stego'] (config/pqgo_baseline.yaml:68-122)."""

    pos_intra_weight: float = 0.67
    pos_inter_weight: float = 0.25
    neg_inter_weight: float = 0.63
    pos_intra_shift: float = 0.08
    pos_inter_shift: float = 0.02
    neg_inter_shift: float = 0.66
    zero_clamp: bool = True
    pointwise: bool = True
    stabilize: bool = False
    feature_samples: int = 11
    neg_samples: int = 5
    #: MXU precision of the correlation einsums ("exact" = f32 6-pass,
    #: "bf16" = one-pass bf16 inputs with f32 accumulation).  The torch
    #: reference computes these einsums under fp16 autocast
    #: (loss.py:647-648 called from train.py:80's autocast region), so
    #: bf16 is the same fidelity class as the reference's AMP run —
    #: like the quantizer's assign_precision knob.
    correlation_precision: str = "exact"


#: grid_sample routes small queries to the bilinear-weight matmul
#: (MXU) and everything else to the 4-corner gather.  Per-item weight
#: matrix cap (q * H*W) and batched-transient cap (b * q * H*W, 64 MB
#: of f32 weights + ~4x one-hot build intermediates).  Module-level so
#: tests can force either path.
_MATMUL_MAX_QHW = 2 ** 22
_MATMUL_MAX_BQHW = 2 ** 24


def grid_sample(t: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear grid-sample, border padding, align_corners=True.

    Matches ``F.grid_sample(t, grid, padding_mode='border',
    align_corners=True)`` for NHWC input.

    t:      (b, H, W, C)
    coords: (b, hq, wq, 2) in [-1, 1]; coords[..., 0]=x (width),
            coords[..., 1]=y (height), torch convention.
    -> (b, hq, wq, C)
    """
    b, H, W, C = t.shape
    hq, wq = coords.shape[1], coords.shape[2]
    x = (coords[..., 0] + 1.0) * 0.5 * (W - 1)   # align_corners=True mapping
    y = (coords[..., 1] + 1.0) * 0.5 * (H - 1)
    x = jnp.clip(x, 0.0, W - 1)                   # border padding
    y = jnp.clip(y, 0.0, H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)

    if (hq * wq * H * W <= _MATMUL_MAX_QHW
            and b * hq * wq * H * W <= _MATMUL_MAX_BQHW):
        # one-hot bilinear-WEIGHT matmul: the four corner gathers (and,
        # in training, their backward scatter-adds) are DMA-bound on
        # TPU — profiled ~4.5 ms of the 41 ms pqgo b=16 train step
        # across STEGO's 14 sample calls; as a dense (q, H*W) weight
        # matrix times the flat map both directions ride the MXU.
        # Weight products (1-wx)(1-wy) etc. associate differently than
        # the reference's two-stage lerp, a ~1-ulp relative difference
        # (oracle test tolerance 1e-4).  Falls back to the gather form
        # when the per-item weight matrix is large (FLOPs no longer
        # cheaper than the DMA they replace) OR the batched matrix +
        # its one-hot build intermediates would be a big transient
        # (both gates: the second bounds the b axis the first ignores).
        q = hq * wq
        iota = jnp.arange(H * W)
        wmat = jnp.zeros((b, q, H * W), jnp.float32)
        for wc, yy, xx in (
            ((1 - wx) * (1 - wy), y0i, x0i),
            (wx * (1 - wy), y0i, x1i),
            ((1 - wx) * wy, y1i, x0i),
            (wx * wy, y1i, x1i),
        ):
            idx = (yy * W + xx).reshape(b, q, 1)
            # += accumulates coincident corners (border clamp), matching
            # the gather form's summed contributions
            wmat = wmat + wc.reshape(b, q, 1) * (iota[None, None] == idx)
        out = jnp.einsum("bqp,bpc->bqc", wmat, t.reshape(b, H * W, C),
                         preferred_element_type=jnp.float32,
                         precision="highest")
        return out.reshape(b, hq, wq, C)

    def gather(yy, xx):
        flat = t.reshape(b, H * W, C)
        idx = yy * W + xx                         # (b, hq, wq)
        return jnp.take_along_axis(
            flat, idx.reshape(b, -1, 1), axis=1
        ).reshape(*idx.shape, C)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _sample(t: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Reference ``sample`` permutes the two query axes before grid_sample
    (loss.py:655-656); replicate for distributional parity."""
    return grid_sample(t, coords.transpose(0, 2, 1, 3))


def _norm(t: jnp.ndarray) -> jnp.ndarray:
    """F.normalize over channel (last axis in NHWC), eps=1e-10 (loss.py:651)."""
    n = jnp.linalg.norm(t, axis=-1, keepdims=True)
    return t / jnp.maximum(n, 1e-10)


def tensor_correlation(
    a: jnp.ndarray, b: jnp.ndarray, precision: str = "exact"
) -> jnp.ndarray:
    """einsum('nchw,ncij->nhwij') in NHWC (loss.py:647-648).

    precision="exact": full-f32 MXU passes — correlation values feed
    shifted/clamped loss terms where bf16 rounding visibly moves the
    loss relative to the f32 oracle.  precision="bf16": one-pass bf16
    inputs with f32 accumulation — the fidelity class of the torch
    reference's fp16-autocast einsum (see StegoLossConfig)."""
    if precision == "bf16":
        return jnp.einsum(
            "nhwc,nijc->nhwij",
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    return jnp.einsum(
        "nhwc,nijc->nhwij", a, b,
        preferred_element_type=jnp.float32, precision="highest",
    )


def super_perm(key: jax.Array, size: int) -> jnp.ndarray:
    """Derangement-ish permutation (loss.py:659-663): shift fixed points."""
    perm = jax.random.permutation(key, size)
    ar = jnp.arange(size)
    perm = jnp.where(perm == ar, perm + 1, perm)
    return perm % size


def _helper(
    f1, f2, c1, c2, shift: float, cfg: StegoLossConfig
) -> jnp.ndarray:
    fd = tensor_correlation(_norm(f1), _norm(f2), cfg.correlation_precision)
    fd = jax.lax.stop_gradient(fd)      # backbone frozen (loss.py:678-680)
    if cfg.pointwise:
        old_mean = jnp.mean(fd)
        fd = fd - jnp.mean(fd, axis=(3, 4), keepdims=True)
        fd = fd - jnp.mean(fd) + old_mean
    cd = tensor_correlation(_norm(c1), _norm(c2), cfg.correlation_precision)
    min_val = 0.0 if cfg.zero_clamp else -9999.0
    if cfg.stabilize:
        cd_c = jnp.clip(cd, min_val, 0.8)
    else:
        cd_c = jnp.maximum(cd, min_val)
    return -cd_c * (fd - shift)


def stego_loss(
    key: jax.Array,
    orig_feats: jnp.ndarray,
    orig_feats_pos: jnp.ndarray,
    orig_code: jnp.ndarray,
    orig_code_pos: jnp.ndarray,
    cfg: StegoLossConfig,
    sample_override: Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """STEGO loss over NHWC feature/code maps (loss.py:701-739).

    sample_override: optional (coords1, coords2, perms) replacing the
    random draws — coords* (b, fs, fs, 2) in [-1, 1], perms
    (neg_samples, b) int.  This is the deterministic-replay seam the
    twin-training parity harness uses to feed BOTH frameworks identical
    sample coordinates (the reference draws them via torch.rand/randperm
    inside STEGOLoss.forward, loss.py:708-727)."""
    b = orig_feats.shape[0]
    fs = cfg.feature_samples
    k1, k2, k_neg = jax.random.split(key, 3)

    if sample_override is not None:
        coords1, coords2, perms_override = sample_override
    else:
        perms_override = None
        coords1 = jax.random.uniform(k1, (b, fs, fs, 2)) * 2.0 - 1.0
        coords2 = jax.random.uniform(k2, (b, fs, fs, 2)) * 2.0 - 1.0

    feats = _sample(orig_feats, coords1)
    code = _sample(orig_code, coords1)
    feats_pos = _sample(orig_feats_pos, coords2)
    code_pos = _sample(orig_code_pos, coords2)

    pos_intra = _helper(feats, feats, code, code, cfg.pos_intra_shift, cfg)
    pos_inter = _helper(feats, feats_pos, code, code_pos, cfg.pos_inter_shift, cfg)

    neg_terms = []
    keys = jax.random.split(k_neg, cfg.neg_samples)
    for i in range(cfg.neg_samples):        # static unroll (5 iters)
        perm = (perms_override[i] if perms_override is not None
                else super_perm(keys[i], b))
        feats_neg = _sample(orig_feats[perm], coords2)
        code_neg = _sample(orig_code[perm], coords2)
        neg_terms.append(
            _helper(feats, feats_neg, code, code_neg, cfg.neg_inter_shift, cfg)
        )
    neg_inter = jnp.concatenate(neg_terms, axis=0)

    return (
        cfg.pos_intra_weight * jnp.mean(pos_intra)
        + cfg.pos_inter_weight * jnp.mean(pos_inter)
        + cfg.neg_inter_weight * jnp.mean(neg_inter)
    )
