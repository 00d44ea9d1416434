"""SwAV-style cluster loss with distributed Sinkhorn-Knopp.

Functional equivalent of ClusterLoss (/root/reference/model/loss.py:267-340).
The reference's torch.distributed all_reduce calls become optional
``lax.psum`` over a named mesh axis; under pjit/GSPMD with globally-shaped
inputs no explicit collective is needed at all.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def distributed_sinkhorn(
    out: jnp.ndarray,
    *,
    epsilon: float,
    n_iters: int = 3,
    axis_name: Optional[str] = None,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sinkhorn normalization of assignment scores (loss.py:279-308).

    out: (n, K) scores.  Returns the (n, K) soft assignment.

    valid: optional (n,) bool mask.  Masked samples contribute nothing to
    the transport (their Q column is zeroed and they are excluded from the
    sample count B); their returned assignment rows are zero.  This keeps
    shapes static under jit when a sample queue is only partially filled —
    the reference's queue is a None-until-active torch tensor
    (loss.py:310-334), which cannot trace.
    """
    Q = jnp.exp(out / epsilon).T                    # (K, n)
    if valid is not None:
        Q = Q * valid[None, :].astype(Q.dtype)
    if valid is None:
        world = jax.lax.psum(1, axis_name) if axis_name is not None else 1
        B = Q.shape[1] * world
    else:
        # psum the actual per-shard valid counts (NOT local * world):
        # correct even if shards ever carry divergent masks
        B = jnp.sum(valid.astype(Q.dtype))
        if axis_name is not None:
            B = jax.lax.psum(B, axis_name)
    K = Q.shape[0]

    sum_Q = jnp.sum(Q)
    if axis_name is not None:
        sum_Q = jax.lax.psum(sum_Q, axis_name)
    Q = Q / sum_Q

    tiny = jnp.finfo(Q.dtype).tiny

    def body(Q, _):
        rows = jnp.sum(Q, axis=1, keepdims=True)
        if axis_name is not None:
            rows = jax.lax.psum(rows, axis_name)
        Q = Q / jnp.maximum(rows, tiny) / K
        cols = jnp.sum(Q, axis=0, keepdims=True)
        Q = Q / jnp.maximum(cols, tiny) / B
        return Q, None

    Q, _ = jax.lax.scan(body, Q, None, length=n_iters)
    return (Q * B).T


def cluster_loss(
    out_prototypes: jnp.ndarray,
    *,
    temperature: float,
    epsilon: float,
    queue_scores: Optional[jnp.ndarray] = None,
    queue_valid: Optional[jnp.ndarray] = None,
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Cross-entropy to Sinkhorn targets (loss.py:310-340).

    out_prototypes: (n, K) prototype scores; queue_scores: optional
    (queue_len, K) extra scores prepended for the Sinkhorn (the caller
    owns queue bookkeeping, kept functional here); queue_valid: optional
    (queue_len,) bool mask of live queue slots (see distributed_sinkhorn).
    """
    n = out_prototypes.shape[0]
    scores = jax.lax.stop_gradient(out_prototypes)
    valid = None
    if queue_scores is not None:
        scores = jnp.concatenate([queue_scores, scores], axis=0)
        if queue_valid is not None:
            valid = jnp.concatenate(
                [queue_valid.astype(bool),
                 jnp.ones((n,), bool)], axis=0)
    q = distributed_sinkhorn(
        scores, epsilon=epsilon, axis_name=axis_name, valid=valid)[-n:]
    q = jax.lax.stop_gradient(q)
    x = out_prototypes / temperature
    return -0.5 * jnp.mean(jnp.sum(q * jax.nn.log_softmax(x, axis=1), axis=1))
