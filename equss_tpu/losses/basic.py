"""Pure-function loss library: JSD, entropy, InfoNCE, CLUB, margin
ranking, JSD-positive — functional equivalents of
/root/reference/model/loss.py (classes JSDLoss:508, EntropyLoss:490,
InfoNCELoss:95, CLUBLoss:375, MarginRankingLoss:31, JSDPosLoss:528),
written NHWC/last-axis-channel and with explicit PRNG keys.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _kl_batchmean_logtarget(log_input: jnp.ndarray, log_target: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.KLDivLoss(reduction='batchmean', log_target=True):
    sum(exp(t) * (t - i)) / batch_size."""
    t = jnp.exp(log_target)
    return jnp.sum(t * (log_target - log_input)) / log_input.shape[0]


def jsd_loss(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Jensen-Shannon divergence between prob rows (loss.py:508-525).

    NB the reference's ``(0.5 * (p + q).add(1e-6)).log()`` binds the
    eps INSIDE the halving — m = log(0.5*(p+q) + 5e-7), not + 1e-6."""
    log_m = jnp.log(0.5 * ((p + q) + 1e-6))
    log_p = jnp.log(p + 1e-6)
    log_q = jnp.log(q + 1e-6)
    return 0.5 * (
        _kl_batchmean_logtarget(log_m, log_p)
        + _kl_batchmean_logtarget(log_m, log_q)
    )


def entropy_loss(p: jnp.ndarray, q: jnp.ndarray = None) -> jnp.ndarray:
    """Negative batch-entropy of mean assignment (loss.py:490-505).
    Only ``p`` is used, like the reference."""
    avg_p = jnp.mean(p.reshape(-1, p.shape[-1]), axis=0)
    avg_entropy = jnp.sum(-avg_p * jnp.log(avg_p + 1e-8), axis=-1)
    return -avg_entropy


def _normalize(x: jnp.ndarray, mode: str) -> jnp.ndarray:
    if mode == "l2":
        n = jnp.linalg.norm(x, axis=-1, keepdims=True)
        return x / jnp.maximum(n, 1e-12)
    if mode == "z_norm":
        mean = jnp.mean(x, axis=1, keepdims=True)
        d = x.shape[1]
        var = jnp.sum((x - mean) ** 2, axis=1, keepdims=True) / max(d - 1, 1)
        return (x - mean) / (jnp.sqrt(var) + 1e-5)
    if mode == "none":
        return x
    raise ValueError(f"Unsupported normalize type {mode}")


def info_nce_loss(
    key: jax.Array,
    x1: jnp.ndarray,
    x2: jnp.ndarray,
    *,
    normalize: str = "l2",
    temperature: float = 1.0,
    neg_sample: int = 100,
    cal_type: str = "random",
    reduction: str = "mean",
) -> jnp.ndarray:
    """InfoNCE with random / distance / cosine negative mining
    (loss.py:95-203).  x1, x2: (b, h, w, d) NHWC.
    """
    b = x1.shape[0]
    d = x1.shape[-1]
    flat_x1 = x1.reshape(-1, d)
    flat_x2 = x2.reshape(-1, d)
    n = flat_x1.shape[0]

    if cal_type == "random":
        idx = jax.random.randint(key, (n, neg_sample), 0, n)
        neg = flat_x1[idx]                                   # (n, k, d)
    elif cal_type == "distance":
        # farthest-by-L2 negatives (loss.py:10-28, topk largest cdist)
        d2 = (
            jnp.sum(flat_x1**2, -1)[:, None]
            + jnp.sum(flat_x1**2, -1)[None]
            - 2.0 * flat_x1 @ flat_x1.T
        )
        _, idx = jax.lax.top_k(d2, neg_sample)
        neg = flat_x1[idx]
    elif cal_type == "cosine":
        # smallest cosine-similarity negatives (loss.py:123-135)
        x_norm = _normalize(flat_x1, "l2")
        sim = x_norm @ x_norm.T
        _, idx = jax.lax.top_k(-sim, neg_sample)
        neg = flat_x1[idx]
    else:
        raise ValueError(f"No support {cal_type}")

    x1n = _normalize(flat_x1, normalize)
    x2n = _normalize(flat_x2, normalize)
    negn = _normalize(neg, normalize)

    pos_sim = jnp.exp(x1n * x2n / temperature)               # (n, d)
    neg_sim = jnp.exp(
        jnp.einsum("nd,nkd->nk", x1n, negn,
                   preferred_element_type=jnp.float32) / temperature
    )
    positive = jnp.sum(pos_sim, axis=1)
    negative = jnp.sum(neg_sim, axis=1)
    loss = -(jnp.log(positive) - jnp.log(positive + negative))
    if reduction == "sum":
        return jnp.sum(loss)
    return jnp.mean(loss)


def club_loss(
    x: jnp.ndarray,
    p_mu: jnp.ndarray,
    p_logvar: jnp.ndarray,
    *,
    chunks: int = 28,
) -> jnp.ndarray:
    """CLUB mutual-information upper bound (loss.py:375-446).

    x: (b, h, w, d) NHWC; p_mu/p_logvar: (bhw, d).
    positive - E_j[negative] with the negative expectation chunked via
    lax.map to bound the (n, n, d) intermediate, mirroring the
    reference's chunked loop (loss.py:400-436).
    """
    d = x.shape[-1]
    flat_x = x.reshape(-1, d)
    n = flat_x.shape[0]
    inv_var = jnp.exp(-p_logvar)

    positive = -0.5 * jnp.sum((flat_x - p_mu) ** 2 * inv_var, axis=-1)   # (n,)

    chunk = max(n // chunks, 1)
    n_chunks = n // chunk
    mu_c = p_mu[: n_chunks * chunk].reshape(n_chunks, chunk, d)
    lv_c = inv_var[: n_chunks * chunk].reshape(n_chunks, chunk, d)

    def neg_chunk(args):
        mu_i, ivar_i = args            # (chunk, d)
        diff = flat_x[None] - mu_i[:, None]                  # (chunk, n, d)
        return -0.5 * jnp.mean(
            jnp.sum(diff**2 * ivar_i[:, None], axis=-1), axis=-1
        )                                                    # (chunk,)

    negative = jax.lax.map(neg_chunk, (mu_c, lv_c))          # (n_chunks, chunk)
    pos_c = positive[: n_chunks * chunk].reshape(n_chunks, chunk)
    return jnp.mean(jnp.mean(pos_c - negative, axis=-1))


def margin_ranking_loss(ori: jnp.ndarray, aug: jnp.ndarray) -> jnp.ndarray:
    """Margin ranking on correlation matrices (loss.py:31-92).

    ori/aug: (b, h, w, d) NHWC.  margin=0 MarginRankingLoss:
    mean(max(0, -target * (x1 - x2))).
    """
    d = ori.shape[-1]

    def corr(x):
        flat = _normalize(x.reshape(-1, d), "l2")
        return flat @ flat.T

    ori_corr = corr(ori)
    aug_corr = corr(aug)

    r1 = ori_corr
    r2 = jnp.roll(r1, 1, axis=1)
    t1 = jax.lax.stop_gradient(aug_corr)
    t2 = jnp.roll(t1, 1, axis=1)
    target = jnp.sign(t1 - t2)
    margin = jnp.abs(t1 - t2)
    target_nonzero = jnp.where(target == 0, 1.0, target)
    r2 = r2 + margin / target_nonzero
    return jnp.mean(jnp.maximum(0.0, -target * (r1 - r2)))


def jsd_pos_loss(
    key: jax.Array,
    z: jnp.ndarray,
    z_pos: jnp.ndarray,
    z_dis: jnp.ndarray,
    z_pos_dis: jnp.ndarray,
    *,
    num_query: int = 3,
    num_pos: int = 10,
) -> jnp.ndarray:
    """Query/top-k-attention positive JSD (loss.py:528-644).

    z, z_pos: (b, h, w, d); z_dis, z_pos_dis: (b, h, w, num_pq).
    """
    b, h, w, d = z.shape
    num_pq = z_dis.shape[-1]
    hw = h * w
    zf = z.reshape(b, hw, d)
    zp = z_pos.reshape(b, hw, d)
    zd = z_dis.reshape(b, hw, num_pq)
    zpd = z_pos_dis.reshape(b, hw, num_pq)

    rand_q = jax.random.randint(key, (b, num_query), 0, hw)
    sample_z = jnp.take_along_axis(zf, rand_q[..., None], axis=1)     # (b, q, d)
    sample_zd = jnp.take_along_axis(zd, rand_q[..., None], axis=1)    # (b, q, pq)

    attn = jnp.einsum("bsc,bdc->bsd", sample_z, zp,
                      preferred_element_type=jnp.float32)             # (b, q, hw)
    attn = jax.lax.stop_gradient(attn)
    _, top_idx = jax.lax.top_k(attn, num_pos)                         # (b, q, k)

    zpd_sel = jnp.take_along_axis(
        zpd[:, None].repeat(num_query, 1),                            # (b, q, hw, pq)
        top_idx[..., None],
        axis=2,
    )                                                                 # (b, q, k, pq)
    p = jnp.broadcast_to(sample_zd[:, :, None, :], zpd_sel.shape)

    pf = p.reshape(-1, num_pq)
    qf = zpd_sel.reshape(-1, num_pq)
    # KLDivLoss(reduction='batchmean'), NOT log_target (loss.py:534,546-549)
    log_m = jnp.log(jnp.clip(0.5 * (pf + qf), 1e-7, 1.0))

    def kl(log_input, target):
        return jnp.sum(target * (jnp.log(jnp.maximum(target, 1e-30)) - log_input)) / log_input.shape[0]

    return 0.5 * (kl(log_m, pf) + kl(log_m, qf))


def proxy_loss(
    key: jax.Array,
    queue: jnp.ndarray,           # (n_cluster, queue_size, d)
    centroids: jnp.ndarray,       # (n_cluster, d)
    *,
    temperature: float = 1.0,
    num_queries: int = 50,
    num_neg: int = 256,
    sample_override=None,
) -> jnp.ndarray:
    """Proxy InfoNCE over per-cluster memory queues (loss.py:206-265):
    for each cluster, random queries from its queue must score their
    centroid above random negatives drawn from the other clusters'
    queues.  Vectorized over clusters (the reference loops).

    sample_override: optional (q_idx (C, num_queries), neg_idx
    (C, num_queries*num_neg) into the (C-1)*Q other-cluster pool) —
    the twin-parity injection seam (the reference draws with
    torch.randint, loss.py:235,256)."""
    n_cluster, q_size, d = queue.shape
    k_q, k_n = jax.random.split(key)

    if sample_override is not None:
        q_idx, neg_idx = (jnp.asarray(sample_override[0]),
                          jnp.asarray(sample_override[1]))
    else:
        q_idx = jax.random.randint(
            k_q, (n_cluster, num_queries), 0, q_size)
        neg_idx = jax.random.randint(
            k_n, (n_cluster, num_queries * num_neg), 0,
            (n_cluster - 1) * q_size)
    queries = jnp.take_along_axis(queue, q_idx[..., None], axis=1)

    # negatives: global pool with own-cluster entries masked by resampling
    flat = queue.reshape(n_cluster * q_size, d)
    # skip over the own cluster's contiguous block
    own_start = (jnp.arange(n_cluster) * q_size)[:, None]
    neg_idx = jnp.where(neg_idx >= own_start, neg_idx + q_size, neg_idx)
    negs = flat[neg_idx].reshape(n_cluster, num_queries, num_neg, d)

    cands = jnp.concatenate(
        [jnp.broadcast_to(centroids[:, None, None, :],
                          (n_cluster, num_queries, 1, d)), negs], axis=2)

    def l2n(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                               1e-12)

    logits = jnp.einsum("cqd,cqkd->cqk", l2n(queries), l2n(cands),
                        preferred_element_type=jnp.float32) / temperature
    log_p = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(log_p[..., 0])
