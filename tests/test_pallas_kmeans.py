"""Pallas PQ kernel (interpret mode on CPU) + JAX k-means."""
import numpy as np

import jax
import jax.numpy as jnp

from equss_tpu.ops.kmeans import kmeans
from equss_tpu.ops.pq_pallas import pq_assign_pallas
from equss_tpu.ops.quantizer import normalize_vectors, pairwise_sqdist, _gather_codewords


def test_pq_assign_pallas_matches_xla():
    n, M, K, d = 700, 4, 128, 16      # n not a tile multiple (pad path)
    z = jax.random.normal(jax.random.PRNGKey(1), (n, M, d))
    cb = jax.random.normal(jax.random.PRNGKey(2), (M, K, d))
    zn = normalize_vectors(z, "l2")
    cn = normalize_vectors(cb, "l2")

    idx_p, zn_p, zq_p = pq_assign_pallas(zn, cn, cb, tile_n=256)

    dist = pairwise_sqdist(zn, cn)
    idx_x = jnp.argmin(dist, -1).astype(jnp.int32)
    zq_x = _gather_codewords(cb, idx_x)

    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    np.testing.assert_allclose(np.asarray(zn_p), np.asarray(zn),
                               rtol=0, atol=0)   # normalize='none' copies
    np.testing.assert_allclose(np.asarray(zq_p), np.asarray(zq_x),
                               rtol=0, atol=0)   # exact 3-way bf16 gather


def test_pq_assign_pallas_in_kernel_normalize():
    n, M, K, d = 300, 8, 128, 16
    z = 3.0 * jax.random.normal(jax.random.PRNGKey(3), (n, M, d))
    cb = jax.random.normal(jax.random.PRNGKey(4), (M, K, d))

    for mode in ("l2", "z_norm"):
        zn = normalize_vectors(z, mode)
        cn = normalize_vectors(cb, mode)
        idx_p, zn_p, zq_p = pq_assign_pallas(z, cn, cb, normalize=mode)
        idx_x = jnp.argmin(pairwise_sqdist(zn, cn), -1).astype(jnp.int32)
        np.testing.assert_allclose(np.asarray(zn_p), np.asarray(zn),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))

    # z_trainable: stats supplied by the caller
    z_mean = 0.1 * jax.random.normal(jax.random.PRNGKey(5), (M, d))
    z_std = jnp.exp(0.1 * jax.random.normal(jax.random.PRNGKey(6), (M, d)))
    zn = (z - z_mean[None]) / (z_std[None] + 1e-5)
    c_mean = jnp.mean(cb, axis=1, keepdims=True)
    c_var = jnp.sum((cb - c_mean) ** 2, axis=1, keepdims=True) / (K - 1)
    cn = (cb - c_mean) / (jnp.sqrt(c_var) + 1e-5)
    idx_p, zn_p, _ = pq_assign_pallas(z, cn, cb, normalize="z_trainable",
                                      z_mean=z_mean, z_std=z_std)
    idx_x = jnp.argmin(pairwise_sqdist(zn, cn), -1).astype(jnp.int32)
    np.testing.assert_allclose(np.asarray(zn_p), np.asarray(zn),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))


def test_pq_assign_pallas_no_zq():
    n, M, K, d = 128, 4, 128, 8
    z = jax.random.normal(jax.random.PRNGKey(7), (n, M, d))
    cb = jax.random.normal(jax.random.PRNGKey(8), (M, K, d))
    out = pq_assign_pallas(z, cb, cb, want_zq=False)
    assert len(out) == 2
    idx_x = jnp.argmin(pairwise_sqdist(z, cb), -1).astype(jnp.int32)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(idx_x))


def test_pq_forward_pallas_flag_matches():
    from equss_tpu.ops.quantizer import PQConfig, pq_forward, pq_init
    import dataclasses

    cfg = PQConfig(num_pq=2, num_codebook=128, embed_dim=32,
                   vq_type="param", normalize="l2", use_pallas=True)
    params, state = pq_init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 32))

    zq_p, idx_p, aux_p, _ = pq_forward(z, params, state, cfg, training=False)
    cfg_x = dataclasses.replace(cfg, use_pallas=False)
    zq_x, idx_x, aux_x, _ = pq_forward(z, params, state, cfg_x, training=False)

    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    np.testing.assert_allclose(np.asarray(zq_p), np.asarray(zq_x),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(aux_p["vq-loss"]), float(aux_x["vq-loss"]),
                               rtol=1e-5)


def test_kmeans_recovers_clusters():
    rng = np.random.RandomState(0)
    centers = np.array([[0, 0], [10, 10], [-10, 10]], np.float32)
    x = np.concatenate([
        centers[i] + 0.1 * rng.randn(50, 2).astype(np.float32)
        for i in range(3)
    ])
    cents, assign = kmeans(jax.random.PRNGKey(0), jnp.asarray(x), k=3,
                           n_iters=20)
    cents = np.asarray(cents)
    # every true center has a learned centroid within 0.2
    for c in centers:
        assert np.min(np.linalg.norm(cents - c, axis=-1)) < 0.2
    a = np.asarray(assign)
    # points from the same blob share a label
    for i in range(3):
        blob = a[i * 50:(i + 1) * 50]
        assert (blob == blob[0]).all()


def test_kmeans_batched_subspaces():
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 100, 8))
    cents, assign = kmeans(jax.random.PRNGKey(2), x, k=10, n_iters=5)
    assert cents.shape == (4, 10, 8)
    assert assign.shape == (4, 100)


def test_pq_assign_pallas_tie_parity_near_duplicate_codewords():
    """Adversarial tie case: near-duplicate codewords + large-magnitude z.

    f32 rounding of z^2 + c^2 - 2zc collapses near-equal distances into
    ties (first index wins in both torch and jnp.argmin); a kernel that
    drops the z^2 row constant keeps the true order and flips
    assignments.  Regression test for the restored full formula."""
    rng = np.random.RandomState(42)
    n, M, K, d = 256, 8, 128, 16
    z = jnp.asarray(1000.0 * rng.randn(n, M, d).astype(np.float32))
    base = rng.randn(M, 1, d).astype(np.float32)
    cb = jnp.asarray(base + 1e-5 * rng.randn(M, K, d).astype(np.float32))

    idx_p, _, _ = pq_assign_pallas(z, cb, cb)
    idx_x = jnp.argmin(pairwise_sqdist(z, cb), -1).astype(jnp.int32)
    agree = np.mean(np.asarray(idx_p) == np.asarray(idx_x))
    # >= 99.5%: the full formula with matching add association leaves
    # only last-ulp ties whose internal sum orders (z^2 reduce, 16- vs
    # block-diagonal-128-term dot) the kernel cannot replicate exactly
    # (without the z^2 term this case mismatches 27% of assignments)
    assert agree >= 0.995, f"tie-break mismatch on {100 * (1 - agree):.1f}%"
