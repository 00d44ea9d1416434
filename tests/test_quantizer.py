"""Quantizer ops vs. a PyTorch oracle.

The oracle re-derives the published VQ/PQ math (pairwise L2 via
x^2+c^2-2xc^T, first-min argmin, straight-through, EMA with Laplace
smoothing) directly with torch ops, and the JAX implementation must match
to tight tolerance — including bit-identical codeword assignments, the
north-star parity requirement (BASELINE.md)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from equss_tpu.ops.quantizer import (
    PQConfig,
    pq_init,
    pq_forward,
    pairwise_sqdist,
    normalize_vectors,
    ema_codebook_update,
    ema_jsd_entropy,
)


def torch_normalize(x, mode):
    if mode == "none":
        return x
    if mode == "l2":
        return F.normalize(x, dim=-1)
    if mode == "z_norm":
        std, mean = torch.std_mean(x, dim=-1, keepdim=True)
        return (x - mean) / (std + 1e-5)
    raise ValueError(mode)


def oracle_assign(z, codebook, mode):
    """z: (n, M, d), codebook: (M, K, d) -> indices (n, M), dist (n, M, K)."""
    zn = torch_normalize(z, mode)
    cn = torch_normalize(codebook, mode)
    d = (
        (zn**2).sum(-1).unsqueeze(-1)
        + (cn**2).sum(-1).unsqueeze(0)
        - 2 * torch.einsum("nmd,mkd->nmk", zn, cn)
    )
    return d.argmin(-1), d, zn, cn


@pytest.mark.parametrize("mode", ["none", "l2", "z_norm"])
def test_assignment_bit_identical(mode):
    rng = np.random.RandomState(0)
    n, M, K, d = 97, 4, 16, 8
    z = rng.randn(n, M, d).astype(np.float32)
    cb = rng.randn(M, K, d).astype(np.float32)

    idx_t, dist_t, _, _ = oracle_assign(torch.from_numpy(z), torch.from_numpy(cb), mode)

    zj = normalize_vectors(jnp.asarray(z), mode)
    cj = normalize_vectors(jnp.asarray(cb), mode)
    dist_j = pairwise_sqdist(zj, cj)
    idx_j = jnp.argmin(dist_j, axis=-1)

    np.testing.assert_allclose(np.asarray(dist_j), dist_t.numpy(), rtol=1e-5, atol=1e-5)
    # bit-identical assignments (north star)
    np.testing.assert_array_equal(np.asarray(idx_j), idx_t.numpy())


@pytest.mark.parametrize("mode", ["none", "l2", "z_norm"])
def test_param_forward_losses(mode):
    cfg = PQConfig(num_pq=4, num_codebook=16, embed_dim=32, vq_type="param",
                   normalize=mode, beta=0.25, book=1.0)
    key = jax.random.PRNGKey(0)
    params, state = pq_init(key, cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 5, 32))

    z_q, idx, aux, new_state = pq_forward(z, params, state, cfg, training=True,
                                          rng=jax.random.PRNGKey(2))
    assert z_q.shape == z.shape
    assert idx.shape == (2, 5, 5, 4)

    # torch oracle for the losses
    zt = torch.from_numpy(np.asarray(z)).reshape(-1, 4, 8)
    cbt = torch.from_numpy(np.asarray(params["codebook"]))
    idx_t, _, zn_t, _ = oracle_assign(zt, cbt, mode)
    z_q_t = torch.stack([cbt[m][idx_t[:, m]] for m in range(4)], dim=1)
    commitment = F.mse_loss(zn_t, z_q_t)
    codebook_l = F.mse_loss(z_q_t, zn_t)
    expected = 1.0 * codebook_l + 0.25 * commitment
    np.testing.assert_allclose(float(aux["vq-loss"]), float(expected), rtol=1e-5)

    # straight-through: value equals gathered codeword reshaped? No —
    # value equals z_norm + (z_q - z_norm) = raw codeword values.
    np.testing.assert_allclose(
        np.asarray(z_q).reshape(-1, 4, 8), z_q_t.numpy(), rtol=1e-5, atol=1e-6
    )


def test_ste_gradient_identity():
    """d z_q / d z == d z_norm / d z for the straight-through path."""
    cfg = PQConfig(num_pq=2, num_codebook=8, embed_dim=8, vq_type="param",
                   normalize="none")
    params, state = pq_init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2, 8))

    def f(z):
        z_q, _, _, _ = pq_forward(z, params, state, cfg, training=False)
        return jnp.sum(z_q)

    g = jax.grad(f)(z)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(g), atol=1e-6)


def test_ema_update_matches_oracle():
    cfg = PQConfig(num_pq=2, num_codebook=8, embed_dim=16, vq_type="ema",
                   normalize="none", decay=0.99, eps=1e-5)
    params, state = pq_init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 3, 16))

    z_q, idx, aux, new_state = pq_forward(z, params, state, cfg, training=True,
                                          rng=jax.random.PRNGKey(2))

    # torch oracle
    M, K, d = 2, 8, 8
    zt = torch.from_numpy(np.asarray(z)).reshape(-1, M, d)
    w = torch.from_numpy(np.asarray(state["ema_weight"]))
    idx_t, _, _, _ = oracle_assign(zt, w, "none")
    np.testing.assert_array_equal(np.asarray(idx).reshape(-1, M), idx_t.numpy())

    for m in range(M):
        one_hot = F.one_hot(idx_t[:, m], K).float()
        count = one_hot.sum(0)
        vec_sum = one_hot.t() @ zt[:, m]
        ema_count = 0.99 * torch.zeros(K) + 0.01 * count
        ema_avg = 0.99 * w[m] + 0.01 * vec_sum
        n = ema_count.sum()
        smoothed = (ema_count + 1e-5) / (n + K * 1e-5) * n
        w_new = ema_avg / smoothed.unsqueeze(1)
        np.testing.assert_allclose(
            np.asarray(new_state["ema_weight"][m]), w_new.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(new_state["ema_count"][m]), ema_count.numpy(), rtol=1e-5
        )


def test_weighted_sum_path():
    cfg = PQConfig(num_pq=2, num_codebook=8, embed_dim=16, vq_type="param",
                   normalize="none", use_weighted_sum=True, jsd_ts=0.5)
    params, state = pq_init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2, 16))
    z_q, idx, aux, _ = pq_forward(z, params, state, cfg, training=False)

    prob = np.asarray(aux["distance_prob"]).reshape(-1, 2, 8)
    cb = np.asarray(params["codebook"])
    expected = np.einsum("nmk,mkd->nmd", prob, cb)
    np.testing.assert_allclose(
        np.asarray(z_q).reshape(-1, 2, 8), expected, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(prob.sum(-1), 1.0, rtol=1e-5)


def test_restart_replaces_dead_codes():
    cfg = PQConfig(num_pq=1, num_codebook=8, embed_dim=4, vq_type="ema",
                   normalize="none", use_restart=True)
    params, state = pq_init(jax.random.PRNGKey(0), cfg)
    # huge offset so only one codeword ever wins -> 7 dead codes
    state = dict(state, ema_weight=state["ema_weight"].at[0, 0].set(1000.0))
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 2, 4)) + 1000.0

    _, idx, _, new_state = pq_forward(z, params, state, cfg, training=True,
                                      rng=jax.random.PRNGKey(2))
    assert np.all(np.asarray(idx) == 0)
    # dead entries must now be near batch vectors (~1000), not ~uniform(0)
    w = np.asarray(new_state["ema_weight"])
    assert np.all(np.abs(w[0, 1:]) > 100.0)


def test_jsd_entropy_match_torch():
    rng = np.random.RandomState(3)
    n, M, K = 50, 3, 7
    a = rng.rand(n, M, K).astype(np.float32)
    b = rng.rand(n, M, K).astype(np.float32)
    a /= a.sum(-1, keepdims=True)
    b /= b.sum(-1, keepdims=True)

    jsd_j, ent_j = ema_jsd_entropy(jnp.asarray(a), jnp.asarray(b))

    kl = torch.nn.KLDivLoss(reduction="batchmean", log_target=True)
    jsd_ref, ent_ref = 0.0, 0.0
    for m in range(M):
        p = torch.from_numpy(a[:, m])
        q = torch.from_numpy(b[:, m])
        mm = (0.5 * (p + q) + 1e-6).log()
        jsd_ref += 0.5 * (kl(mm, (p + 1e-6).log()) + kl(mm, (q + 1e-6).log()))
        avg_p = p.mean(0)
        ent_ref += -(-avg_p * (avg_p + 1e-8).log()).sum()
    np.testing.assert_allclose(float(jsd_j), float(jsd_ref) / M, rtol=1e-4)
    np.testing.assert_allclose(float(ent_j), float(ent_ref) / M, rtol=1e-4)


def test_sharded_stats_match_single_device():
    """VQ statistics under a data-sharded mesh == single-device run."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    cfg = PQConfig(num_pq=2, num_codebook=8, embed_dim=16, vq_type="ema",
                   normalize="l2")
    params, state = pq_init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (8, 2, 2, 16))

    step = jax.jit(lambda z: pq_forward(z, params, state, cfg, training=True,
                                        rng=jax.random.PRNGKey(2)))
    _, idx_ref, _, st_ref = step(z)

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    z_sh = jax.device_put(z, NamedSharding(mesh, P("data")))
    _, idx_sh, _, st_sh = step(z_sh)

    np.testing.assert_array_equal(np.asarray(idx_ref), np.asarray(idx_sh))
    np.testing.assert_allclose(
        np.asarray(st_ref["ema_weight"]), np.asarray(st_sh["ema_weight"]),
        rtol=1e-4, atol=1e-5,
    )


def test_z_trainable_normalization():
    cfg = PQConfig(num_pq=2, num_codebook=8, embed_dim=16, vq_type="param",
                   normalize="z_trainable")
    params, state = pq_init(jax.random.PRNGKey(0), cfg)
    assert params["z_mean"].shape == (2, 8)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 3, 16))
    z_q, idx, aux, _ = pq_forward(z, params, state, cfg, training=False)
    assert np.isfinite(float(aux["vq-loss"]))

    # z_mean/z_log_var receive gradients through the commitment loss
    def f(p):
        _, _, aux, _ = pq_forward(z, p, state, cfg, training=False)
        return aux["vq-loss"]

    g = jax.grad(f)(params)
    assert float(jnp.abs(g["z_mean"]).sum()) > 0


def test_use_split_halves_top_codes():
    cfg = PQConfig(num_pq=1, num_codebook=8, embed_dim=4, vq_type="ema",
                   normalize="none", use_split=True)
    params, state = pq_init(jax.random.PRNGKey(0), cfg)
    state = dict(state, ema_weight=state["ema_weight"].at[0, 0].set(500.0))
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 2, 4)) + 500.0
    _, idx, _, new_state = pq_forward(z, params, state, cfg, training=True,
                                      rng=jax.random.PRNGKey(2))
    assert np.all(np.asarray(idx) == 0)
    # dead entries got split copies of the most-used entry (near 500)
    w = np.asarray(new_state["ema_weight"])
    assert (np.abs(w[0]) > 100).sum() >= 2, w[0]


def test_gumbel_path():
    cfg = PQConfig(num_pq=2, num_codebook=8, embed_dim=16, vq_type="param",
                   normalize="none", use_gumbel=True)
    params, state = pq_init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2, 16))
    z_q, idx, aux, _ = pq_forward(z, params, state, cfg, training=True,
                                  rng=jax.random.PRNGKey(2))
    assert idx.shape == (1, 2, 2, 2)
    # stochastic assignment: different keys give different indices somewhere
    _, idx2, _, _ = pq_forward(z, params, state, cfg, training=True,
                               rng=jax.random.PRNGKey(3))
    assert not np.array_equal(np.asarray(idx), np.asarray(idx2))


def test_pq_dropout_masks_codes():
    cfg = PQConfig(num_pq=1, num_codebook=64, embed_dim=4, vq_type="param",
                   normalize="none", pq_dropout=0.9)
    params, state = pq_init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 4, 4))
    _, idx, _, _ = pq_forward(z, params, state, cfg, training=True,
                              rng=jax.random.PRNGKey(2))
    used = set(np.asarray(idx).reshape(-1).tolist())
    # with 90% of the codebook masked, few distinct codes can win
    assert len(used) <= 16


def test_bf16_assign_precision_close_to_exact():
    # "bf16" distance arithmetic (the reference's fp16-autocast analogue,
    # train.py:80) must agree with exact f32 assignment away from ties,
    # on both the XLA path and the Pallas kernel path.
    import dataclasses

    cfg = PQConfig(num_pq=8, num_codebook=128, embed_dim=128,
                   vq_type="param", normalize="l2")
    params, state = pq_init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 7, 7, 128))
    _, idx_e, _, _ = pq_forward(z, params, state, cfg, training=False)
    for extra in ({}, {"use_pallas": True}):
        cfg_b = dataclasses.replace(cfg, assign_precision="bf16", **extra)
        _, idx_b, _, _ = pq_forward(z, params, state, cfg_b, training=False)
        agree = np.mean(np.asarray(idx_b) == np.asarray(idx_e))
        assert agree > 0.98, (extra, agree)


def test_use_pallas_auto_threshold(monkeypatch):
    """use_pallas='auto' contract (r4, PERF.md #12): on a TPU backend
    the fused kernel runs whenever eligible (it wins in-model at every
    batch); on other backends (kernel would run interpreted) the XLA
    path runs until the materialized (n, M, K) distance tensor crosses
    pallas_auto_bytes (the XLA path OOMs HBM there — measured r3)."""
    import equss_tpu.ops.pq_pallas as pp
    from equss_tpu.ops.quantizer import PQConfig, pq_forward, pq_init

    calls = []
    orig = pp.pq_assign_pallas

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(pp, "pq_assign_pallas", spy)
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (64, 16))
    base = dict(num_pq=2, num_codebook=128, embed_dim=16, vq_type="param",
                normalize="l2")

    cfg = PQConfig(use_pallas="auto", **base)         # default 13 GB gate
    params, state = pq_init(key, cfg)
    _, idx_xla, _, _ = pq_forward(z, params, state, cfg, training=False)
    assert calls == []                     # CPU backend, tiny tensor

    cfg_small = PQConfig(use_pallas="auto", pallas_auto_bytes=1.0, **base)
    _, idx_k, _, _ = pq_forward(z, params, state, cfg_small, training=False)
    assert calls == [1]
    np.testing.assert_array_equal(np.asarray(idx_k), np.asarray(idx_xla))

    # TPU branch: auto routes to the kernel at ANY size.  Fake the
    # backend check the gate makes, restoring the real one inside the
    # spy so the kernel itself still runs interpreted on CPU.
    real_backend = jax.default_backend

    def spy_tpu(*a, **k):
        calls.append("tpu")
        monkeypatch.setattr(jax, "default_backend", real_backend)
        try:
            return orig(*a, **k)
        finally:
            monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    monkeypatch.setattr(pp, "pq_assign_pallas", spy_tpu)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    _, idx_t, _, _ = pq_forward(z, params, state, cfg, training=False)
    monkeypatch.setattr(jax, "default_backend", real_backend)
    assert calls == [1, "tpu"]
    np.testing.assert_array_equal(np.asarray(idx_t), np.asarray(idx_xla))


def test_pallas_train_route_matches_xla_values_and_grads():
    """The kernel TRAINING route (explicit use_pallas + training=True —
    the _pallas_assign_ste custom-VJP wrapper) must reproduce the XLA
    path's forward outputs, losses, stats AND gradients: z's gradient
    flows through the normalize chain, the codebook's through the
    one-hot scatter (codebook_loss only — the straight-through rewrite
    blocks downstream codebook grads, dino_pqgo.py:440-444)."""
    import dataclasses

    cfg = PQConfig(num_pq=8, num_codebook=128, embed_dim=128,
                   vq_type="param", normalize="l2")
    cfg_k = dataclasses.replace(cfg, use_pallas=True)
    params, state = pq_init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 5, 128))
    w = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 5, 128))

    def run(c):
        def loss_fn(z, params):
            z_q, idx, aux, ns = pq_forward(z, params, state, c,
                                           training=True)
            # the z_q consumer exercises the straight-through path
            return aux["vq-loss"] + jnp.mean(z_q * w), (idx, aux, ns)

        (loss, (idx, aux, ns)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(z, params)
        return loss, idx, aux, ns, grads

    loss_x, idx_x, aux_x, ns_x, g_x = run(cfg)
    loss_p, idx_p, aux_p, ns_p, g_p = run(cfg_k)

    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    np.testing.assert_allclose(float(loss_p), float(loss_x), rtol=1e-6)
    for k in ("codebook-usage", "current-p50"):
        np.testing.assert_allclose(float(aux_p[k]), float(aux_x[k]),
                                   rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ns_p["vq_count"]),
                               np.asarray(ns_x["vq_count"]))
    np.testing.assert_allclose(np.asarray(g_p[0]), np.asarray(g_x[0]),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g_p[1]["codebook"]),
                               np.asarray(g_x[1]["codebook"]),
                               rtol=1e-5, atol=1e-7)


def test_pallas_train_route_bf16_mode():
    """Same training route in the bf16 fast mode (the flagship preset),
    checked against a NumPy oracle — the CPU backend cannot execute the
    XLA bf16 one-hot einsum at all (no bf16 DotThunk), so the XLA twin
    of this mode is TPU-only; the oracle is the mode's definition:
    z_q = bf16-rounded raw codewords at the assignment indices.
    Gradient-structure parity is covered by the exact-mode test above
    (bf16 changes only codeword rounding, not the VJP wiring)."""
    import dataclasses

    cfg = PQConfig(num_pq=8, num_codebook=128, embed_dim=128,
                   vq_type="param", normalize="l2",
                   assign_precision="bf16", use_pallas=True)
    params, state = pq_init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 5, 128))

    z_q, idx, aux, _ = pq_forward(z, params, state, cfg, training=True)
    z_q = np.asarray(z_q).reshape(2, 5, 5, 8, 16)
    idx = np.asarray(idx)
    assert np.isfinite(float(aux["vq-loss"]))

    cb = np.asarray(jnp.asarray(params["codebook"])
                    .astype(jnp.bfloat16).astype(jnp.float32))  # (M, K, d)
    expect = np.take_along_axis(
        cb[None, None, None], idx[..., None, None],
        axis=-2).squeeze(-2)                                    # via idx
    np.testing.assert_allclose(z_q, expect, rtol=1e-6, atol=1e-6)

    # assignments agree with the exact path away from bf16 ties
    cfg_e = dataclasses.replace(cfg, assign_precision="exact",
                                use_pallas=False)
    _, idx_e, _, _ = pq_forward(z, params, state, cfg_e, training=True)
    assert np.mean(idx == np.asarray(idx_e)) > 0.95
