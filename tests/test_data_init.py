"""Data-dependent codebook init (need_initialized: kmeans/rand).

Reference behavior: on the first training forward, kmeans mode fits
sklearn KMeans(init='k-means++') on the batch's flat features and copies
the centroids into the codebook (+ EMA avg buffer); rand mode restarts
every codeword from random batch vectors (dino_pqgo.py:341-366).  Here
the Trainer applies the model's ``data_init`` hook once before the first
step (trainer.py), batched over all M subspaces on device (ops/kmeans).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from equss_tpu.data.synthetic import synthetic_batches
from equss_tpu.ops.quantizer import PQConfig, pq_data_init, pq_forward, pq_init
from equss_tpu.parallel.mesh import make_mesh
from equss_tpu.train.trainer import Trainer

from test_trainer import tiny_cfg


def _first_batch_usage(cfg_pq, zf, key):
    params, state = pq_init(key, cfg_pq)
    params, state = pq_data_init(
        jax.random.fold_in(key, 1), zf, params, state, cfg_pq)
    _, _, aux, _ = pq_forward(
        zf.reshape(zf.shape[0], -1), params, state, cfg_pq,
        training=True, rng=jax.random.fold_in(key, 2))
    return float(aux["codebook-usage"]), params, state


def test_kmeans_init_improves_first_batch_usage():
    """kmeans-initialized codebooks must cover far more codewords on the
    first batch than the default uniform(-1/K, 1/K) init, because the
    codewords live where the data lives (dino_pqgo.py:348-355)."""
    key = jax.random.PRNGKey(0)
    n, M, d, K = 512, 4, 8, 16
    # clustered data far from the +-1/K cube
    centers = 5.0 * jax.random.normal(key, (K, M, d))
    pick = jax.random.randint(jax.random.fold_in(key, 1), (n,), 0, K)
    zf = centers[pick] + 0.1 * jax.random.normal(
        jax.random.fold_in(key, 2), (n, M, d))

    base = dict(num_pq=M, num_codebook=K, embed_dim=M * d, vq_type="param")
    u_usage, _, _ = _first_batch_usage(
        PQConfig(need_initialized="none", **base), zf, key)
    k_usage, k_params, _ = _first_batch_usage(
        PQConfig(need_initialized="kmeans", **base), zf, key)
    assert k_usage > u_usage + 0.2, (k_usage, u_usage)
    # centroids sit in the data's range, not the 1/K cube
    assert float(jnp.max(jnp.abs(k_params["codebook"]))) > 1.0


def test_kmeans_init_matches_sklearn_oracle_quality():
    """Our on-device k-means++ must reach the same quantization-error
    class as the reference's sklearn KMeans on identical data."""
    from sklearn.cluster import KMeans

    rng = np.random.RandomState(0)
    x = np.concatenate(
        [rng.randn(64, 8) * 0.3 + rng.randn(1, 8) * 4 for _ in range(8)])
    sk = KMeans(init="k-means++", n_clusters=8, random_state=0, n_init=1).fit(x)

    from equss_tpu.ops.kmeans import kmeans

    cents, assign = kmeans(jax.random.PRNGKey(0), jnp.asarray(x), k=8,
                           n_iters=25)
    ours = float(jnp.sum((x - np.asarray(cents)[np.asarray(assign)]) ** 2))
    assert ours <= 1.15 * sk.inertia_, (ours, sk.inertia_)


def test_rand_init_copies_batch_vectors():
    key = jax.random.PRNGKey(3)
    n, M, d, K = 64, 2, 4, 8
    zf = jax.random.normal(key, (n, M, d)) * 3.0
    cfg = PQConfig(num_pq=M, num_codebook=K, embed_dim=M * d,
                   vq_type="ema", need_initialized="rand")
    params, state = pq_init(key, cfg)
    params, state = pq_data_init(jax.random.fold_in(key, 1), zf,
                                 params, state, cfg)
    w = np.asarray(state["ema_weight"])                    # (M, K, d)
    np.testing.assert_allclose(w, np.asarray(state["ema_weight_avg"]))
    # every codeword equals some batch vector in its subspace
    z = np.asarray(zf)
    for m in range(M):
        d2 = ((w[m][:, None, :] - z[None, :, m, :]) ** 2).sum(-1)
        assert np.max(np.min(d2, axis=1)) < 1e-9


def test_trainer_fit_applies_data_init_once():
    cfg = tiny_cfg()
    cfg["model"]["vq"]["need_initialized"] = "kmeans"
    cfg["train"]["max_epochs"] = 1
    cfg["train"]["valid_interval_iters"] = 100
    trainer = Trainer(cfg, mesh=make_mesh(1))
    assert trainer._needs_data_init
    calls = []
    orig = trainer._data_init
    trainer._data_init = lambda ts, b: (calls.append(1), orig(ts, b))[1]
    res = trainer.fit(
        lambda epoch: synthetic_batches(epoch, 2, batch_size=4, res=16),
        lambda: synthetic_batches(9, 1, batch_size=4, res=16, with_pos=False),
        img_hw=(16, 16),
    )
    assert calls == [1]
    assert np.isfinite(res["best"]["Cluster_mIoU"])
    # resumed runs must NOT re-init (need_initialized latches to none)
    calls.clear()
    trainer.fit(
        lambda epoch: synthetic_batches(epoch, 1, batch_size=4, res=16),
        lambda: synthetic_batches(9, 1, batch_size=4, res=16, with_pos=False),
        img_hw=(16, 16),
        state=jax.device_get(res["state"]),
    )
    assert calls == []


def test_unseg_chained_data_init():
    """UnSeg/Contra family: each chained VQ inits from its ACTUAL input."""
    from test_variants import base_cfg

    cfg = base_cfg("hihi")
    cfg["model"]["vq"]["num_codebooks"] = [8, 8]
    cfg["model"]["vq"]["embed_dims"] = [32, 32]
    cfg["model"]["vq"]["num_pq"] = 1
    cfg["model"]["vq"]["need_initialized"] = "kmeans"
    cfg["loss"]["contra_weight"] = {"pos": 0.0, "neg": 0.0}
    trainer = Trainer(cfg, mesh=make_mesh(1))
    assert trainer._needs_data_init
    ts = trainer.init_state(jax.random.PRNGKey(0), img_hw=(16, 16))
    before = [np.asarray(p["codebook"]) for p in ts["params"]["pq"]]
    batch = next(iter(synthetic_batches(0, 1, batch_size=4, res=16)))
    ts = trainer.data_init(ts, batch)
    after = [np.asarray(p["codebook"]) for p in ts["params"]["pq"]]
    for b, a in zip(before, after):
        assert not np.allclose(b, a)
    ts, metrics = trainer.train_step(ts, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_new_vae_info_data_init():
    """need_initialized flows into the new/vae/info families too (r3
    self-review: they used to drop the key on the floor building
    PQConfig): the Trainer hook fires and every codebook moves to live
    where its ACTUAL VQ input lives (dino_pqgo.py:341-355 seam)."""
    from test_variants import base_cfg

    def codebooks(pq_params):
        if isinstance(pq_params, dict):
            return [np.asarray(pq_params["codebook"])]
        return [np.asarray(p["codebook"]) for p in pq_params]

    cases = {
        "new": dict(loss={"info_nce_weight": 0.1}, vq={}, eval={}),
        "vae": dict(loss={"contra_weight": {"pos": 0.1, "neg": 0.01}},
                    vq={"num_codebooks": [8, 8], "embed_dims": [16, 16]},
                    eval={"output_type": "vq1"}),
        "info": dict(loss={}, vq={}, eval={}),
    }
    for name, tweak in cases.items():
        cfg = base_cfg(name)
        cfg["model"]["vq"].update(tweak["vq"])
        cfg["loss"].update(tweak["loss"])
        cfg["eval"].update(tweak["eval"])
        cfg["model"]["vq"]["need_initialized"] = "kmeans"
        trainer = Trainer(cfg, mesh=make_mesh(1))
        assert trainer._needs_data_init, name
        ts = trainer.init_state(jax.random.PRNGKey(0), img_hw=(16, 16))
        before = codebooks(ts["params"]["pq"])
        batch = next(iter(synthetic_batches(0, 1, batch_size=4, res=16)))
        ts = trainer.data_init(ts, batch)
        after = codebooks(ts["params"]["pq"])
        for i, (b, a) in enumerate(zip(before, after)):
            assert not np.allclose(b, a), (name, i)
        ts, metrics = trainer.train_step(ts, batch)
        assert np.isfinite(float(metrics["loss"])), name


def test_pallas_auto_gate_scales_with_data_mesh():
    """use_pallas='auto' must compare PER-CHIP distance-tensor bytes:
    inside jit n is the GLOBAL pixel count, but the ~13 GB threshold is
    one chip's HBM (r3 self-review) — the Trainer tells PQConfig the
    data-mesh width so an 8-way mesh doesn't flip to the kernel at 1/8th
    of the calibrated tensor size."""
    trainer = Trainer(tiny_cfg())          # conftest mesh: 8 CPU devices
    shards = dict(trainer.mesh.shape)["data"]
    assert shards == 8
    assert trainer.model.cfg.pq.pallas_auto_shards == 8
    # single-device mesh stays at the calibrated default
    t1 = Trainer(tiny_cfg(), mesh=make_mesh(1))
    assert t1.model.cfg.pq.pallas_auto_shards == 1
