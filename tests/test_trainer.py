"""End-to-end trainer smoke tests on the 8-device virtual CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from equss_tpu.data.synthetic import synthetic_batches
from equss_tpu.parallel.mesh import make_mesh
from equss_tpu.train.trainer import Trainer, TrainConfig

# This CI box has a single CPU core: a full 8-way-sharded train step can
# starve XLA's in-process collective rendezvous (40s timeout). Trainer
# tests run on a 2-device mesh; 8-way sharding semantics are covered by
# the cheaper test_quantizer.test_sharded_stats_match_single_device.
def _trainer(cfg):
    return Trainer(cfg, mesh=make_mesh(2))


def tiny_cfg(vq_type="param", output_type="vq0", num_classes=4):
    return {
        "seed": 0,
        "num_classes": num_classes,
        "model": {
            "name": "pqgo",
            "pretrained": {
                "model_type": "vit_micro",
                "dino_patch_size": 8,
                "freeze_backbone": True,
                "dropout": True,
                "drop_prob": 0.1,
            },
            "vq": {
                "vq_type": vq_type,
                "num_codebooks": [16],
                "embed_dims": [64],
                "beta": 0.25,
                "book": 1.0,
                "normalize": "l2" if vq_type == "param" else "none",
                "need_initialized": "uni",
                "num_pq": [8],
                "decay": 0.99,
                "eps": 1.0e-5,
            },
        },
        "loss": {
            "stego_weight": 1.0,
            "vq_weight": 1.0,
            "stego": {
                "neg_inter_weight": 0.63, "pos_inter_weight": 0.25,
                "pos_intra_weight": 0.67, "neg_inter_shift": 0.66,
                "pos_inter_shift": 0.02, "pos_intra_shift": 0.08,
                "zero_clamp": True, "pointwise": True, "stabilize": False,
                "feature_samples": 5, "neg_samples": 2,
            },
        },
        "optimizer": {
            "model": {"name": "adam", "lr": 3.0e-4},
            "cluster": {"name": "adam", "lr": 3.0e-3},
            "linear": {"name": "adam", "lr": 3.0e-3},
        },
        "scheduler": {
            "model": {"name": "constant"},
            "cluster": {"name": "constant"},
            "linear": {"name": "constant"},
        },
        "eval": {"output_type": output_type, "extra_classes": 0},
        "train": {
            "max_epochs": 1, "print_interval_iters": 2,
            "valid_interval_iters": 4, "clip_grad": 10.0, "num_accum": 1,
        },
    }


@pytest.mark.parametrize("vq_type,output_type", [
    ("param", "vq0"), ("ema", "feat"),
])
def test_train_steps_update_and_finite(vq_type, output_type):
    cfg = tiny_cfg(vq_type, output_type)
    trainer = _trainer(cfg)
    ts = trainer.init_state(jax.random.PRNGKey(0), img_hw=(32, 32))

    head_before = jax.device_get(ts["params"]["head"])
    pq_before = jax.device_get(
        ts["params"]["pq"].get("codebook")
        if vq_type == "param" else ts["model_state"]["pq"]["ema_weight"]
    )

    for batch in synthetic_batches(0, 3, batch_size=8, res=32):
        ts, metrics = trainer.train_step(ts, batch)

    m = {k: float(v) for k, v in metrics.items()}
    assert np.isfinite(m["loss"]), m
    assert np.isfinite(m["stego-loss"]) and np.isfinite(m["vq-loss"])
    assert m["grad-norm"] > 0

    head_after = jax.device_get(ts["params"]["head"])
    diff = sum(
        float(np.abs(a - b).sum())
        for a, b in zip(jax.tree.leaves(head_before), jax.tree.leaves(head_after))
    )
    assert diff > 0, "head params did not update"

    pq_after = jax.device_get(
        ts["params"]["pq"].get("codebook")
        if vq_type == "param" else ts["model_state"]["pq"]["ema_weight"]
    )
    assert float(np.abs(np.asarray(pq_before) - np.asarray(pq_after)).sum()) > 0, \
        "codebook did not update"
    assert int(ts["step"]) == 3


def test_validation_metrics():
    cfg = tiny_cfg()
    trainer = _trainer(cfg)
    ts = trainer.init_state(jax.random.PRNGKey(0), img_hw=(32, 32))
    val = trainer.validate(
        ts, synthetic_batches(1, 2, batch_size=8, res=32, with_pos=False))
    for k in ["Cluster_mIoU", "Cluster_Accuracy", "Linear_mIoU",
              "Linear_Accuracy"]:
        assert 0.0 <= val[k] <= 100.0, val


def test_fit_one_epoch_improves_probes():
    """Cluster/linear probes should beat chance on the structured
    synthetic data after one epoch (the 'cluster_baseline' minimum slice
    of SURVEY §7.3, shrunk for CI)."""
    cfg = tiny_cfg()
    trainer = _trainer(cfg)
    result = trainer.fit(
        lambda epoch: synthetic_batches(42 + epoch, 12, batch_size=8, res=32),
        lambda: synthetic_batches(7, 2, batch_size=8, res=32, with_pos=False),
        img_hw=(32, 32),
    )
    best = result["best"]
    # 4 classes, chance accuracy ~25%; structured labels are learnable
    assert best["Linear_Accuracy"] > 30.0, best
    assert best["Cluster_mIoU"] >= 0.0


def test_grad_accumulation_matches_big_batch():
    """num_accum=2 with half batches == one step with the full batch for
    the deterministic parts of the update (optimizer state counting)."""
    cfg = tiny_cfg()
    cfg["train"]["num_accum"] = 2
    trainer = _trainer(cfg)
    ts = trainer.init_state(jax.random.PRNGKey(0), img_hw=(32, 32))
    head0 = jax.device_get(ts["params"]["head"])
    batches = list(synthetic_batches(0, 2, batch_size=4, res=32))
    ts, _ = trainer.train_step(ts, batches[0])
    # after 1 micro-step params must be unchanged (accumulating)
    head1 = jax.device_get(ts["params"]["head"])
    diff1 = sum(float(np.abs(a - b).sum()) for a, b in
                zip(jax.tree.leaves(head0), jax.tree.leaves(head1)))
    assert diff1 == 0.0
    ts, _ = trainer.train_step(ts, batches[1])
    head2 = jax.device_get(ts["params"]["head"])
    diff2 = sum(float(np.abs(a - b).sum()) for a, b in
                zip(jax.tree.leaves(head0), jax.tree.leaves(head2)))
    assert diff2 > 0.0


def test_probe_res_label_matches_feat_predictions():
    """probe_res='label' (reference-exact) vs 'feat' (fast): the linear
    probe is affine, so its predictions are identical; the cluster probe
    normalizes per-pixel, which does not commute with interpolation at
    boundary pixels — require near-total agreement there."""
    cfg_a = tiny_cfg()
    cfg_b = tiny_cfg()
    cfg_b["eval"]["probe_res"] = "label"
    tr_a = _trainer(cfg_a)
    tr_b = _trainer(cfg_b)
    ts = tr_a.init_state(jax.random.PRNGKey(0), img_hw=(32, 32))
    batch = next(iter(synthetic_batches(1, 1, batch_size=4, res=32,
                                        with_pos=False)))
    res_a = tr_a.valid_step(ts, batch)
    res_b = tr_b.valid_step(ts, batch)
    np.testing.assert_array_equal(np.asarray(res_a["linear_preds"]),
                                  np.asarray(res_b["linear_preds"]))
    agree = float((np.asarray(res_a["cluster_preds"])
                   == np.asarray(res_b["cluster_preds"])).mean())
    assert agree > 0.99, agree


def test_cosine_scheduler_from_config():
    cfg = tiny_cfg()
    cfg["scheduler"] = {"model": {"name": "cos", "min_lr": 0.0},
                        "cluster": {"name": "constant"},
                        "linear": {"name": "constant"}}
    cfg["train"]["iter_per_epoch"] = 4
    cfg["train"]["max_epochs"] = 2
    trainer = _trainer(cfg)
    ts = trainer.init_state(jax.random.PRNGKey(0), img_hw=(32, 32))
    head0 = jax.device_get(ts["params"]["head"])
    for batch in synthetic_batches(0, 8, batch_size=4, res=32):
        ts, m = trainer.train_step(ts, batch)
    assert np.isfinite(float(m["loss"]))
    head1 = jax.device_get(ts["params"]["head"])
    diff = sum(float(np.abs(a - b).sum()) for a, b in
               zip(jax.tree.leaves(head0), jax.tree.leaves(head1)))
    assert diff > 0


def test_cached_feature_training(tmp_path):
    """Feature-cache mode: precompute frozen features, train head/PQ
    from the cache — same mechanics, no backbone in the step."""
    import numpy as _np
    from equss_tpu.data.feature_cache import (
        cached_feature_batches,
        precompute_features,
    )
    from equss_tpu.models.registry import build_model

    cfg = tiny_cfg()
    trainer = _trainer(cfg)
    ts = trainer.init_state(jax.random.PRNGKey(0), img_hw=(32, 32))

    # fake a cache from synthetic images through the real featurizer
    model = trainer.model

    class _Data:
        def batches(self, bs, shuffle=False, drop_last=False):
            return synthetic_batches(0, 2, batch_size=bs, res=32,
                                     with_pos=False)

    path = precompute_features(model, jax.device_get(ts["params"]), _Data(),
                               str(tmp_path / "feats.npz"), batch_size=4)
    blob = _np.load(path)
    assert blob["feats"].shape[1:] == (4, 4, 32)

    head0 = jax.device_get(ts["params"]["head"])
    for batch in cached_feature_batches(path, None, batch_size=4, seed=0):
        ts, metrics = trainer.train_step(ts, batch)
    assert np.isfinite(float(metrics["loss"]))
    head1 = jax.device_get(ts["params"]["head"])
    diff = sum(float(np.abs(a - b).sum()) for a, b in
               zip(jax.tree.leaves(head0), jax.tree.leaves(head1)))
    assert diff > 0


def test_adamw_wd_mask_excludes_quantizer_and_vectors():
    """AdamW decays only ndim>1 params outside pq/club_enc subtrees
    (ref build.py:72-95 split_params_for_optimizer)."""
    import jax.numpy as jnp

    from equss_tpu.train.optim import build_optimizer, wd_mask

    params = {
        "net": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
        "pq": [{"codebook": jnp.ones((2, 8, 4))}],
        "club_enc": {"kernel": jnp.ones((4, 4))},
    }
    mask = wd_mask(params)
    assert mask["net"]["kernel"] is True
    assert mask["net"]["bias"] is False
    assert mask["pq"][0]["codebook"] is False
    assert mask["club_enc"]["kernel"] is False

    tx = build_optimizer({"name": "adamw", "lr": 0.1, "weight_decay": 1.0},
                         {"name": "constant"})
    st = tx.init(params)
    zero_g = jax.tree.map(jnp.zeros_like, params)
    up, _ = tx.update(zero_g, st, params)
    # with zero grads the adamw update is exactly -lr*wd*param where masked
    assert abs(float(up["net"]["kernel"][0, 0]) + 0.1) < 1e-6
    assert float(jnp.abs(up["net"]["bias"]).max()) == 0.0
    assert float(jnp.abs(up["pq"][0]["codebook"]).max()) == 0.0
    assert float(jnp.abs(up["club_enc"]["kernel"]).max()) == 0.0


def test_trainer_adamw_reference_baseline_optimizer():
    """The pq/cluster baselines train with adamw + the wd mask resolved
    against the real trainable tree (pq param lists included)."""
    cfg = tiny_cfg()
    cfg["optimizer"]["model"] = {"name": "adamw", "lr": 3.0e-4,
                                 "weight_decay": 2.0}
    trainer = Trainer(cfg, mesh=make_mesh(1))
    ts = trainer.init_state(jax.random.PRNGKey(0), img_hw=(16, 16))
    batch = next(iter(synthetic_batches(0, 1, batch_size=4, res=16)))
    ts, metrics = trainer.train_step(ts, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_cluster_probe_log_probs_requires_alpha():
    """log_probs (the CRF branch's input, evaluator.py:99-104) only
    exists for the softmax path; the alpha=None hard-assignment default
    must fail loudly instead of tracing `inner * None` (r3 review)."""
    from equss_tpu.eval.probes import ClusterProbe

    probe = ClusterProbe(num_clusters=4, dim=8)
    x = jnp.zeros((1, 2, 2, 8))
    params = probe.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="alpha"):
        probe.apply(params, x, alpha=None, log_probs=True)
    # the softmax path still serves log-probs
    _, lp = probe.apply(params, x, alpha=2.0, log_probs=True)
    assert np.allclose(np.exp(np.asarray(lp)).sum(-1), 1.0, atol=1e-5)


# --------------------------------------------- non-finite step protection

def test_nonfinite_step_skips_update_and_recovers():
    """A step with inf/nan loss or grads leaves params, probes, model
    state and optimizer state untouched (AMP GradScaler found_inf
    analogue, reference train.py:88-97); the next finite batch trains
    normally."""
    cfg = tiny_cfg()
    trainer = _trainer(cfg)
    ts = trainer.init_state(jax.random.PRNGKey(0), img_hw=(32, 32))
    batch = next(iter(synthetic_batches(0, 1, batch_size=8, res=32)))

    ts, m = trainer.train_step(ts, batch)          # clean warm step
    assert float(m["skipped"]) == 0.0

    head_before = jax.device_get(ts["params"]["head"])
    opt_before = jax.device_get(ts["opt"]["model"])
    step_before = int(ts["step"])

    bad = dict(batch, img=np.full(np.shape(batch["img"]), np.inf,
                                  np.float32))
    ts, m = trainer.train_step(ts, bad)
    assert float(m["skipped"]) == 1.0
    for a, b in zip(jax.tree.leaves(head_before),
                    jax.tree.leaves(jax.device_get(ts["params"]["head"]))):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree.leaves(opt_before),
                    jax.tree.leaves(jax.device_get(ts["opt"]["model"]))):
        np.testing.assert_array_equal(a, b)
    # the loop still advances (data order unchanged)
    assert int(ts["step"]) == step_before + 1

    ts, m = trainer.train_step(ts, batch)          # recovery
    assert float(m["skipped"]) == 0.0
    assert np.isfinite(float(m["loss"]))
    diff = sum(float(np.abs(a - b).sum()) for a, b in zip(
        jax.tree.leaves(head_before),
        jax.tree.leaves(jax.device_get(ts["params"]["head"]))))
    assert diff > 0, "finite step after a skipped one did not train"


def test_nonfinite_guard_opt_out():
    """train.skip_nonfinite=false restores the unguarded step (no
    'skipped' metric, nan propagates — the reference's non-AMP path)."""
    cfg = tiny_cfg()
    cfg["train"]["skip_nonfinite"] = False
    trainer = _trainer(cfg)
    ts = trainer.init_state(jax.random.PRNGKey(0), img_hw=(32, 32))
    batch = next(iter(synthetic_batches(0, 1, batch_size=8, res=32)))
    bad = dict(batch, img=np.full(np.shape(batch["img"]), np.inf,
                                  np.float32))
    ts, m = trainer.train_step(ts, bad)
    assert "skipped" not in m
    assert not np.isfinite(float(m["loss"]))


def test_fit_aborts_on_divergence():
    """Permanent divergence (every sampled step skipped for
    nonfinite_patience print intervals) aborts loudly instead of
    training garbage forever."""
    cfg = tiny_cfg()
    cfg["train"]["print_interval_iters"] = 1
    cfg["train"]["valid_interval_iters"] = 1000
    cfg["train"]["nonfinite_patience"] = 2
    trainer = _trainer(cfg)

    def bad_batches(epoch):
        for b in synthetic_batches(epoch, 4, batch_size=8, res=32):
            yield dict(b, img=np.full(np.shape(b["img"]), np.inf,
                                      np.float32))

    def val_batches():
        return synthetic_batches(99, 1, batch_size=8, res=32,
                                 with_pos=False)

    with pytest.raises(RuntimeError, match="diverged"):
        trainer.fit(bad_batches, val_batches, img_hw=(32, 32))


def test_mid_epoch_resume_is_bit_exact():
    """Resuming from a mid-epoch checkpoint replays the interrupted
    epoch from the exact step (data order is a pure function of
    (seed, epoch)) — final params match an uninterrupted run exactly,
    no batch trained twice."""
    def make(n_batches=6):
        cfg = tiny_cfg()
        cfg["train"]["max_epochs"] = 1
        cfg["train"]["valid_interval_iters"] = 1000
        cfg["_iter_per_epoch"] = n_batches
        return _trainer(cfg), n_batches

    def train_batches(epoch):
        return synthetic_batches(epoch, 6, batch_size=8, res=32)

    def val_batches():
        return synthetic_batches(99, 1, batch_size=8, res=32,
                                 with_pos=False)

    # uninterrupted: fit the full epoch
    trainer, n = make()
    full = trainer.fit(train_batches, val_batches, img_hw=(32, 32))
    full_params = jax.device_get(full["state"]["params"])

    # interrupted: 3 manual steps (what fit would run), then resume
    trainer2, _ = make()
    ts = trainer2.init_state(jax.random.PRNGKey(trainer2.tc.seed),
                             img_hw=(32, 32))
    for batch in list(train_batches(0))[:3]:
        ts, _ = trainer2.train_step(ts, batch)
    ckpt = jax.device_get(ts)                    # "checkpoint"
    trainer3, _ = make()
    resumed = trainer3.fit(train_batches, val_batches, img_hw=(32, 32),
                           state=ckpt)
    res_params = jax.device_get(resumed["state"]["params"])

    assert int(resumed["state"]["step"]) == int(full["state"]["step"]) == 6
    for a, b in zip(jax.tree.leaves(full_params),
                    jax.tree.leaves(res_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
