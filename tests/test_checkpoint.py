"""Orbax checkpoint round trip: full train state save -> restore ->
identical continuation (a real mid-training resume, which the reference
lacks — its resume skips to final eval, train.py:428-432)."""
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, "tests")


def test_checkpoint_roundtrip_resume(tmp_path):
    from test_trainer import tiny_cfg
    from equss_tpu.core.checkpoint import CheckpointManager
    from equss_tpu.data.synthetic import synthetic_batches
    from equss_tpu.parallel.mesh import make_mesh
    from equss_tpu.train.trainer import Trainer

    cfg = tiny_cfg()
    trainer = Trainer(cfg, mesh=make_mesh(1))
    ts = trainer.init_state(jax.random.PRNGKey(0), img_hw=(32, 32))
    batches = list(synthetic_batches(0, 4, batch_size=4, res=32))
    for b in batches[:2]:
        ts, _ = trainer.train_step(ts, b)

    ckpt = CheckpointManager(str(tmp_path / "ckpt"))
    ckpt.save(2, jax.device_get(ts), metadata={"best": {"Cluster_mIoU": 1.0}},
              wait=True)
    assert ckpt.latest_step() == 2

    restored = ckpt.restore(template=jax.device_get(ts))
    # continue both and compare: identical trajectories
    ts_a, ts_b = ts, restored
    for b in batches[2:]:
        ts_a, m_a = trainer.train_step(ts_a, b)
        ts_b, m_b = trainer.train_step(ts_b, b)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    for la, lb in zip(jax.tree.leaves(ts_a["params"]),
                      jax.tree.leaves(ts_b["params"])):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-6)
    ckpt.close()


def test_checkpoint_restore_missing_raises(tmp_path):
    from equss_tpu.core.checkpoint import CheckpointManager

    ckpt = CheckpointManager(str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError):
        ckpt.restore()
