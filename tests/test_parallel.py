"""Mesh/sharding helpers."""
import numpy as np

import jax
import jax.numpy as jnp

from equss_tpu.parallel.mesh import (
    barrier,
    batch_sharding,
    broadcast_object,
    make_mesh,
    replicate,
    shard_batch,
)


def test_make_mesh_and_shard_batch():
    mesh = make_mesh(4)
    assert mesh.devices.shape == (4,)
    assert mesh.axis_names == ("data",)
    batch = {"img": np.zeros((8, 4, 4, 3), np.float32),
             "label": np.zeros((8, 4, 4), np.int32)}
    sharded = shard_batch(mesh, batch)
    sh = sharded["img"].sharding
    assert sh.spec == batch_sharding(mesh).spec
    # global shape unchanged, shards span devices
    assert sharded["img"].shape == (8, 4, 4, 3)
    assert len(sharded["img"].addressable_shards) == 4


def test_replicate():
    mesh = make_mesh(2)
    tree = {"w": jnp.ones((3, 3))}
    rep = replicate(mesh, tree)
    assert len(rep["w"].addressable_shards) == 2
    for s in rep["w"].addressable_shards:
        np.testing.assert_array_equal(np.asarray(s.data), np.ones((3, 3)))


def test_broadcast_and_barrier_single_process():
    # single-process paths are no-ops that return/complete
    obj = {"a": 1, "b": [2, 3]}
    assert broadcast_object(obj) == obj
    barrier("test")


def test_quantizer_tensor_parallel_bit_identical():
    """Codebook K-axis sharded over a 'model' axis (dp x tp) gives
    bit-identical assignments vs the replicated layout — GSPMD inserts
    the cross-shard reductions."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from equss_tpu.ops.quantizer import PQConfig, pq_forward, pq_init
    from equss_tpu.parallel.mesh import make_mesh_2d, shard_quantizer

    cfg = PQConfig(num_pq=4, num_codebook=64, embed_dim=32,
                   vq_type="param", normalize="l2")
    params, state = pq_init(jax.random.PRNGKey(0), cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 4, 32))

    step = jax.jit(lambda z, p, s: pq_forward(z, p, s, cfg, training=True,
                                              rng=jax.random.PRNGKey(2)))
    _, idx_ref, aux_ref, _ = step(z, params, state)

    mesh = make_mesh_2d(2, 2)
    p_sh, s_sh = shard_quantizer(mesh, {"pq": params}, {"pq": state})
    z_sh = jax.device_put(z, NamedSharding(mesh, P("data")))
    _, idx_tp, aux_tp, _ = step(z_sh, p_sh["pq"], s_sh["pq"])

    np.testing.assert_array_equal(np.asarray(idx_ref), np.asarray(idx_tp))
    np.testing.assert_allclose(float(aux_ref["vq-loss"]),
                               float(aux_tp["vq-loss"]), rtol=1e-6)


def test_backbone_tensor_parallel_matches_replicated():
    """ViT MLP tensor parallelism (fc1 column-/fc2 row-sharded over
    'model') matches the replicated forward to f32 reduction-order
    tolerance, with bit-identical codeword indices on this input."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from equss_tpu.models.equss import EQUSS, EQUSSConfig
    from equss_tpu.ops.quantizer import PQConfig
    from equss_tpu.parallel.mesh import make_mesh_2d, shard_backbone

    cfg = EQUSSConfig(
        model_type="vit_micro", patch_size=8, hidden_dim=64, dropout=False,
        pq=PQConfig(num_pq=8, num_codebook=16, embed_dim=64,
                    vq_type="param", normalize="l2"),
    )
    model = EQUSS(cfg)
    params, state = model.init(jax.random.PRNGKey(0), img_hw=(16, 16))
    img = jax.random.uniform(jax.random.PRNGKey(1), (8, 16, 16, 3))

    fwd = jax.jit(lambda p, s, im: model.apply(p, s, im, training=False)[0])
    ref = fwd(params, state, img)

    mesh = make_mesh_2d(2, 2)
    p_sh = shard_backbone(mesh, params)
    # the MLP kernels actually carry the TP layout...
    fc1 = p_sh["backbone"]["blocks_0"]["mlp"]["fc1"]["kernel"]
    fc2 = p_sh["backbone"]["blocks_0"]["mlp"]["fc2"]["kernel"]
    assert fc1.sharding.spec == P(None, "model")
    assert fc2.sharding.spec == P("model", None)
    # ...and everything else stays replicated
    assert p_sh["backbone"]["blocks_0"]["attn"]["qkv"]["kernel"].sharding.spec == P()
    img_sh = jax.device_put(img, NamedSharding(mesh, P("data")))
    out = fwd(p_sh, state, img_sh)

    np.testing.assert_array_equal(np.asarray(ref["indices"]),
                                  np.asarray(out["indices"]))
    np.testing.assert_allclose(np.asarray(ref["z_q"]), np.asarray(out["z_q"]),
                               rtol=2e-5, atol=2e-5)


def test_mesh_overrequest_raises():
    import pytest

    with pytest.raises(ValueError, match="device"):
        make_mesh(1024)


def test_dryrun_multichip_self_forces_platform():
    """The driver calls __graft_entry__.dryrun_multichip(n) bare — it must
    force the virtual CPU platform itself (VERDICT r1 item 1)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __graft_entry__

    assert __graft_entry__._force_cpu_platform(2)
    __graft_entry__.dryrun_multichip(2)   # dp-only path, tiny shapes
