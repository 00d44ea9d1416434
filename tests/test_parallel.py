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
