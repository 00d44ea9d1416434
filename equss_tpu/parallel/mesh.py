"""Device mesh + sharding helpers.

TPU-native replacement of the reference's torch.distributed/NCCL layer
(/root/reference/utils/dist_utils.py): instead of rank processes with
explicit all_reduce calls, a ``jax.sharding.Mesh`` with a ``data`` axis
carries the batch; GSPMD inserts the gradient psums, quantizer-statistic
reductions (dino_pqgo.py:418-419) and confusion-matrix sums
(metric.py:63) automatically because those contractions run over the
globally-shaped batch axis.

Multi-host: call ``init_distributed()`` (jax.distributed.initialize)
before creating the mesh; ICI within a slice / DCN across slices are
transparent under pjit.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (replaces dist_utils.set_dist:28-41).
    No-op on a single host."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the first n) devices.

    The reference is data-parallel only (SURVEY §2.4); the axis is named
    so TP/PP extensions can add axes without touching call sites.
    """
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} device(s) are visible on platform "
                f"'{jax.default_backend()}'")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def shard_batch(mesh: Mesh, batch: Dict[str, Any],
                axis_name: str = "data") -> Dict[str, Any]:
    """Place a host batch dict onto the mesh, sharded along dim 0.

    Single process: the batch is the GLOBAL batch; device_put splits it
    over the local devices.  Multi-process (jax.distributed initialized):
    each process passes its LOCAL slice of the global batch — the rows
    its own devices will hold — and ``make_array_from_process_local_data``
    assembles the global jax.Array without any cross-host copy.  This is
    the GSPMD replacement for the reference's DistributedSampler +
    per-rank batch//world division (/root/reference/build.py:183-198):
    the per-process slicing itself lives in the data pipeline
    (data/pipeline.py process_index/process_count; data/synthetic.py).

    Non-array entries (e.g. the img_path lists real-file datasets carry,
    dataset_aug.py:512-516) are dropped — they stay host-side and never
    enter jit."""
    sh = batch_sharding(mesh, axis_name)
    multiproc = jax.process_count() > 1
    out = {}
    for k, v in batch.items():
        if hasattr(v, "dtype") and getattr(v, "dtype").kind not in ("U", "S", "O"):
            # skip device_put for arrays already placed as requested: on
            # the tunneled single-chip backend a redundant device_put
            # round-trips through the host (~65 ms for a 320^2 val
            # batch, measured — it doubled the valid-step wall time)
            if isinstance(v, jax.Array) and not v.is_deleted() \
                    and v.sharding.is_equivalent_to(sh, v.ndim):
                out[k] = v
            elif multiproc:
                out[k] = jax.make_array_from_process_local_data(
                    sh, np.asarray(v))
            else:
                out[k] = jax.device_put(v, sh)
    return out


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Fully replicate a pytree (params/state) across the mesh.

    Multi-process: every process must hold the SAME host value (true for
    deterministic inits from a shared PRNGKey and for restored
    checkpoints); the replicated global array is assembled from each
    process's local copy without network traffic."""
    sh = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        def lift(x):
            if isinstance(x, jax.Array) and x.sharding.is_equivalent_to(
                    sh, x.ndim):
                return x
            return jax.make_array_from_process_local_data(
                sh, np.asarray(jax.device_get(x)))
        return jax.tree.map(lift, tree)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def broadcast_object(obj, is_source: bool = True):
    """Object broadcast from process 0 (replaces the byte-buffer pickle
    broadcast of dist_utils.py:153-187, e.g. the wandb save-dir sync,
    wandb_utils.py:56-57).  No-op on a single process."""
    import jax

    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils
    import numpy as np
    import pickle

    # two-phase: broadcast the exact payload length first, then the
    # payload at that length — no fixed-size buffer to silently truncate
    # a large object (and no trailing-zero stripping that would corrupt
    # a pickle ending in zero bytes)
    payload = pickle.dumps(obj) if is_source else b""
    size = multihost_utils.broadcast_one_to_all(
        np.asarray([len(payload)], dtype=np.int64))
    n = int(size[0])
    buf = np.zeros((n,), dtype=np.uint8)
    if is_source:
        buf[:] = np.frombuffer(payload, dtype=np.uint8)
    out = multihost_utils.broadcast_one_to_all(buf)
    return pickle.loads(bytes(out))


def barrier(name: str = "barrier") -> None:
    """Global device sync (dist_utils.py barrier / train.py:351,512)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def make_mesh_2d(data: int, model: int) -> Mesh:
    """(data, model) mesh: batch over 'data', large weight dims (e.g. the
    PQ codebook's K axis) over 'model'.  The reference is DP-only
    (SURVEY §2.4); this is the TP extension point — GSPMD inserts the
    cross-shard argmin/psum for the quantizer transparently and results
    are bit-identical to the replicated layout (tested)."""
    devices = jax.devices()
    if len(devices) < data * model:
        raise ValueError(
            f"requested a {data}x{model} mesh but only {len(devices)} "
            f"device(s) are visible on platform '{jax.default_backend()}'")
    return Mesh(np.array(devices[: data * model]).reshape(data, model),
                ("data", "model"))


def shard_quantizer(mesh: Mesh, params: Dict[str, Any],
                    model_state: Dict[str, Any]):
    """Shard PQ codebooks over the 'model' axis (K dimension): params
    ('codebook' (M, K, d)) and EMA buffers; everything else replicated."""
    if "model" not in mesh.axis_names:
        return (jax.tree.map(lambda x: jax.device_put(
            x, NamedSharding(mesh, P())), (params, model_state)))
    k_sharded = NamedSharding(mesh, P(None, "model", None))
    rep = NamedSharding(mesh, P())

    def place(tree):
        def f(path, x):
            name = path[-1].key if path else ""
            if name in ("codebook", "ema_weight", "ema_weight_avg") and x.ndim == 3:
                return jax.device_put(x, k_sharded)
            if name in ("ema_count", "vq_count") and x.ndim == 2:
                return jax.device_put(x, NamedSharding(mesh, P(None, "model")))
            return jax.device_put(x, rep)

        return jax.tree_util.tree_map_with_path(f, tree)

    return place(params), place(model_state)


def shard_backbone(mesh: Mesh, params: Dict[str, Any]) -> Dict[str, Any]:
    """Megatron-style tensor parallelism for the ViT MLPs over the
    'model' axis: each block's fc1 shards its OUTPUT (hidden) dim and
    fc2 its INPUT dim, so every device computes hidden/TP of every MLP
    locally and GSPMD inserts exactly one reduce per block for the fc2
    partial sums.  Composes with ``shard_quantizer`` on the same 2-D
    (data, model) mesh.

    The qkv/proj attention projections stay replicated: the transpose-
    free fused layout keeps q|k|v packed in one (C, 3C) kernel
    (ops/attention.py), which cannot be head-sharded without a layout
    change — and at ViT-S/B scale the MLP holds ~2/3 of the block
    weight FLOPs, so MLP TP is where the sharding pays.

    Outputs match the replicated layout to f32 reduction-order
    tolerance (the fc2 contraction is split across shards); codeword
    INDICES remain bit-identical in practice because assignments sit
    far from decision boundaries relative to ~1e-6 feature noise, but
    strict bit-parity runs should keep the backbone replicated.
    """
    if "model" not in mesh.axis_names:
        return jax.tree.map(
            lambda x: jax.device_put(x, NamedSharding(mesh, P())), params)
    tp = int(dict(mesh.shape)["model"])
    rep = NamedSharding(mesh, P())

    def f(path, x):
        names = [getattr(p, "key", "") for p in path]
        if len(names) >= 3 and names[-3] == "mlp":
            layer, leaf = names[-2], names[-1]
            if layer == "fc1" and leaf == "kernel" and x.ndim == 2 \
                    and x.shape[1] % tp == 0:
                return jax.device_put(x, NamedSharding(mesh, P(None, "model")))
            if layer == "fc1" and leaf == "bias" and x.ndim == 1 \
                    and x.shape[0] % tp == 0:
                return jax.device_put(x, NamedSharding(mesh, P("model")))
            if layer == "fc2" and leaf == "kernel" and x.ndim == 2 \
                    and x.shape[0] % tp == 0:
                return jax.device_put(x, NamedSharding(mesh, P("model", None)))
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map_with_path(f, params)


def device_prefetch(batches, mesh: Mesh, depth: int = 2,
                    axis_name: str = "data"):
    """Iterator wrapper that device_puts `depth` batches ahead ON A
    TRANSFER THREAD, so host decode, host->device copy and the previous
    step's compute all overlap (the torch-DataLoader pin_memory/
    non_blocking analogue, train.py:66-70, for the jit world).  The
    thread matters on hosts where device_put blocks while serializing
    (e.g. a tunneled device): the main thread keeps decoding while the
    copy drains."""
    from equss_tpu.core.prefetch import threaded_prefetch

    yield from threaded_prefetch(
        batches, depth=depth,
        map_fn=lambda b: shard_batch(mesh, b, axis_name))
