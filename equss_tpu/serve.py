"""Deployment/export: freeze a trained model + probes into a standalone
StableHLO artifact.

The reference has NO serving story — "inference" means re-running the
valid loop of train.py:390-538 with the full training codebase on the
path.  This module is a TPU-native addition: ``export_predictor`` bakes
the trained weights into a single compiled artifact (``jax.export``)
that (a) needs none of the model-building Python to run, (b) is
byte-serializable for shipping, and (c) replays on any matching
platform (tpu / cpu) via ``load_predictor``.

The exported signature is the deployment surface a user of the
reference's eval stack actually consumes (evaluator.py:46-82 outputs):

    img (b, H, W, 3) float32  ->  {"cluster_preds": (b, H, W) int32,
                                   "linear_preds":  (b, H, W) int32}

with predictions at INPUT resolution (the reference upsamples probe
logits to label resolution, evaluator.py:53-58; serving has no label, so
the input plane defines the output grid).  ``normalize=True`` (default)
additionally folds the ImageNet mean/std into the graph so the artifact
accepts raw [0, 1] RGB.

Batch-size handling: exported with a SYMBOLIC batch dimension when the
traced graph allows it (shape polymorphism), else fixed at the provided
``batch_size`` — the Pallas fast-attention path requires concrete
shapes, so parity-mode (einsum attention) models export polymorphically
while fast-mode models pin the batch.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp


def build_predict_fn(trainer, ts: Dict[str, Any], *,
                     normalize: bool = True) -> Callable:
    """Close the trainer's model + probes over the trained state.

    Returns ``predict(img) -> {"cluster_preds", "linear_preds"}`` with
    the weights captured as compile-time constants (they ship inside the
    exported artifact; no checkpoint needed at serving time).
    """
    model, evaluator = trainer.model, trainer.evaluator
    params = jax.device_get(ts["params"])
    probe_params = jax.device_get(ts["probe_params"])
    model_state = jax.device_get(ts["model_state"])

    def predict(img: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        if normalize:
            # the SAME helper the trainer's valid path applies, so the
            # artifact stays byte-identical to the live model
            from equss_tpu.data.transforms import normalize_images

            img = normalize_images(img)
        out, _ = model.apply(params, model_state, img, training=False)
        sel = trainer._select_out(out)
        # the evaluator only uses the label plane for losses (masked CE
        # -> 0 when everything is ignore) and for the output grid; an
        # all-ignore plane at input resolution yields full-res preds
        dummy = jnp.full(img.shape[:3], -1, jnp.int32)
        ev = evaluator.apply({"params": probe_params}, sel, dummy)
        res = {"linear_preds": ev["linear_preds"]}
        if "cluster_preds" in ev:
            res["cluster_preds"] = ev["cluster_preds"]
        return res

    return predict


def build_sharded_predict_fn(trainer, ts: Dict[str, Any], mesh, *,
                             normalize: bool = True) -> Callable:
    """Batch-sharded live predictor for multi-chip (pod) serving.

    The exported-artifact path is single-device; for pod deployments
    the live predictor jits once over a device mesh with the image
    batch sharded along the ``data`` axis.  The whole forward (frozen
    backbone + per-pixel PQ assignment + probes) is batch-parallel with
    no cross-image reductions, so GSPMD partitions it with ZERO
    collectives on the hot path — N chips serve N× the batch at the
    single-chip step time.  Weights embed as constants and replicate.
    The batch size must be divisible by the mesh's data-axis size.

    Reference analogue: the valid-loop-under-DDP inference pattern
    (/root/reference/train.py:275-278, one process per GPU) re-designed
    as one jit over a `jax.sharding.Mesh`.
    """
    from equss_tpu.parallel.mesh import batch_sharding

    predict = build_predict_fn(trainer, ts, normalize=normalize)
    sh = batch_sharding(mesh)
    return jax.jit(predict, in_shardings=sh, out_shardings=sh)


def export_predictor(trainer, ts: Dict[str, Any], img_hw,
                     *, batch_size: int = 1, normalize: bool = True,
                     platforms: Optional[list] = None,
                     symbolic_batch: str = "auto"):
    """Export the predictor as a ``jax.export.Exported`` artifact.

    ``symbolic_batch='auto'`` (default) tries a symbolic batch dimension
    first and falls back to the concrete ``batch_size`` when the graph
    demands static shapes (Pallas kernels).  ``'off'`` pins
    ``batch_size`` up front — on a TPU backend the trace then sees a
    concrete n, so the quantizer's ``use_pallas: auto`` gate CAN route
    the fused Pallas assignment kernel into the artifact (a symbolic
    trace never can — quantizer.py pins the XLA path for unknown n);
    use this for fixed-batch serving where the kernel's in-model win
    matters (PERF.md #20/#21).  ``platforms`` defaults to the current
    backend; pass e.g. ``["tpu", "cpu"]`` for a multi-platform artifact
    (multi-platform also keeps the XLA path — Mosaic kernels are
    TPU-only custom calls).
    """
    if symbolic_batch not in ("auto", "off"):
        raise ValueError(
            f"export.symbolic_batch must be auto|off, got {symbolic_batch}")
    predict = jax.jit(build_predict_fn(trainer, ts, normalize=normalize))
    kw = {"platforms": platforms} if platforms else {}
    if symbolic_batch == "off":
        spec = jax.ShapeDtypeStruct((batch_size, *img_hw, 3), jnp.float32)
        return jax.export.export(predict, **kw)(spec)
    try:
        (b,) = jax.export.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, *img_hw, 3), jnp.float32)
        exported = jax.export.export(predict, **kw)(spec)
    except Exception as e:  # shape polymorphism unsupported on this
        # graph (e.g. Pallas fast-attention needs concrete shapes) —
        # fall back to a batch-pinned artifact, but say why, so a user
        # expecting an any-batch artifact isn't surprised at serving time
        print(f"export: symbolic batch unavailable "
              f"({type(e).__name__}: {str(e).splitlines()[0][:160]}); "
              f"pinning batch_size={batch_size}")
        spec = jax.ShapeDtypeStruct((batch_size, *img_hw, 3), jnp.float32)
        try:
            return jax.export.export(predict, **kw)(spec)
        except Exception as e2:
            if type(e2) is type(e) and str(e2) == str(e):
                # identical failure with a concrete batch: the problem
                # was never shape polymorphism — surface the real error
                # instead of the misattributed fallback message above
                raise e2 from None
            raise
    _warn_symbolic_hbm_bound(trainer, img_hw)
    return exported


def _warn_symbolic_hbm_bound(trainer, img_hw) -> None:
    """A symbolic-batch artifact freezes want_pallas=False into the graph
    (pq_forward can't size-gate an unknown n — quantizer.py pallas_auto
    branch), so the live model's auto-switch to the Pallas kernel above
    ~pallas_auto_bytes distance tensors does NOT exist in the artifact.
    Print the serving-batch bound where the dense (n, M, K) distance
    tensor would hit that budget, so deployments know the artifact's
    batch ceiling."""
    pq = getattr(getattr(trainer, "model", None), "cfg", None)
    pq = getattr(pq, "pq", None)
    if pq is None or pq.use_pallas != "auto":
        return
    patch = trainer.model.cfg.patch_size
    n_per_img = (img_hw[0] // patch) * (img_hw[1] // patch)
    elt = 2 if pq.assign_precision == "bf16" else 4
    bytes_per_img = n_per_img * pq.num_pq * pq.num_codebook * elt
    max_b = int(pq.pallas_auto_bytes // max(1, bytes_per_img))
    print(f"export: symbolic-batch artifact always runs the XLA "
          f"assignment path (no Pallas auto-switch); keep serving "
          f"batches <= ~{max_b} at {img_hw[0]}x{img_hw[1]} or the "
          f"(n, M, K) distance tensor exceeds the "
          f"{pq.pallas_auto_bytes / 2**30:.0f} GiB HBM budget")


def save_predictor(exported, path: str) -> str:
    with open(path, "wb") as f:
        f.write(exported.serialize())
    return path


def load_predictor(path_or_bytes) -> Callable:
    """Deserialize an exported artifact into a callable.

    Needs only jax — none of equss_tpu's model code runs at serving
    time; the weights and the whole forward live in the artifact.
    """
    blob = path_or_bytes
    if isinstance(blob, str):
        with open(blob, "rb") as f:
            blob = f.read()
    exported = jax.export.deserialize(bytearray(blob))
    # jit the call wrapper: Exported.call alone re-stages every
    # invocation (measured 247 vs 49 ms/call at the flagship b=64 —
    # 5x re-staging overhead); under jit the artifact measures
    # byte-identical AND speed-identical to the live jitted model
    # (49.1 ms/call, 1305 img/s, b=64 224^2 full-res preds)
    call = jax.jit(exported.call)

    def predict(img):
        img = jnp.asarray(img)
        if img.dtype == jnp.uint8:     # match normalize_images' contract:
            img = img / 255.0          # the artifact expects [0, 1] floats
        return call(img.astype(jnp.float32))

    return predict
