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
            from equss_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

            img = (img - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(
                IMAGENET_STD)
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


def export_predictor(trainer, ts: Dict[str, Any], img_hw,
                     *, batch_size: int = 1, normalize: bool = True,
                     platforms: Optional[list] = None):
    """Export the predictor as a ``jax.export.Exported`` artifact.

    Tries a symbolic batch dimension first; falls back to the concrete
    ``batch_size`` when the graph demands static shapes (Pallas
    kernels).  ``platforms`` defaults to the current backend; pass e.g.
    ``["tpu", "cpu"]`` to build a multi-platform artifact.
    """
    predict = jax.jit(build_predict_fn(trainer, ts, normalize=normalize))
    kw = {"platforms": platforms} if platforms else {}
    try:
        (b,) = jax.export.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, *img_hw, 3), jnp.float32)
        return jax.export.export(predict, **kw)(spec)
    except Exception:
        spec = jax.ShapeDtypeStruct((batch_size, *img_hw, 3), jnp.float32)
        return jax.export.export(predict, **kw)(spec)


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
        return call(jnp.asarray(img, jnp.float32))

    return predict
