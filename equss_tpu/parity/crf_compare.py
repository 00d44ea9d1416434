"""CRF story record (VERDICT r3 #4 / r4 missing #2): exact MXU mean
field (ops/crf.py) vs native permutohedral lattice (ops/crf_native.py +
native/permutohedral.cpp) on twin-corpus metrics.

Protocol: train the flagship twin config briefly on the miniature twin
corpus, compute the probes' log-probs ONCE per val batch, then refine
the SAME log-probs through both CRF stacks and score both with the same
metric stack (cluster Hungarian mIoU/Acc + linear) — plus the no-CRF
baseline, per-pixel refined-argmax agreement between the stacks, and
per-image wall-clock for each.

The pydensecrf stance (recorded in PARITY.md): the reference refines
through pydensecrf (utils/crf_utils.py:32-71), whose bilateral message
pass is itself an APPROXIMATION (Krähenbühl permutohedral lattice with
its own constants and barycentric interpolation).  pydensecrf cannot be
installed in this environment (zero egress), so bitwise parity against
it is unknowable here; what IS checkable is the mean-field objective
both implement.  ops/crf.py computes that objective EXACTLY (dense
blocked kernel on the MXU, no lattice approximation), so it is the
ground truth of the shared objective; native/permutohedral.cpp mirrors
pydensecrf's approximation STRUCTURE (lattice splat/blur/slice).  The
agreement between the two recorded here bounds the metric-level effect
of lattice approximation — the same order as pydensecrf's own deviation
from the exact mean field.
"""
from __future__ import annotations

import time
from typing import Any, Dict

import numpy as np

import jax
import jax.numpy as jnp


def run_crf_compare(*, n_steps: int = 40, batch_size: int = 4,
                    res: int = 64, n_val: int = 4,
                    seed: int = 0) -> Dict[str, Any]:
    from equss_tpu.eval.metrics import UnSegMetrics, confusion_update
    from equss_tpu.ops.crf import CRFConfig, dense_crf
    from equss_tpu.ops.crf_native import batched_crf_native
    from equss_tpu.parallel.mesh import make_mesh
    from equss_tpu.parity.twin import make_corpus, make_twin_config
    from equss_tpu.train.trainer import Trainer

    cfg = make_twin_config()
    nc = cfg["num_classes"]
    trainer = Trainer(cfg, mesh=make_mesh(1))
    ts = trainer.init_state(jax.random.PRNGKey(seed), img_hw=(res, res))
    train, val = make_corpus(seed, max(n_steps, 1), n_val, batch_size,
                             res, nc)
    for i in range(n_steps):
        b = train[i % len(train)]
        ts, _ = trainer.train_step(ts, {
            "img": b["img"], "img_pos": b["img_pos"], "label": b["label"]})

    crf_cfg = CRFConfig()

    @jax.jit
    def log_prob_step(ts, img, label):
        out, _ = trainer.model.apply(
            ts["params"], ts["model_state"], img, training=False)
        ev = trainer.evaluator.apply(
            {"params": ts["probe_params"]}, trainer._select_out(out),
            label, want_log_probs=True)
        return ev["linear_log_probs"], ev["cluster_log_probs"]

    @jax.jit
    def refine_exact(img, lp):
        return jnp.argmax(
            jax.vmap(lambda i, l: dense_crf(i, l, crf_cfg))(img, lp),
            -1).astype(jnp.int32)

    from equss_tpu.data.transforms import unnormalize_images

    metrics = {
        k: (UnSegMetrics(nc, trainer.tc.extra_classes,
                         compute_hungarian=True),
            UnSegMetrics(nc, 0, compute_hungarian=False))
        for k in ("none", "exact", "lattice")
    }
    agree = {"cluster": [], "linear": []}
    t_exact = t_lattice = 0.0
    n_imgs = 0

    for b in val:
        img = jnp.asarray(b["img"])
        label = jnp.asarray(b["label"])
        img_n = trainer._normalize_batch({"img": img})["img"]
        lin_lp, clu_lp = log_prob_step(ts, img_n, label)
        n_imgs += img.shape[0]

        preds = {"none": (jnp.argmax(lin_lp, -1).astype(jnp.int32),
                          jnp.argmax(clu_lp, -1).astype(jnp.int32))}

        t0 = time.perf_counter()
        lin_e = refine_exact(img_n, lin_lp)
        clu_e = refine_exact(img_n, clu_lp)
        jax.block_until_ready((lin_e, clu_e))
        t_exact += time.perf_counter() - t0
        preds["exact"] = (lin_e, clu_e)

        rgb255 = np.asarray(unnormalize_images(img_n)) * 255.0
        t0 = time.perf_counter()
        lin_l = np.argmax(
            batched_crf_native(rgb255, np.asarray(lin_lp), crf_cfg),
            -1).astype(np.int32)
        clu_l = np.argmax(
            batched_crf_native(rgb255, np.asarray(clu_lp), crf_cfg),
            -1).astype(np.int32)
        t_lattice += time.perf_counter() - t0
        preds["lattice"] = (jnp.asarray(lin_l), jnp.asarray(clu_l))

        agree["linear"].append(np.mean(np.asarray(preds["exact"][0])
                                       == lin_l))
        agree["cluster"].append(np.mean(np.asarray(preds["exact"][1])
                                        == clu_l))

        for k, (lin_p, clu_p) in preds.items():
            cm, lm = metrics[k]
            cm.update_confusion(confusion_update(
                clu_p, label, nc, trainer.tc.extra_classes))
            lm.update_confusion(confusion_update(lin_p, label, nc, 0))

    rows = {}
    for k, (cm, lm) in metrics.items():
        c, l = cm.compute(), lm.compute()
        rows[k] = {"Cluster_mIoU": c["iou"], "Cluster_Accuracy":
                   c["accuracy"], "Linear_mIoU": l["iou"],
                   "Linear_Accuracy": l["accuracy"]}
    return {
        "metrics": rows,
        "agreement": {k: float(np.mean(v)) for k, v in agree.items()},
        "ms_per_img": {"exact": 1e3 * t_exact / (2 * n_imgs),
                       "lattice": 1e3 * t_lattice / (2 * n_imgs)},
        "n_imgs": n_imgs, "res": res,
    }


if __name__ == "__main__":
    import json
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    print(json.dumps(run_crf_compare(), indent=1))
