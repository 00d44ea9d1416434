"""Serving-artifact A/B: symbolic-batch (XLA assignment) vs fixed-batch
(Pallas-kernel-capturing) exports at the flagship shape.

Quantifies the serving-vs-live gap VERDICT r4 weak #4 flagged: a
symbolic-batch export can never contain the fused Pallas PQ kernel
(quantizer.py pins the XLA path for unknown n), while
`export.symbolic_batch=off` pins the batch so the TPU trace routes the
kernel into the artifact.  Timing per PERF.md: device-resident input,
fetched scalar as the sync point, best-of-3 windows.

Usage: python tools/bench_serving.py [--batch 128] [--res 224]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def time_predict(predict, img, batch, *, windows=3, iters=12):
    for _ in range(3):                        # compile + warm
        jnp.sum(predict(img)["cluster_preds"]).block_until_ready()
    dts = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = predict(img)
        int(jnp.sum(out["cluster_preds"]))    # force queued chain
        dts.append(time.perf_counter() - t0)
    best = min(dts)
    return {"img_per_sec": round(batch * iters / best, 1),
            "ms_per_call": round(1e3 * best / iters, 2)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--res", type=int, default=224)
    args = ap.parse_args()

    from equss_tpu import serve
    from equss_tpu.core.config import prepare_config
    from equss_tpu.parallel.mesh import make_mesh
    from equss_tpu.train.trainer import Trainer

    cfg, _ = prepare_config([
        "--config", os.path.join(os.path.dirname(__file__), "..",
                                 "configs", "pqgo_cocostuff27.yaml"),
        "debug=true",
    ])
    trainer = Trainer(cfg, mesh=make_mesh(1))
    ts = jax.device_get(trainer.init_state(
        jax.random.PRNGKey(0), img_hw=(args.res, args.res)))

    img = jax.device_put(np.random.RandomState(1).rand(
        args.batch, args.res, args.res, 3).astype(np.float32))

    results = {}
    for mode in ("auto", "off"):
        exported = serve.export_predictor(
            trainer, ts, (args.res, args.res),
            batch_size=args.batch, symbolic_batch=mode)
        predict = serve.load_predictor(bytes(exported.serialize()))
        results[f"symbolic_batch={mode}"] = dict(
            time_predict(predict, img, args.batch),
            input_shape=str(exported.in_avals[0].shape))
        print(f"  symbolic_batch={mode}: {results[f'symbolic_batch={mode}']}")

    print({"batch": args.batch, "res": args.res, **results})


if __name__ == "__main__":
    main()
