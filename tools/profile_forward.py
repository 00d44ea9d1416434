"""Profile the bench inference forward and print an op-by-op budget.

Usage:
    python tools/profile_forward.py [--model vit_small] [--batch 128]
                                    [--steps 5] [--top 40]

Traces `--steps` jitted forwards with jax.profiler, parses the xplane
proto (tensorflow.tsl xplane_pb2), aggregates the `XLA Ops` line by
fusion name, and prints per-op device ms/step sorted descending.  This
is the tool behind PERF.md's roofline tables; the classification
(MXU / VPU / layout / HBM) is done by eye from the fusion names — the
tool just produces honest per-op milliseconds.
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp


def parse_xplane(logdir: str, steps: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {logdir}"
    sp = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        sp.ParseFromString(f.read())
    per_op = collections.Counter()
    total_ps = 0
    for plane in sp.planes:
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            meta = plane.event_metadata
            for ev in line.events:
                name = meta[ev.metadata_id].name
                per_op[name] += ev.duration_ps
                total_ps += ev.duration_ps
    return per_op, total_ps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_small")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args(argv)

    from equss_tpu.models.equss import EQUSS, EQUSSConfig
    from equss_tpu.ops.quantizer import PQConfig

    cfg = EQUSSConfig(
        model_type=args.model, patch_size=8, hidden_dim=1024,
        dropout=False, backbone_dtype=jnp.bfloat16, attn_bf16=True,
        pq=PQConfig(num_pq=64, num_codebook=256, embed_dim=1024,
                    vq_type="param", normalize="l2",
                    assign_precision="bf16"),
    )
    model = EQUSS(cfg)
    params, state = model.init(jax.random.PRNGKey(0), img_hw=(224, 224))

    @jax.jit
    def forward(params, state, img):
        out, _ = model.apply(params, state, img, training=False)
        return (jnp.sum(out["indices"])
                + jnp.sum(out["z_q"]).astype(jnp.int32))

    img = jax.random.normal(jax.random.PRNGKey(1),
                            (args.batch, 224, 224, 3), jnp.float32)
    for _ in range(3):
        int(forward(params, state, img))          # compile + warm

    logdir = tempfile.mkdtemp(prefix="equss_prof_")
    jax.profiler.start_trace(logdir)
    for _ in range(args.steps):
        out = forward(params, state, img)
    int(out)
    jax.profiler.stop_trace()

    per_op, total_ps = parse_xplane(logdir, args.steps)
    ms = 1e-9 / args.steps
    print(f"device total: {total_ps * ms:8.3f} ms/step   "
          f"(batch {args.batch}, {args.model})")
    for name, ps in per_op.most_common(args.top):
        print(f"{ps * ms:8.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
