"""A/B the Pallas PQ assignment kernel against the XLA in-graph path.

Usage:
    python tools/bench_pq_kernel.py [--n 51200 102400] [--exact] [--no-zq]

Measures the full assignment (normalize -> distances -> argmin ->
codeword gather) at the flagship shape (M=64, K=256, d=16, l2) with
device-resident inputs and scalar-fetch timing (PERF.md methodology:
block_until_ready is unreliable over the tunneled axon backend).
The XLA side is the same code pq_apply runs (pairwise_sqdist + argmin +
one-hot gather); the kernel side is ops/pq_pallas.pq_assign_pallas.
Numbers recorded in PERF.md drive the `use_pallas: auto` gate.
"""
from __future__ import annotations

import argparse
import functools
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from equss_tpu.ops.pq_pallas import pq_assign_pallas
from equss_tpu.ops.quantizer import (_gather_codewords, normalize_vectors,
                                     pairwise_sqdist)


def time_fn(fn, *args, iters=10):
    out = fn(*args)
    float(jnp.sum(out[0]))               # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0]))               # force the queued chain
    return (time.perf_counter() - t0) / iters * 1e3


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="+", default=[51200, 102400])
    ap.add_argument("--exact", action="store_true")
    ap.add_argument("--no-zq", action="store_true")
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--M", type=int, default=64)
    ap.add_argument("--K", type=int, default=256)
    ap.add_argument("--d", type=int, default=16)
    args = ap.parse_args(argv)
    M, K, d = args.M, args.K, args.d
    precision = "exact" if args.exact else "bf16"
    want_zq = not args.no_zq

    cb = jax.device_put(jax.random.normal(
        jax.random.PRNGKey(2), (M, K, d), jnp.float32))
    cn = normalize_vectors(cb, "l2")

    @jax.jit
    def xla_path(z, cn, cb):
        zn = normalize_vectors(z, "l2")
        dist = pairwise_sqdist(zn, cn, precision=precision)
        idx = jnp.argmin(dist, -1).astype(jnp.int32)
        if not want_zq:
            return (idx,)
        if precision == "bf16":
            oh = jax.nn.one_hot(idx, K, dtype=jnp.bfloat16)
            zq = jnp.einsum("nmk,mkd->nmd", oh, cb.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        else:
            zq = _gather_codewords(cb, idx)
        return idx, zn, zq

    kern = functools.partial(pq_assign_pallas, normalize="l2",
                             exact=args.exact, want_zq=want_zq,
                             tile_n=args.tile)

    print(f"M={M} K={K} d={d} mode={precision} want_zq={want_zq} "
          f"tile_n={args.tile}")
    for n in args.n:
        z = jax.device_put(jax.random.normal(
            jax.random.PRNGKey(1), (n, M, d), jnp.float32))
        t_x = time_fn(xla_path, z, cn, cb)
        t_k = time_fn(kern, z, cn, cb)
        idx_x = xla_path(z, cn, cb)[0]
        idx_k = kern(z, cn, cb)[0]
        agree = float(jnp.mean((idx_x == idx_k).astype(jnp.float32)))
        print(f"n={n:7d}: xla {t_x:7.2f} ms   kernel {t_k:7.2f} ms   "
              f"({t_x / t_k:4.2f}x)   idx agree {100 * agree:.3f}%")


if __name__ == "__main__":
    main()
