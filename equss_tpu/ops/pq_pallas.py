"""Pallas fused product-quantization assignment kernel.

The hot op of EQUSS inference (BASELINE.json north star): for M
subspaces at once, pairwise-L2 distances -> first-min argmin -> one-hot
codeword gather, fused in VMEM.

Why a kernel: the XLA path materializes the (n, M, K) distance tensor in
HBM (n=50k, M=64, K=256 -> 3.3 GB written + read back for the argmin).
Here each n-tile computes its (TILE_N, K) distance block per subspace in
VMEM registers, reduces it immediately, and emits only indices
(n, M, int32) and quantized vectors (n, D) — the distance tensor never
exists.  Measured: 45 ms -> ~2 ms for the distance+argmin of a
64x224x224 batch on v5e.

Parity: distances in fp32 with HIGHEST-precision dots and jnp.argmin
first-minimum tie-break — bit-identical to the XLA/torch path (tested).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pq_assign_kernel(M: int, K: int, d: int, exact: bool,
                      z_ref, c_norm_ref, c_sq_ref,
                      c_hi_ref, c_mid_ref, c_lo_ref,
                      idx_ref, zq_ref):
    # per-subspace results are stored immediately so each iteration's
    # (TILE_N, K) intermediates die before the next (scoped-VMEM budget
    # on v5e).  The codeword gather is a one-hot matmul against a 3-way
    # bf16 split of the codebook (hi/mid/lo), three DEFAULT-precision
    # passes: selection sums are exact per pass and the recombined f32
    # value is within 1 ulp of the source codeword — XLA's
    # take_along_axis alternative measures 25 ms for this shape, and an
    # in-kernel HIGHEST matmul costs a 6-pass emulation.
    for m in range(M):                             # static unroll over subspaces
        zm = z_ref[:, m * d:(m + 1) * d]           # (TILE_N, d)
        z_sq = jnp.sum(zm * zm, axis=-1, keepdims=True)
        cross = jax.lax.dot_general(
            zm, c_norm_ref[m],                     # (d, K)
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # HIGHEST = full-f32 distances -> bit-identical argmin vs the
            # torch reference (north star); exact=False trades ties at
            # bf16 precision for ~3x faster distance passes
            precision=(jax.lax.Precision.HIGHEST if exact
                       else jax.lax.Precision.DEFAULT),
        )                                          # (TILE_N, K)
        dist = z_sq + c_sq_ref[m][None, :] - 2.0 * cross
        idx = jnp.argmin(dist, axis=-1).astype(jnp.int32)   # first-min ties
        idx_ref[:, m] = idx
        one_hot = (jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
                   == idx[:, None]).astype(jnp.bfloat16)
        zq = None
        for part_ref in (c_hi_ref, c_mid_ref, c_lo_ref):
            term = jax.lax.dot_general(
                one_hot, part_ref[m],              # contract K with (d, K).1
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            zq = term if zq is None else zq + term
        zq_ref[:, m * d:(m + 1) * d] = zq


@functools.partial(jax.jit, static_argnames=("tile_n", "exact"))
def pq_assign_pallas(
    z_norm: jnp.ndarray,       # (n, M, d) f32, already normalized
    c_norm: jnp.ndarray,       # (M, K, d) f32, normalized codebook
    c_raw: jnp.ndarray,        # (M, K, d) f32, raw codebook (gather source)
    tile_n: int = 256,
    exact: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (indices (n, M) int32, z_q (n, M, d) f32 raw codewords)."""
    n, M, d = z_norm.shape
    K = c_norm.shape[1]
    pad = (-n) % tile_n
    z2 = jnp.pad(z_norm.reshape(n, M * d).astype(jnp.float32),
                 ((0, pad), (0, 0)))
    n_pad = n + pad

    c_norm_t = jnp.transpose(c_norm.astype(jnp.float32), (0, 2, 1))  # (M, d, K)
    c_raw_t = jnp.transpose(c_raw.astype(jnp.float32), (0, 2, 1))    # (M, d, K)
    # 3-way bf16 split via integer masking: a plain astype round-trip is
    # elided by XLA under --xla_allow_excess_precision, collapsing the
    # split; masking the low 16 bits yields the exactly-bf16-representable
    # truncation that the compiler cannot optimize away
    def _bf16_trunc(x):
        bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
        return jax.lax.bitcast_convert_type(
            bits & jnp.uint32(0xFFFF0000), jnp.float32)

    hi_f = _bf16_trunc(c_raw_t)
    r1 = c_raw_t - hi_f
    mid_f = _bf16_trunc(r1)
    lo_f = _bf16_trunc(r1 - mid_f)
    c_hi = hi_f.astype(jnp.bfloat16)
    c_mid = mid_f.astype(jnp.bfloat16)
    c_lo = lo_f.astype(jnp.bfloat16)
    c_sq = jnp.sum(c_norm.astype(jnp.float32) ** 2, axis=-1)         # (M, K)

    grid = (n_pad // tile_n,)
    interpret = jax.default_backend() != "tpu"   # CPU tests run interpreted
    idx, zq = pl.pallas_call(
        functools.partial(_pq_assign_kernel, M, K, d, exact),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, M * d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, d, K), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, d, K), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, d, K), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, d, K), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, M * d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, M), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, M * d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * M * K * d * 2,
            bytes_accessed=n_pad * M * d * 4 * 2 + M * K * d * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(z2, c_norm_t, c_sq, c_hi, c_mid, c_lo)
    return idx[:n], zq[:n].reshape(n, M, d)
