"""Pallas fused attention for the frozen DINO backbone.

The ViT forward is the framework's FLOP budget (dino_featurizer.py's
frozen extractor runs on every train/eval image), and its attention is
HBM-bound under XLA: the (B, H, N, N) probability tensor is materialized
per block (N=785 at 224², N=1601 at the 320² val resolution — ~0.5-2 GB
written + read back per layer at bench batch sizes).

This kernel never materializes the probabilities in HBM.  EQUSS sequence
lengths are short enough that the FULL key/value block fits comfortably
in VMEM (1664×64×bf16 ≈ 208 KB), so each program computes a whole
(block_q, N) logit row block in registers/VMEM, applies the softmax
directly (no online/flash rescaling needed), and contracts with V —
one pass, f32 accumulation on the MXU.

Gradients never flow through the backbone (it is frozen and wrapped in
stop_gradient), so a forward-only kernel serves training and inference.

Numerics: bf16 inputs, f32 logit accumulation and softmax — strictly
tighter than the XLA `attn_bf16` path it replaces (which accumulates
logits in bf16); probabilities are cast to bf16 for the value matmul,
as XLA does. Used only in `attn_bf16` mode; strict-f32 parity runs keep
the einsum path.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(scale: float, n_real: int, q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0]                                   # (bq, hd)
    k = k_ref[0]                                   # (nk_pad, hd)
    v = v_ref[0]                                   # (nk_pad, hd)
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                      # (bq, nk_pad) f32
    if n_real != logits.shape[-1]:
        mask = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) < n_real
        logits = jnp.where(mask, logits, -1e30)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    # normalization deferred PAST the value dot: dividing the (bq, hd)
    # output costs hd/nk as much VPU work as dividing the (bq, nk)
    # probabilities, and the f32 post-dot divide is numerically tighter
    # than normalizing before the bf16 probability cast
    r = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * r
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q"))
def fused_attention(
    q: jnp.ndarray,            # (B, N, H, hd)
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    block_q: int = 2048,
) -> jnp.ndarray:
    """softmax(q kᵀ · scale) v without materializing the probabilities.

    Layout matches the (batch, tokens, heads, head_dim) convention.
    Kernel-only it beats the XLA einsum chain, but END TO END the
    (B, N, H, hd) <-> (B*H, N, hd) transpose/pad passes around it cost
    as much as the attention math at 785 tokens (profiled) — use
    `fused_attention_qkv` in model code; this entry point remains for
    callers that already hold separate q/k/v.
    """
    B, N, H, hd = q.shape
    bq = min(block_q, ((N + 127) // 128) * 128)
    n_pad = (-N) % bq          # q rows pad to the block, keys are masked
    npad = N + n_pad

    def prep(x):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B * H, N, hd)
        return jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))

    qf, kf, vf = prep(q), prep(k), prep(v)
    grid = (B * H, npad // bq)
    interpret = jax.default_backend() != "tpu"    # CPU tests run interpreted
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale, N),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, hd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, hd), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, npad, hd), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * npad * npad * hd,
            bytes_accessed=4 * B * H * npad * hd * q.dtype.itemsize,
            transcendentals=B * H * npad * npad,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    out = out[:, :N].reshape(B, H, N, hd)
    return jnp.transpose(out, (0, 2, 1, 3))


def _attn_qkv_kernel(H: int, C: int, hd: int, scale: float, n_real: int,
                     q_ref, kv_ref, o_ref):
    qt = q_ref[0]                                  # (bq, 3C) bf16
    kv = kv_ref[0]                                 # (npad, 3C) bf16
    for h in range(H):
        q = qt[:, h * hd:(h + 1) * hd]             # (bq, hd)
        k = kv[:, C + h * hd:C + (h + 1) * hd]
        v = kv[:, 2 * C + h * hd:2 * C + (h + 1) * hd]
        logits = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                  # (npad, npad) f32
        if n_real != logits.shape[-1]:
            mask = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) < n_real
            logits = jnp.where(mask, logits, -1e30)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        # normalize the (bq, hd) OUTPUT, not the (bq, npad)
        # probabilities — same softmax, hd/npad as much divide work,
        # and the f32 post-dot scale is tighter than normalizing
        # before the bf16 probability cast (see _attn_kernel)
        r = 1.0 / jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * r
        o_ref[0, :, h * hd:(h + 1) * hd] = out.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "scale", "n_real"))
def fused_attention_qkv(
    qkv: jnp.ndarray,          # (B, N, 3C), channel layout [3][H][hd]
    *,
    num_heads: int,
    scale: float,
    n_real: Optional[int] = None,
) -> jnp.ndarray:
    """Multi-head softmax attention straight off the qkv projection.

    Takes the qkv Dense output in its native (B, N, 3C) layout — the
    channel axis is [q|k|v] x [head] x [head_dim], exactly
    ``reshape(B, N, 3, H, hd)`` order — loops heads IN-KERNEL with
    64-lane column slices, and writes (B, N, C) ready for the proj
    matmul.  Compared to `fused_attention` this removes every
    (B, N, H, hd) <-> (B*H, N, hd) transpose/pad pass around the kernel:
    profiling the 224^2 bench forward showed those layout copies cost
    as much as the attention math itself, wiping out the kernel's win
    at 785 tokens.  One program per batch element; the whole sequence's
    qkv block (~2 MB at N=896, ~4 MB at N=1664, bf16) plus one
    (npad, npad) f32 logit buffer live in VMEM; probabilities never
    reach HBM.  Numerics match `fused_attention`: f32 logits + softmax
    (strictly tighter than the XLA attn_bf16 path), bf16 probability
    matmul.
    """
    B, N, C3 = qkv.shape
    C = C3 // 3
    hd = C // num_heads
    # n_real < N means the caller already padded the token stream (the
    # ViT pads once after the pos-embed so the 12 per-block pad copies
    # vanish — profiled at 0.4 ms each); keys >= n_real are masked.
    if n_real is None:
        n_real = N
    # q rows are tiled so the scoped-VMEM footprint stays bounded at long
    # sequences (a whole-sequence (npad, npad) f32 logit block at 1664
    # tokens is 11 MB and blows the VMEM budget together with the qkv
    # block); k/v stay whole-sequence resident, so the i-inner grid
    # fetches them once per batch element.  npad never exceeds the
    # 128-rounded N: bq is chosen as the largest 128-multiple DIVISOR of
    # npad <= 1024 (a fixed bq=512 rounded 1601 -> 2048, re-padding
    # every block and adding 28% attention waste at the 320^2 val res).
    npad = ((N + 127) // 128) * 128
    if npad <= 1024:
        bq = npad
    else:
        bq = 128
        for cand in range(1024, 127, -128):
            if npad % cand == 0:
                bq = cand
                break
    qkv_p = jnp.pad(qkv, ((0, 0), (0, npad - N), (0, 0)))
    interpret = jax.default_backend() != "tpu"    # CPU tests run interpreted
    out = pl.pallas_call(
        functools.partial(_attn_qkv_kernel, num_heads, C, hd, scale,
                          n_real),
        grid=(B, npad // bq),
        in_specs=[
            pl.BlockSpec((1, bq, C3), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npad, C3), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, npad, C), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * num_heads * npad * npad * hd,
            bytes_accessed=B * npad * (C3 + C) * qkv.dtype.itemsize,
            transcendentals=B * num_heads * npad * npad,
        ),
        # the default 16 MB scoped-VMEM budget counts the double-buffered
        # whole-sequence k/v block twice; 32 MB keeps the single-fetch
        # layout viable up to the 320^2 val resolution (npad 2048) at
        # ViT-S width.  ViT-B (C=768, 12 heads) needs ~44 MB at 224^2 —
        # widen the budget with the channel count (v5e has 128 MB VMEM;
        # the ViT-S program keeps the measured 32 MB envelope untouched)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(96 if C >= 768 else 32) * 1024 * 1024),
        interpret=interpret,
    )(qkv_p, qkv_p)
    return out[:, :N]
