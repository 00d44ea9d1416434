"""Fused LayerNorm Pallas kernel for the (frozen) ViT backbone.

One VMEM pass per row tile: f32 mean/var + normalize + affine, bf16 out.
XLA's LN lowering at the ViT shape ((32, 896, 384) bf16) runs a
convert+reduce fusion at ~120 GB/s effective — 0.368 ms per LN, 4.8 ms
of the 35 ms pqgo train step across 12 blocks (profiled r3).  The fused
kernel reads each element once and writes once (44 MB round trip ->
~0.07 ms/LN at HBM speed).

Numerics: mean/var accumulate in f32 exactly like flax LayerNorm with
``dtype=bfloat16`` (stats are f32, output rounds to bf16); the variance
uses the reference's biased estimator (torch nn.LayerNorm,
vision_transformer.py norm1/norm2).  Only used in bf16 mode — strict
f32 parity configs keep the stock flax path (models/vit.py).

Differentiation: the backbone is frozen (features are stop_gradient'ed,
dino_featurizer.py:18-21), so the kernel only needs a forward; a
custom_vjp recomputes the standard LN gradient with XLA ops for any
future caller that does differentiate through it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(eps: float, x_ref, scale_ref, bias_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)               # (TILE_R, C)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


def _add_ln_kernel(eps: float, x_ref, y_ref, scale_ref, bias_ref,
                   sum_ref, o_ref):
    """(x, y) -> (x+y, LN(x+y)) in one VMEM pass.  Carrying the residual
    stream through the kernel preserves the fusion XLA's own lowering
    gets (residual add folded into the LN reduce) — a plain LN kernel
    measured a wash because it un-fused that add (PERF.md r3 #9)."""
    s = x_ref[...] + y_ref[...]                      # residual dtype (bf16)
    sum_ref[...] = s
    x = s.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layernorm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                    eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm over the last axis; x (..., C), scale/bias (C,)."""
    return _ln_fwd_impl(x, scale, bias, eps)


def _ln_fwd_impl(x, scale, bias, eps):
    orig_shape = x.shape
    C = orig_shape[-1]
    x2 = x.reshape(-1, C)
    n = x2.shape[0]
    tile_r = 512
    pad = (-n) % tile_r
    x2p = jnp.pad(x2, ((0, pad), (0, 0)))
    grid = ((n + pad) // tile_r,)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_r, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x2p.shape, x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(x2p, scale, bias)
    return out[:n].reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_add_layernorm(x: jnp.ndarray, y: jnp.ndarray, scale: jnp.ndarray,
                        bias: jnp.ndarray, eps: float = 1e-6):
    """(x, y) -> (x + y, LayerNorm(x + y)) fused; x/y (..., C)."""
    return _add_ln_fwd_impl(x, y, scale, bias, eps)


def _add_ln_fwd_impl(x, y, scale, bias, eps):
    orig_shape = x.shape
    C = orig_shape[-1]
    x2 = x.reshape(-1, C)
    y2 = y.reshape(-1, C)
    n = x2.shape[0]
    tile_r = 512
    pad = (-n) % tile_r
    x2p = jnp.pad(x2, ((0, pad), (0, 0)))
    y2p = jnp.pad(y2, ((0, pad), (0, 0)))
    grid = ((n + pad) // tile_r,)
    blk = pl.BlockSpec((tile_r, C), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM)
    s, o = pl.pallas_call(
        functools.partial(_add_ln_kernel, eps),
        grid=grid,
        in_specs=[blk, blk, vec, vec],
        out_specs=[blk, blk],
        out_shape=[jax.ShapeDtypeStruct(x2p.shape, x.dtype),
                   jax.ShapeDtypeStruct(x2p.shape, x.dtype)],
        interpret=jax.default_backend() != "tpu",
    )(x2p, y2p, scale, bias)
    return s[:n].reshape(orig_shape), o[:n].reshape(orig_shape)


def _add_ln_fwd(x, y, scale, bias, eps):
    return _add_ln_fwd_impl(x, y, scale, bias, eps), (x, y, scale, bias)


def _add_ln_bwd(eps, res, g):
    x, y, scale, bias = res
    g_sum, g_ln = g

    def ref(a, b, s, bb):
        t = a + b
        return t, _ln_ref(t, s, bb, eps)

    _, vjp = jax.vjp(ref, x, y, scale, bias)
    return vjp((g_sum, g_ln))


fused_add_layernorm.defvjp(_add_ln_fwd, _add_ln_bwd)


def _ln_ref(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32) \
        + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _ln_fwd(x, scale, bias, eps):
    return _ln_fwd_impl(x, scale, bias, eps), (x, scale, bias)


def _ln_bwd(eps, res, g):
    # standard LN gradient via XLA (the frozen-backbone hot path never
    # takes this; correctness over speed here)
    x, scale, bias = res
    _, vjp = jax.vjp(lambda a, s, b: _ln_ref(a, s, b, eps), x, scale, bias)
    return vjp(g)


fused_layernorm.defvjp(_ln_fwd, _ln_bwd)
