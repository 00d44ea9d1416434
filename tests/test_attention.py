"""Fused Pallas attention (ops/attention.py) vs the XLA einsum path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from equss_tpu.ops.attention import fused_attention


@pytest.mark.parametrize("shape", [(2, 785, 6, 64), (1, 1601, 2, 64),
                                   (1, 5, 2, 64), (2, 128, 1, 32)])
def test_fused_attention_matches_xla(shape):
    B, N, H, hd = shape
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, N, H, hd), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, N, H, hd), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, N, H, hd), jnp.bfloat16)
    scale = hd ** -0.5
    out = np.asarray(fused_attention(q, k, v, scale=scale), np.float32)
    attn = jax.nn.softmax(
        jnp.einsum("bnhd,bmhd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale, -1)
    ref = np.asarray(
        jnp.einsum("bhnm,bmhd->bnhd", attn.astype(jnp.bfloat16), v),
        np.float32)
    assert not np.isnan(out).any()
    # identical up to one bf16 ulp (the kernel accumulates logits in f32,
    # strictly tighter than the bf16-logit XLA path it replaces)
    np.testing.assert_allclose(out, ref, atol=3e-3)


def test_vit_fused_attention_agrees_at_long_seq():
    """The backbone output with the fused kernel matches the einsum path
    at a resolution above fused_attn_min_n."""
    import dataclasses

    from equss_tpu.models.vit import VisionTransformer, make_vit_config

    cfg = make_vit_config("vit_micro", 8, dtype=jnp.bfloat16,
                          attn_bf16=True)
    cfg = dataclasses.replace(cfg, fused_attn_min_n=16)
    vit_f = VisionTransformer(cfg)
    vit_x = VisionTransformer(dataclasses.replace(cfg, fused_attn=False))
    img = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                      jnp.float32)
    params = vit_x.init(jax.random.PRNGKey(0), img)["params"]
    a = np.asarray(vit_x.apply({"params": params}, img)["dense"], np.float32)
    b = np.asarray(vit_f.apply({"params": params}, img)["dense"], np.float32)
    np.testing.assert_allclose(a, b, atol=5e-2)


@pytest.mark.parametrize("shape", [(2, 785, 6, 64), (1, 1601, 2, 64),
                                   (1, 5, 2, 64)])
def test_fused_attention_qkv_matches_xla(shape):
    from equss_tpu.ops.attention import fused_attention_qkv

    B, N, H, hd = shape
    C = H * hd
    rng = np.random.RandomState(1)
    qkv_flat = jnp.asarray(rng.randn(B, N, 3 * C), jnp.bfloat16)
    scale = hd ** -0.5
    out = np.asarray(
        fused_attention_qkv(qkv_flat, num_heads=H, scale=scale), np.float32)
    qkv = qkv_flat.reshape(B, N, 3, H, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    attn = jax.nn.softmax(
        jnp.einsum("bnhd,bmhd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale, -1)
    ref = np.asarray(
        jnp.einsum("bhnm,bmhd->bnhd", attn.astype(jnp.bfloat16), v),
        np.float32).reshape(B, N, C)
    assert not np.isnan(out).any()
    np.testing.assert_allclose(out, ref, atol=3e-3)


def test_fused_layernorm_matches_flax():
    """ops/layernorm kernel vs flax nn.LayerNorm (the bf16 backbone
    path): same f32-stats arithmetic, bf16 output rounding."""
    import flax.linen as nn
    from equss_tpu.ops.layernorm import fused_layernorm

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 100, 384).astype(np.float32))
    scale = jnp.asarray(rng.randn(384).astype(np.float32))
    bias = jnp.asarray(rng.randn(384).astype(np.float32))

    ref_mod = nn.LayerNorm(epsilon=1e-6, dtype=jnp.bfloat16)
    ref = ref_mod.apply({"params": {"scale": scale, "bias": bias}},
                        x.astype(jnp.bfloat16))
    out = fused_layernorm(x.astype(jnp.bfloat16), scale, bias, 1e-6)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)
    # mismatch must be bf16 rounding only: compare both to the f32 math
    exact = (x - x.mean(-1, keepdims=True)) / jnp.sqrt(
        x.var(-1, keepdims=True) + 1e-6) * scale + bias
    assert float(jnp.max(jnp.abs(
        out.astype(jnp.float32) - exact))) < 0.1

    # gradient path (unused by the frozen backbone, but must be correct)
    g = jax.grad(lambda a: jnp.sum(
        fused_layernorm(a, scale, bias, 1e-6).astype(jnp.float32)))(x)
    g_ref = jax.grad(lambda a: jnp.sum(
        ((a - a.mean(-1, keepdims=True))
         / jnp.sqrt(a.var(-1, keepdims=True) + 1e-6) * scale + bias)))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)
