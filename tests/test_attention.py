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
    # a few bf16 ulps: the kernel accumulates logits in f32 (tighter
    # than the bf16-logit XLA path it replaces) but normalizes AFTER
    # the bf16 probability dot (ops/attention.py) — the probabilities
    # round at a different point than this pre-normalized reference
    np.testing.assert_allclose(out, ref, atol=1.2e-2)


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
                                   (1, 5, 2, 64),
                                   # ViT-B width (C=768, 12 heads) — on
                                   # real TPU this also needs the widened
                                   # scoped-VMEM budget (PERF.md #17)
                                   (1, 785, 12, 64)])
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
    # tolerance rationale: see test_fused_attention_matches_xla
    np.testing.assert_allclose(out, ref, atol=1.2e-2)


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


def test_fused_add_layernorm_matches_reference():
    from equss_tpu.ops.layernorm import fused_add_layernorm

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(3, 70, 384).astype(np.float32))
    y = jnp.asarray(rng.randn(3, 70, 384).astype(np.float32))
    scale = jnp.asarray(rng.randn(384).astype(np.float32))
    bias = jnp.asarray(rng.randn(384).astype(np.float32))
    s, o = fused_add_layernorm(x.astype(jnp.bfloat16),
                               y.astype(jnp.bfloat16), scale, bias, 1e-6)
    t = (x.astype(jnp.bfloat16) + y.astype(jnp.bfloat16)).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(s, np.float32), np.asarray(t),
                               atol=1e-6)
    exact = ((t - t.mean(-1, keepdims=True))
             / jnp.sqrt(t.var(-1, keepdims=True) + 1e-6) * scale + bias)
    np.testing.assert_allclose(np.asarray(o, np.float32), np.asarray(exact),
                               rtol=2e-2, atol=2e-2)
    # grads flow to BOTH operands through the pair of outputs
    def f(a, b):
        s2, o2 = fused_add_layernorm(a, b, scale, bias, 1e-6)
        return jnp.sum(s2.astype(jnp.float32) * 0.3
                       + o2.astype(jnp.float32))
    ga, gb = jax.grad(f, argnums=(0, 1))(x, y)
    def f_ref(a, b):
        t2 = a + b
        n2 = ((t2 - t2.mean(-1, keepdims=True))
              / jnp.sqrt(t2.var(-1, keepdims=True) + 1e-6) * scale + bias)
        return jnp.sum(t2 * 0.3 + n2)
    ra, rb = jax.grad(f_ref, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=1e-3,
                               atol=1e-3)


def test_vit_fused_ln_path_matches_stock():
    """The fused add+LN ViT path (ViTConfig.fused_ln, pending-residual
    threading through Block) matches the stock flax-LN bf16 backbone.
    Default-off (measured slower, PERF.md r3 #9) but kept as a tested
    option."""
    import dataclasses

    from equss_tpu.models.vit import VisionTransformer, make_vit_config

    cfg = make_vit_config("vit_micro", 8, dtype=jnp.bfloat16,
                          attn_bf16=True)
    vit_stock = VisionTransformer(dataclasses.replace(cfg, fused_ln=False))
    vit_fused = VisionTransformer(dataclasses.replace(cfg, fused_ln=True))
    img = jnp.asarray(np.random.RandomState(3).rand(1, 64, 64, 3),
                      jnp.float32)
    params = vit_stock.init(jax.random.PRNGKey(0), img)["params"]
    a = np.asarray(vit_stock.apply({"params": params}, img)["dense"],
                   np.float32)
    b = np.asarray(vit_fused.apply({"params": params}, img)["dense"],
                   np.float32)
    np.testing.assert_allclose(a, b, atol=5e-2)
    # param trees identical -> torch checkpoint conversion unaffected
    p2 = vit_fused.init(jax.random.PRNGKey(0), img)["params"]
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(p2)
