"""Golden parity: Flax DINO ViT vs. the reference torch implementation.

The reference repo itself (read-only at /root/reference) is imported as
the oracle — we convert a randomly initialized torch ViT's weights and
require dense-feature agreement to <=1e-4 (SURVEY §7.2 step 2)."""
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from equss_tpu.models.vit import (
    ViTConfig,
    VisionTransformer,
    convert_dino_torch_state,
    make_vit_config,
)
from equss_tpu.ops.resize import resize2d


def _reference_vit(embed_dim=64, depth=3, num_heads=2, patch=8, img=32):
    import model.dino.vision_transformer as vits  # reference oracle

    torch.manual_seed(0)
    return vits.VisionTransformer(
        img_size=[img], patch_size=patch, embed_dim=embed_dim, depth=depth,
        num_heads=num_heads, mlp_ratio=4, qkv_bias=True,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
    ).eval()


def test_resize_bilinear_matches_torch():
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.randn(2, 7, 9, 3).astype(np.float32)
    for ac in [False, True]:
        out_j = resize2d(jnp.asarray(x), (15, 4), "bilinear", align_corners=ac)
        out_t = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=(15, 4),
            mode="bilinear", align_corners=ac,
        ).permute(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                                   rtol=1e-5, atol=1e-6)


def test_resize_bicubic_scale_factor_matches_torch():
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    x = rng.randn(1, 28, 28, 5).astype(np.float32)
    # the exact call shape used by DINO pos-embed interpolation
    sf = ((40 + 0.1) / 28, (40 + 0.1) / 28)
    out_j = resize2d(jnp.asarray(x), (40, 40), "bicubic", scale_factor=sf)
    out_t = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=sf,
        mode="bicubic", recompute_scale_factor=False,
    ).permute(0, 2, 3, 1)
    assert out_t.shape[1:3] == (40, 40)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def vit_pair():
    ref = _reference_vit()
    cfg = ViTConfig(patch_size=8, embed_dim=64, depth=3, num_heads=2,
                    pos_grid=4)
    flax_vit = VisionTransformer(cfg)
    params = convert_dino_torch_state(ref.state_dict(), cfg)
    return ref, flax_vit, {"params": params}


def test_dense_features_match_reference(vit_pair):
    ref, flax_vit, variables = vit_pair
    rng = np.random.RandomState(2)
    img = rng.randn(2, 32, 32, 3).astype(np.float32)

    with torch.no_grad():
        feat_t, _, _ = ref.get_intermediate_feat(
            torch.from_numpy(img).permute(0, 3, 1, 2), n=1
        )
    tokens_t = feat_t[0].numpy()                       # (b, 1+gh*gw, C)

    out = flax_vit.apply(variables, jnp.asarray(img))
    tokens_j = np.asarray(out["tokens"])
    np.testing.assert_allclose(tokens_j, tokens_t, rtol=1e-4, atol=1e-4)

    dense_t = tokens_t[:, 1:, :].reshape(2, 4, 4, 64)
    np.testing.assert_allclose(np.asarray(out["dense"]), dense_t,
                               rtol=1e-4, atol=1e-4)


def test_variable_resolution_pos_interp_matches(vit_pair):
    """Val-res inference (320 vs 224 in the reference) exercises bicubic
    pos-embed interpolation — must still match the oracle."""
    ref, flax_vit, variables = vit_pair
    rng = np.random.RandomState(3)
    img = rng.randn(1, 48, 48, 3).astype(np.float32)   # 6x6 grid != 4x4

    with torch.no_grad():
        feat_t, _, _ = ref.get_intermediate_feat(
            torch.from_numpy(img).permute(0, 3, 1, 2), n=1
        )
    out = flax_vit.apply(variables, jnp.asarray(img))
    np.testing.assert_allclose(
        np.asarray(out["tokens"]), feat_t[0].numpy(), rtol=1e-4, atol=1e-4
    )


def test_make_vit_config_presets():
    cfg = make_vit_config("vit_small", 8)
    assert cfg.embed_dim == 384 and cfg.num_heads == 6 and cfg.depth == 12
    cfg = make_vit_config("vit_base", 16)
    assert cfg.embed_dim == 768 and cfg.num_heads == 12


def test_gelu_tanh_auto_and_feature_agreement():
    """bf16 mode auto-selects the tanh GELU; features stay within
    bf16-class tolerance of the exact-erf path (ViTConfig.gelu_tanh)."""
    import dataclasses

    import numpy as np

    from equss_tpu.models.vit import VisionTransformer, make_vit_config

    cfg_f32 = make_vit_config("vit_micro", 8)
    assert not cfg_f32.gelu_approximate        # strict f32 parity -> erf
    cfg_bf = make_vit_config("vit_micro", 8, dtype=jnp.bfloat16,
                             attn_bf16=True)
    assert cfg_bf.gelu_approximate             # bf16 -> tanh
    cfg_bf_erf = dataclasses.replace(cfg_bf, gelu_tanh=False)

    img = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                      jnp.float32)
    vit_t = VisionTransformer(cfg_bf)
    vit_e = VisionTransformer(cfg_bf_erf)
    params = vit_e.init(jax.random.PRNGKey(0), img)["params"]
    a = np.asarray(vit_e.apply({"params": params}, img)["dense"], np.float32)
    b = np.asarray(vit_t.apply({"params": params}, img)["dense"], np.float32)
    np.testing.assert_allclose(a, b, atol=5e-2)


def test_ln_stats_bf16_opt_in():
    """model.pretrained.ln_stats='bf16' routes to BF16StatsLayerNorm
    (opt-in, PERF.md r5), params transplant-compatible, features within
    bf16-class tolerance of the f32-stats path; default stays f32."""
    import dataclasses

    import numpy as np

    from equss_tpu.models.vit import VisionTransformer, make_vit_config

    cfg = make_vit_config("vit_micro", 8, dtype=jnp.bfloat16,
                          attn_bf16=True)
    assert not cfg.ln_stats_bf16               # default off
    cfg_b = make_vit_config("vit_micro", 8, dtype=jnp.bfloat16,
                            attn_bf16=True, ln_stats="bf16")
    assert cfg_b.ln_stats_bf16
    # f32 mode never routes to bf16 stats regardless of the flag
    cfg_f32 = dataclasses.replace(make_vit_config("vit_micro", 8),
                                  ln_stats_bf16=True)

    img = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3),
                      jnp.float32)
    vit_f = VisionTransformer(cfg)
    vit_b = VisionTransformer(cfg_b)
    params = vit_f.init(jax.random.PRNGKey(0), img)["params"]
    # identical param tree (names 'scale'/'bias') -> same checkpoints load
    params_b = vit_b.init(jax.random.PRNGKey(0), img)["params"]
    assert jax.tree_util.tree_structure(params) \
        == jax.tree_util.tree_structure(params_b)
    a = np.asarray(vit_f.apply({"params": params}, img)["dense"], np.float32)
    b = np.asarray(vit_b.apply({"params": params}, img)["dense"], np.float32)
    np.testing.assert_allclose(a, b, atol=6e-2)
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-8)
    assert rel < 3e-2, f"bf16 LN stats drifted out of class: rel {rel}"
    VisionTransformer(cfg_f32).apply({"params": params}, img)

    import pytest

    with pytest.raises(ValueError):
        make_vit_config("vit_micro", 8, ln_stats="fp8")
