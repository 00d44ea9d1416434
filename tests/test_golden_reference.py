"""Golden parity vs the ACTUAL reference implementation.

Imports the reference's quantizer classes and STEGO loss from
/root/reference (read-only) and checks bit/near-exact agreement of the
JAX ops given identical weights — the north-star parity protocol
(BASELINE.md).  The DINO featurizer itself cannot be instantiated here
(it downloads weights; no egress), so backbone parity is covered by
tests/test_vit.py with a locally constructed torch ViT."""
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

# the reference imports torchmetrics (not in this image); stub the one
# function it pulls so the modules import
import types

if "torchmetrics" not in sys.modules:
    tm = types.ModuleType("torchmetrics")
    tm_f = types.ModuleType("torchmetrics.functional")

    def pairwise_cosine_similarity(x):
        xn = torch.nn.functional.normalize(x, dim=-1)
        return xn @ xn.T

    tm_f.pairwise_cosine_similarity = pairwise_cosine_similarity
    tm.functional = tm_f
    sys.modules["torchmetrics"] = tm
    sys.modules["torchmetrics.functional"] = tm_f

from equss_tpu.ops.quantizer import PQConfig, pq_forward


@pytest.fixture(scope="module")
def reference_pq():
    from model.dino_pqgo import Codebook, ProductQuantizerWrapper

    torch.manual_seed(0)
    wrapper = ProductQuantizerWrapper(
        num_pq=4, num_codebook=32, embed_dim=64,
        beta=0.25, book=1.0, normalize="l2",
        use_weighted_sum=False, need_initialized="none",
        quantizer_cls=Codebook,
    ).eval()
    return wrapper


def test_pq_indices_bit_identical_to_reference(reference_pq):
    """Same weights -> same per-pixel codeword indices and same
    quantized output/vq losses as model/dino_pqgo.py's PQ stack."""
    wrapper = reference_pq
    M, K, d = 4, 32, 16
    codebook = np.stack([
        wrapper.quantizers[m].embedding.weight.detach().numpy()
        for m in range(M)
    ])                                                   # (M, K, d)

    rng = np.random.RandomState(1)
    b, h, w = 2, 7, 7
    z = rng.randn(b, 64, h, w).astype(np.float32)        # NCHW for torch

    with torch.no_grad():
        zt = torch.from_numpy(z)
        z_q_t, (_, _, idx_t), out_t, _ = wrapper(zt, torch.zeros_like(zt))
    idx_t = torch.stack(idx_t, dim=0).numpy()            # (M, b, h, w)
    vq_loss_t = float(out_t["vq-loss"])

    cfg = PQConfig(num_pq=M, num_codebook=K, embed_dim=64,
                   vq_type="param", normalize="l2", beta=0.25, book=1.0)
    z_nhwc = jnp.asarray(np.transpose(z, (0, 2, 3, 1)))
    params = {"codebook": jnp.asarray(codebook)}
    state = {"vq_count": jnp.zeros((M, K))}
    z_q_j, idx_j, aux_j, _ = pq_forward(z_nhwc, params, state, cfg,
                                        training=False)

    # bit-identical assignments
    idx_j_t_layout = np.transpose(np.asarray(idx_j), (3, 0, 1, 2))
    np.testing.assert_array_equal(idx_j_t_layout, idx_t)

    # quantized output identical (STE values = raw codewords)
    zq_t_nhwc = z_q_t.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(z_q_j), zq_t_nhwc,
                               rtol=1e-5, atol=1e-6)

    # vq loss matches the subspace-averaged reference value
    np.testing.assert_allclose(float(aux_j["vq-loss"]), vq_loss_t,
                               rtol=1e-5)


def test_ema_codebook_update_matches_reference():
    """One EMA training step against the reference EMACodebook."""
    from model.dino_pqgo import EMACodebook

    torch.manual_seed(2)
    K, d = 16, 8
    ref = EMACodebook(num_codebook_vectors=K, latent_dim=d,
                      normalize="none", need_initialized="none")
    ref.train()
    weight0 = ref.codebook.weight.detach().numpy().copy()

    rng = np.random.RandomState(3)
    z = rng.randn(2, d, 5, 5).astype(np.float32)         # NCHW

    with torch.no_grad():
        zt = torch.from_numpy(z)
        z_q_t, out_t, _ = ref(zt, 0, it=0)
    weight1_t = ref.codebook.weight.detach().numpy()

    cfg = PQConfig(num_pq=1, num_codebook=K, embed_dim=d, vq_type="ema",
                   normalize="none", decay=0.99, eps=1e-5)
    params = {}
    state = {
        "vq_count": jnp.zeros((1, K)),
        "ema_weight": jnp.asarray(weight0)[None],
        "ema_weight_avg": jnp.asarray(weight0)[None],
        "ema_count": jnp.zeros((1, K)),
    }
    z_nhwc = jnp.asarray(np.transpose(z, (0, 2, 3, 1)))
    z_q_j, idx_j, aux_j, new_state = pq_forward(
        z_nhwc, params, state, cfg, training=True,
        rng=jax.random.PRNGKey(0))

    np.testing.assert_allclose(
        np.asarray(new_state["ema_weight"][0]), weight1_t,
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(z_q_j), z_q_t.permute(0, 2, 3, 1).numpy(),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(aux_j["vq-loss"]),
                               float(out_t["vq-loss"]), rtol=1e-5)


def test_stego_helper_matches_reference_loss():
    """The correlation-loss core vs the reference STEGOLoss.helper with
    identical sampled tensors."""
    from model.loss import STEGOLoss

    cfg_ref = {"pointwise": True, "zero_clamp": True, "stabilize": False,
               "pos_intra_shift": 0.08, "pos_inter_shift": 0.02,
               "neg_inter_shift": 0.66, "pos_intra_weight": 0.67,
               "pos_inter_weight": 0.25, "neg_inter_weight": 0.63,
               "feature_samples": 5, "neg_samples": 2}
    ref = STEGOLoss(cfg=cfg_ref)

    rng = np.random.RandomState(4)
    f1 = rng.randn(2, 8, 5, 5).astype(np.float32)   # NCHW
    f2 = rng.randn(2, 8, 5, 5).astype(np.float32)
    c1 = rng.randn(2, 4, 5, 5).astype(np.float32)
    c2 = rng.randn(2, 4, 5, 5).astype(np.float32)
    with torch.no_grad():
        loss_t, _ = ref.helper(torch.from_numpy(f1), torch.from_numpy(f2),
                               torch.from_numpy(c1), torch.from_numpy(c2),
                               0.08)

    from equss_tpu.losses.stego import StegoLossConfig, _helper

    cfg = StegoLossConfig(pointwise=True, zero_clamp=True, stabilize=False)
    loss_j = _helper(
        jnp.asarray(np.transpose(f1, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(f2, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(c1, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(c2, (0, 2, 3, 1))),
        0.08, cfg)
    np.testing.assert_allclose(np.asarray(loss_j), loss_t.numpy(),
                               rtol=1e-4, atol=1e-5)
