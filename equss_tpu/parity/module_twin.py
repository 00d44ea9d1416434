"""Module-seam twin parity for the six families without trainer twins.

VERDICT r3 #3: hihi / vae / cluster / res / contra / ema have no
model-level parity evidence — their reference END-TO-END recipes crash
at wrapper seams (verified: DINOUnSegWrapper passes ``stage=1`` which
DINOUnSeg.forward doesn't accept, ClusterWrapper passes a ``queue``
DINOCluster doesn't take, DIONEMA's builder import is commented out,
ProxyLoss hard-codes ``.cuda()``), but the reference *model modules*
compute fine when driven directly with correct arguments.  This harness
does exactly that: it drives each torch module at the MODULE seam,
replicating its wrapper's loss assembly, and compares forward outputs +
every emitted loss against this framework's model ``apply``.

Torch-side layout repair (documented, minimal)
----------------------------------------------
dino_unseg / dino_vae / dino_res / dino_contra build their torsos from
``blocks/resnet_linear.py`` whose Enc/Dec blocks are ``nn.Linear`` —
applied by the shipped forwards to NCHW maps, where torch Linear acts on
the WIDTH axis and crashes for any h/w != channel count; DecResBlock
mixes in ``BatchNorm2d`` which additionally rejects the flat layout.
The only self-consistent reading (and the one matching the Conv1x1
lines the Linears replaced, e.g. dino_unseg.py:71 commented) is
CHANNELWISE application.  The repair applied here, and only here:

  * Linear stacks run on (n, d) channel-last flats,
  * 1x1 convs on flats run as ``F.linear`` with their squeezed kernels,
  * BatchNorm2d on flats runs as ``F.batch_norm`` over the channel dim
    (identical math to BN2d per channel),
  * every native-conv segment (strided convs, 3x3 ResBlocks,
    ConvTranspose2d) runs untouched in NCHW.

All repaired segments still execute the reference's OWN parameters and
submodules — nothing is re-implemented on the torch side.

Determinism: photometric aug is precomputed on the host and injected
into both sides (the reference's ``_photo_aug`` is monkeypatched to
return it); ProxyLoss/our proxy_loss draw from injected indices;
res' InfoNCE uses the deterministic ``cal_type='distance'`` miner of
its shipped config (res_baseline.yaml:45); quantizers are the shipped
EMA type (deterministic); dropout off.

Reference seams mirrored: dino_unseg.py:104-140, dino_vae.py:169-234,
dino_res.py:106-199, dino_contra.py:204-261, dino_cluster.py:103-166,
dino_ema.py:139-306, wrapper/{UnsegWrapper,ResWrapper,ClusterWrapper,
EMAWrapper}.py loss assembly.
"""
from __future__ import annotations

import sys
import types
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from equss_tpu.parity.twin import import_reference

FAMILIES = ("hihi", "vae", "res", "contra", "cluster", "ema")


# --------------------------------------------------------------------------
# shared config
# --------------------------------------------------------------------------

def make_module_cfg(family: str, *, hidden_dim: int = 32,
                    embed_dim: int = 16, num_codebook: int = 8,
                    num_pq: int = 2) -> Dict[str, Any]:
    """One config dict both frameworks parse, shaped per family's shipped
    yaml (vq_baseline/pq_vae/res_baseline/pq_contrast/cluster_baseline/
    ema.yaml) at miniature dims."""
    cfg: Dict[str, Any] = {
        "seed": 0,
        "num_classes": 4,
        "model": {
            "name": family,
            "pretrained": {
                "model_type": "vit_small", "dino_patch_size": 8,
                "freeze_backbone": True, "dropout": False,
                "drop_prob": 0.0, "pretrained_weights": None,
                "precision": "f32",
            },
            "hidden_dim": hidden_dim,
            "enc_num_blocks": 1,
            "dec_num_blocks": 2,      # >=2: exercises width-changing DecRes
            "last_norm": False,
            "vq": {
                "vq_type": "ema",     # the shipped configs' type; param-PQ
                                      # crashes in the reference wrapper
                "num_codebooks": [num_codebook, num_codebook],
                "embed_dims": [embed_dim, embed_dim],
                "beta": 0.25, "normalize": "none",
                "use_restart": False, "use_split": False,
                "use_gumbel": False, "use_weighted_sum": False,
                "need_initialized": "none",
                "decay": 0.99, "eps": 1.0e-5,
                "num_pq": [num_pq, num_pq],
                "agg_type": "concat",
                "assign_precision": "exact",
            },
        },
        "loss": {
            "recon_weight": 1.0,
            "vq_weight": 1.0,
        },
        "optimizer": {
            "model": {"name": "adam", "lr": 3.0e-4},
            "cluster": {"name": "adam", "lr": 3.0e-3},
            "linear": {"name": "adam", "lr": 3.0e-3},
        },
        "eval": {"output_type": "feat", "extra_classes": 0},
        "train": {"max_epochs": 1, "clip_grad": 1.0, "num_accum": 1},
    }
    if family in ("vae", "contra"):
        cfg["loss"]["contra_weight"] = {"pos": 0.1, "neg": 0.01}
        cfg["eval"]["output_type"] = "vq1"
    if family == "contra":
        cfg["model"]["k_means"] = {"init": "k-means++", "n_cluster": 4,
                                   "n_pos": 4}
    if family == "res":
        cfg["model"].update(semantic_dim=hidden_dim, local_dim=hidden_dim,
                            agg_type="concat", dec_num_blocks=2)
        cfg["loss"] = {
            "recon_weight": 1.0, "info_nce_weight": 0.1,
            "club_weight": 0.001,
            "info_nce": {"neg_sample": 3, "temperature": 1.0,
                         "normalize": "l2", "cal_type": "distance"},
            "club": {"mi_iter": 3, "clip_grad": 1.0},
        }
        cfg["optimizer"]["club_enc"] = {"name": "adam", "lr": 3.0e-6,
                                        "weight_decay": 0.0}
    if family == "cluster":
        cfg["model"]["semantic_dim"] = hidden_dim   # cluster_baseline.yaml:28
        cfg["loss"] = {"margin_weight": 0.1}
    if family == "ema":
        cfg["model"]["hidden_dim"] = 16
        cfg["model"]["encoder"] = {"momentum": 0.99, "temperature": 1.0}
        cfg["model"]["memory_bank"] = {
            "n_cluster": 4, "queue_size": 6, "num_support": 3,
            "margin": 1.0e9,          # gate closed -> queues static, so
                                      # the proxy loss sees the injected
                                      # bank on both sides
            "enqueue_k": 2,
        }
        cfg["loss"] = {
            "mse_weight": 1.0, "info_nce_weight": 1.0, "stego_weight": 0.0,
            "info_nce": {"temperature": 1.0, "num_queries": 4,
                         "num_neg": 6},
        }
    return cfg


def _stub_faiss():
    if "faiss" not in sys.modules:
        sys.modules["faiss"] = types.ModuleType("faiss")


def build_ref_module(family: str, cfg: Dict[str, Any], seed: int = 0):
    """Construct the reference module with a random-init DINO backbone
    (saved to a throwaway .pth — DinoFeaturizer downloads otherwise)."""
    import_reference()
    _stub_faiss()
    import os
    import tempfile

    import torch

    import model.dino.vision_transformer as vits

    torch.manual_seed(seed)
    pre = cfg["model"]["pretrained"]
    bb = vits.__dict__[pre["model_type"]](
        patch_size=pre["dino_patch_size"], num_classes=0)
    fd, pth = tempfile.mkstemp(suffix=".pth")
    os.close(fd)
    torch.save({"teacher": bb.state_dict()}, pth)
    mcfg = dict(cfg["model"], pretrained=dict(pre, pretrained_weights=pth))
    try:
        if family == "hihi":
            from model.dino_unseg import DINOUnSeg
            return DINOUnSeg(mcfg)
        if family == "vae":
            from model.dino_vae import DINOVae
            return DINOVae(mcfg)
        if family == "res":
            from model.dino_res import DINORes
            return DINORes(mcfg, cfg["loss"])
        if family == "contra":
            from model.dino_contra import DINOContra
            return DINOContra(mcfg)
        if family == "cluster":
            from model.dino_cluster import DINOCluster
            return DINOCluster(mcfg, cfg["loss"], world_size=1)
        if family == "ema":
            from model.dino_ema import DIONEMA
            return DIONEMA(mcfg, cfg["loss"])
        raise ValueError(family)
    finally:
        os.unlink(pth)


# --------------------------------------------------------------------------
# torch-side layout-repair helpers (reference's own parameters throughout)
# --------------------------------------------------------------------------

def _conv1x1_lin(conv, x_flat):
    """1x1 Conv2d applied channelwise to a (n, c) flat."""
    import torch.nn.functional as F

    return F.linear(x_flat, conv.weight[:, :, 0, 0], conv.bias)


def _bn_flat(norm, x_flat, training):
    """BatchNorm2d applied channelwise to a (n, c) flat."""
    import torch.nn.functional as F

    return F.batch_norm(x_flat, norm.running_mean, norm.running_var,
                        norm.weight, norm.bias, training, norm.momentum,
                        norm.eps)


def _dec_block_flat(blk, x, training):
    """resnet_linear.DecResBlock (:84-146) on a (n, c) flat."""
    h = _bn_flat(blk.norm1, x, training)
    h = blk.act1(h)
    h = blk.conv1(h)
    h = _bn_flat(blk.norm2, h, training)
    h = blk.act2(h)
    h = blk.conv2(h)
    if blk.conv_shortcut is not None:
        s = _bn_flat(blk.norm_shortcut, x, training)
        x = blk.conv_shortcut(s)
    return h + x


def _to_flat(x_nchw):
    b, d, h, w = x_nchw.shape
    return x_nchw.permute(0, 2, 3, 1).reshape(-1, d), (b, h, w)


def _to_nchw(flat, shape):
    b, h, w = shape
    return flat.reshape(b, h, w, -1).permute(0, 3, 1, 2).contiguous()


# --------------------------------------------------------------------------
# weight transplant torch -> our param trees
# --------------------------------------------------------------------------

def _arr(t):
    return jnp.asarray(t.detach().cpu().numpy())


def _lin_p(mod):
    p = {"kernel": _arr(mod.weight).T}
    if mod.bias is not None:
        p["bias"] = _arr(mod.bias)
    return p


def _conv1x1_p(mod):
    p = {"kernel": _arr(mod.weight)[:, :, 0, 0].T}
    if mod.bias is not None:
        p["bias"] = _arr(mod.bias)
    return p


def _conv_p(mod):
    """Full conv: torch (out,in,kh,kw) -> flax HWIO (kh,kw,in,out)."""
    p = {"kernel": jnp.transpose(_arr(mod.weight), (2, 3, 1, 0))}
    if mod.bias is not None:
        p["bias"] = _arr(mod.bias)
    return p


def _convT_p(mod):
    """ConvTranspose2d (in,out,kh,kw) -> ConvTranspose2dTorch's
    pre-flipped (kh,kw,out,in) layout (models/heads.py)."""
    w = mod.weight.detach().cpu().numpy()[:, :, ::-1, ::-1]
    return {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)).copy()),
            "bias": _arr(mod.bias)}


def _bn_p(mod):
    return ({"scale": _arr(mod.weight), "bias": _arr(mod.bias)},
            {"mean": _arr(mod.running_mean), "var": _arr(mod.running_var)})


def _lin_enc_block_p(blk):
    p = {"conv1": _lin_p(blk.conv1), "conv2": _lin_p(blk.conv2)}
    if blk.conv_shortcut is not None:
        p["conv_shortcut"] = _lin_p(blk.conv_shortcut)
    return p


def _lin_dec_block_p(blk):
    n1p, n1s = _bn_p(blk.norm1)
    n2p, n2s = _bn_p(blk.norm2)
    p = {"norm1": n1p, "conv1": _lin_p(blk.conv1),
         "norm2": n2p, "conv2": _lin_p(blk.conv2)}
    s = {"norm1": n1s, "norm2": n2s}
    if blk.conv_shortcut is not None:
        nsp, nss = _bn_p(blk.norm_shortcut)
        p["norm_shortcut"] = nsp
        p["conv_shortcut"] = _lin_p(blk.conv_shortcut)
        s["norm_shortcut"] = nss
    return p, s


def _enc_stack_p(seq):
    return {f"enc_{i}": _lin_enc_block_p(b) for i, b in enumerate(seq)}


def _dec_stack_p(seq):
    params, stats = {}, {}
    for i, b in enumerate(seq):
        p, s = _lin_dec_block_p(b)
        params[f"dec_{i}"] = p
        stats[f"dec_{i}"] = s
    return params, stats


def _ema_pq_state(pq_wrapper):
    """ProductQuantizerWrapper of EMAVectorQuantizers -> our stacked EMA
    state containers (ops/quantizer.py pq_init)."""
    qs = list(pq_wrapper.quantizers)
    return {
        "vq_count": jnp.stack([_arr(q.vq_count) for q in qs]),
        "ema_weight": jnp.stack([_arr(q.codebook.weight) for q in qs]),
        "ema_weight_avg": jnp.stack(
            [_arr(q.codebook.weight_avg) for q in qs]),
        "ema_count": jnp.stack([_arr(q.codebook.vq_count) for q in qs]),
    }


def _club_p(club):
    """Reference CLUBEncoder Sequentials -> our CLUBEncoder names
    (p_mu: Linears at indices 0,2,4,6,8; p_logvar: 0..10 step 2)."""
    p = {}
    for i, idx in enumerate(range(0, 8, 2)):
        p[f"p_mu_fc{i}"] = _lin_p(club.p_mu[idx])
    p["p_mu_out"] = _lin_p(club.p_mu[8])
    for i, idx in enumerate(range(0, 10, 2)):
        p[f"p_logvar_fc{i}"] = _lin_p(club.p_logvar[idx])
    p["p_logvar_out"] = _lin_p(club.p_logvar[10])
    p["p_residual"] = _lin_p(club.p_residual[0])
    return p


def _backbone_p(ref_module, our_model):
    from equss_tpu.models.vit import convert_dino_torch_state

    return convert_dino_torch_state(
        ref_module.extractor.backbone.state_dict(), our_model.vit_cfg)


# --------------------------------------------------------------------------
# per-family torch forward drivers (wrapper loss assembly at the seam)
# --------------------------------------------------------------------------

def torch_unseg_forward(m, img_t, training: bool):
    """dino_unseg.py:104-140 with the channelwise repair; loss assembly
    recon*w + sum(vq_i)*w per DINOUnSegWrapper.py:60-74 (its contra/stego
    terms read keys DINOUnSeg never emits — dead as shipped)."""
    import torch
    import torch.nn.functional as F

    m.train(training)
    with torch.no_grad() if not training else torch.enable_grad():
        dino = m.extractor(img_t)
    flat, shape = _to_flat(dino)
    feat = m.enc_proj(flat)
    out: Dict[str, Any] = {}
    vqs = []
    for i in range(m.num_vq):
        fi = _conv1x1_lin(m.vq_input_proj[i][1], m.vq_input_proj[i][0](feat))
        q_i, o_i, _prob = m.vq_blocks[i](fi)
        vqs.append(q_i)
        for k, v in o_i.items():
            out[f"vq{i}-{k}"] = v
        if i < m.num_vq - 1:
            feat = _conv1x1_lin(m.vq_output_proj[i][0],
                                torch.cat([feat, q_i], dim=1))
    agg_in = (torch.cat(vqs, dim=1) if m.agg_type == "concat"
              else sum(vqs))
    feat = _conv1x1_lin(m.vq_aggregate_proj, agg_in)
    x = feat
    for blk in m.dec_proj:
        x = _dec_block_flat(blk, x, training)
    if m.dec_norm is not None:
        x = F.layer_norm(x, (x.shape[-1],), m.dec_norm.weight,
                         m.dec_norm.bias, m.dec_norm.eps)
    out["recon-loss"] = F.mse_loss(x, flat)
    return feat, vqs, out, shape


def torch_vae_forward(m, img2_t, training: bool):
    """dino_vae.py:169-234; Linear bottom stack + flat quantizers
    repaired, every conv segment native NCHW."""
    import torch
    import torch.nn.functional as F

    m.train(training)
    with torch.no_grad() if not training else torch.enable_grad():
        dino = m.extractor(img2_t)
    flat, shape = _to_flat(dino)
    fb_flat = m.enc_proj_bottom(flat)
    fb = _to_nchw(fb_flat, shape)
    ft = m.enc_proj_top(fb)
    f0 = m.vq_input_proj[0](ft)
    f0_flat, top_shape = _to_flat(f0)
    q0, o0, p0 = m.vq_blocks[0](f0_flat)
    out = {f"vq0-{k}": v for k, v in o0.items()}
    q0_map = _to_nchw(q0, top_shape)
    d0 = m.dec_proj_top(q0_map)
    f1 = m.aggregate(torch.cat([fb, d0], dim=1))
    f1_flat, _ = _to_flat(f1)
    q1, o1, p1 = m.vq_blocks[1](f1_flat)
    out.update({f"vq1-{k}": v for k, v in o1.items()})
    up0 = m.upsample_t(q0_map)
    feat = torch.cat([up0, _to_nchw(q1, shape)], dim=1)
    recon = m.dec_proj(feat)
    out["recon-loss"] = F.mse_loss(recon, dino)
    n = p0.shape[0] // 2
    out["contra-loss-pos"] = m.jsd(p0[:n], p0[n:])
    n = p1.shape[0] // 2
    out["contra-loss-neg"] = m.jsd(p1[:n], p1[n:])
    return feat, [up0, _to_nchw(q1, shape)], out, shape


def torch_res_forward(m, img_t, aug_t, training: bool, cfg):
    """dino_res.py:106-199 with channelwise repair; the inner mi_iter
    CLUB likelihood loop runs the reference's own Adam + clip recipe
    (ResWrapper/train.py seam; GradScaler disabled = CPU math)."""
    import torch
    import torch.nn.functional as F

    m.train(training)
    img2 = torch.cat([img_t, aug_t], dim=0)
    with torch.no_grad():
        dino = m.extractor(img2)
    flat, shape = _to_flat(dino)
    out: Dict[str, Any] = {}

    club_opt = torch.optim.Adam(m.club_enc.parameters(),
                                lr=cfg["optimizer"]["club_enc"]["lr"])
    if training:
        det_local = m.local_enc_proj(flat).detach()
        l1, l2 = torch.chunk(det_local, 2, dim=0)
        nlls = []
        for _ in range(m.mi_iter):
            club_opt.zero_grad(set_to_none=True)
            mu, logvar = m.club_enc.get_mu_logvar(l1)
            # club_encoder.py:98-108 loglikeli on flats
            ll = 0.01 * (-torch.square(mu - l2) / logvar.exp()
                         - logvar).sum(dim=1).mean(dim=0)
            loss_enc = -ll
            loss_enc.backward()
            torch.nn.utils.clip_grad_norm_(
                m.club_enc.parameters(),
                max_norm=cfg["loss"]["club"]["clip_grad"])
            club_opt.step()
            nlls.append(float(loss_enc.detach()))
        out["club-enc-loss"] = torch.tensor(nlls[-1])
        out["club-enc-loss-first"] = torch.tensor(nlls[0])

    semantic = m.semantic_enc_proj(flat)
    local = m.local_enc_proj(flat)
    feat = _conv1x1_lin(m.aggregate_proj,
                        torch.cat([semantic, local], dim=1))
    x = feat
    for blk in m.dec_proj:
        x = _dec_block_flat(blk, x, training)
    if m.dec_norm is not None:
        x = F.layer_norm(x, (x.shape[-1],), m.dec_norm.weight,
                         m.dec_norm.bias, m.dec_norm.eps)
    out["recon-loss"] = F.mse_loss(x, flat)

    b = img_t.shape[0]
    sem1, sem2 = torch.chunk(semantic, 2, dim=0)
    if training:
        # InfoNCELoss takes NCHW (loss.py:156-165)
        out["info_nce-loss"] = m.infonce_loss(
            _to_nchw(sem1, (b, shape[1], shape[2])),
            _to_nchw(sem2, (b, shape[1], shape[2])))
        loc1, loc2 = torch.chunk(local, 2, dim=0)
        p_mu, p_logvar = m.club_enc.get_mu_logvar(loc1)
        p_logvar = p_logvar + m.club_enc.p_residual(loc1)
        out["club-loss"] = m.club_loss(
            _to_nchw(loc2, (b, shape[1], shape[2])), p_mu, p_logvar)
    return sem1, out, (b, shape[1], shape[2])


def torch_contra_forward(m, img_t, aug_t, training: bool):
    """dino_contra.py:204-261 (stage=0): the shipped flat path, only the
    BN-bearing decoder blocks repaired; aug injected."""
    import torch
    import torch.nn.functional as F

    m.train(training)
    img2 = torch.cat([img_t, aug_t], dim=0)
    with torch.no_grad():
        dino = m.extractor(img2)
    flat, shape = _to_flat(dino)
    feat = m.enc_proj(flat)
    out: Dict[str, Any] = {}
    vqs, probs = [], []
    for i in range(m.num_vq):
        fi = m.vq_input_proj[i](feat)          # LeakyReLU + Linear: native
        q_i, o_i, prob = m.vq_blocks[i](fi)
        vqs.append(q_i)
        probs.append(prob)
        for k, v in o_i.items():
            out[f"vq{i}-{k}"] = v
        if i < m.num_vq - 1:
            feat = m.vq_output_proj[i](torch.cat([feat, q_i], dim=1))
    agg_in = (torch.cat(vqs, dim=1) if m.agg_type == "concat"
              else sum(vqs))
    feat = m.vq_aggregate_proj(agg_in)
    x = feat
    for blk in m.dec_proj:
        x = _dec_block_flat(blk, x, training)
    out["recon-loss"] = F.mse_loss(x, flat)
    n = probs[0].shape[0] // 2
    out["contra-loss-pos"] = m.jsd(probs[0][:n], probs[0][n:])
    out["contra-loss-neg"] = m.jsd(probs[-1][:n], probs[-1][n:])
    return feat, vqs, out, shape


def torch_cluster_forward(m, img_t, aug_t, training: bool):
    """dino_cluster.py:103-166 — runs natively (module.py conv blocks);
    only the broken wrapper seam (extra queue arg) is bypassed."""
    m.train(training)
    dino_feat, sem1, _none, out = m(img_t, aug_t)
    return sem1, out


def torch_ema_forward(m, img_t, aug_t, training: bool,
                      bank: Tuple[np.ndarray, np.ndarray],
                      proxy_idx: Tuple[np.ndarray, np.ndarray]):
    """dino_ema.py:225-306 driven directly: faiss init bypassed by
    injecting the bank, single-process gather shim, ProxyLoss draws
    injected (it hard-codes .cuda() + torch.randint, loss.py:233-263)
    but computed through torch ops with the reference's exact formula."""
    import torch
    import torch.nn.functional as F

    m.train(training)
    m.need_initialize = False
    cents, queue = bank
    with torch.no_grad():
        m.centroid.weight.data.copy_(torch.from_numpy(cents))
    m.queue = [torch.from_numpy(queue[i]).clone()
               for i in range(m.n_cluster)]
    m.gather_together = lambda data: [data]

    out: Dict[str, Any] = {}
    dino_ori = m.extractor(img_t)
    dino_ori = m.dropout(dino_ori)
    dino_aug = m.extractor(aug_t)
    dino_aug = m.dropout(dino_aug)

    z1_1 = m.trainable_head(dino_ori)
    m.b, m.d, m.h, m.w = z1_1.shape
    norm_z1_1 = m._normalize(z1_1)
    with torch.no_grad():
        m._momentum_update_ema_head()
        z1_2 = m.ema_head(dino_aug)
        norm_z1_2 = m._normalize(z1_2).clone().detach()
    out["mse-loss"] = F.mse_loss(norm_z1_1, norm_z1_2)

    m._update_queue(z1_1.detach(), norm_z1_1.detach())

    # injected-draw ProxyLoss (loss.py:223-265 formula verbatim)
    q_idx, neg_idx = proxy_idx
    t = m.info_nce.temperature
    nq, nn_ = m.info_nce.num_queries, m.info_nce.num_neg
    loss = torch.tensor(0.0)
    for i in range(m.n_cluster):
        query = m.queue[i][torch.from_numpy(q_idx[i])].clone()
        centroid = m.centroid.weight[i].unsqueeze(0).unsqueeze(0).repeat(
            nq, 1, 1)
        others = [m.queue[j] for j in range(m.n_cluster) if j != i]
        neg_pool = torch.cat(others, dim=0)
        neg = neg_pool[torch.from_numpy(neg_idx[i])].reshape(nq, nn_, -1)
        all_feat = torch.cat((centroid, neg), dim=1)
        logits = torch.cosine_similarity(query.unsqueeze(1), all_feat,
                                         dim=2)
        loss = loss + F.cross_entropy(
            logits / t, torch.zeros(nq).long())
    out["info_nce-loss"] = loss / m.n_cluster
    return z1_1, out


# --------------------------------------------------------------------------
# transplant per family
# --------------------------------------------------------------------------

def transplant(family: str, ref, our_model, params, state):
    """Copy the torch module's tensors into our (params, state) trees."""
    import torch  # noqa: F401

    params = jax.device_get(params)
    state = jax.device_get(state)
    params = dict(params, backbone=_backbone_p(ref, our_model))

    if family in ("hihi", "contra"):
        net = {"enc": _enc_stack_p(ref.enc_proj)}
        for i in range(ref.num_vq):
            proj = ref.vq_input_proj[i][1]
            net[f"vq_in_{i}"] = (_conv1x1_p(proj) if family == "hihi"
                                 else _lin_p(proj))
        for i in range(ref.num_vq - 1):
            proj = ref.vq_output_proj[i][0]
            net[f"vq_out_{i}"] = (_conv1x1_p(proj) if family == "hihi"
                                  else _lin_p(proj))
        net["agg"] = (_conv1x1_p(ref.vq_aggregate_proj)
                      if family == "hihi" else _lin_p(ref.vq_aggregate_proj))
        dec_p, dec_s = _dec_stack_p(ref.dec_proj)
        net["dec"] = dec_p
        params["net"] = net
        state = dict(state,
                     pq=[_ema_pq_state(vq) for vq in ref.vq_blocks],
                     batch_stats={"dec": dec_s})
    elif family == "vae":
        net = {
            "enc_bottom": _enc_stack_p(ref.enc_proj_bottom),
            "enc_top_conv": _conv_p(ref.enc_proj_top[1]),
            "enc_top_out": _conv1x1_p(ref.enc_proj_top[3]),
            "vq_in_0": _conv1x1_p(ref.vq_input_proj[0][1]),
            "dec_top_in": _conv1x1_p(ref.dec_proj_top[0]),
            "dec_top_up": _convT_p(ref.dec_proj_top[-1]),
            "upsample_t": _convT_p(ref.upsample_t),
            "aggregate": _conv1x1_p(ref.aggregate[0]),
            "dec_in": _conv1x1_p(ref.dec_proj[0]),
            "dec_out": _conv1x1_p(ref.dec_proj[-1]),
        }
        n_res = ref.cfg["dec_num_blocks"]
        for i in range(n_res):
            rb = ref.dec_proj_top[1 + i]       # ResBlock(conv: ReLU,3x3,ReLU,1x1)
            net[f"dec_top_res_{i}"] = {"conv1": _conv_p(rb.conv[1]),
                                       "conv2": _conv1x1_p(rb.conv[3])}
            rb = ref.dec_proj[1 + i]
            net[f"dec_res_{i}"] = {"conv1": _conv_p(rb.conv[1]),
                                   "conv2": _conv1x1_p(rb.conv[3])}
        params["net"] = net
        state = dict(state,
                     pq=[_ema_pq_state(vq) for vq in ref.vq_blocks],
                     batch_stats={})
    elif family == "res":
        params["semantic"] = _enc_stack_p(ref.semantic_enc_proj)
        params["local"] = _enc_stack_p(ref.local_enc_proj)
        params["agg"] = _conv1x1_p(ref.aggregate_proj)
        dec_p, dec_s = _dec_stack_p(ref.dec_proj)
        params["dec"] = dec_p
        state = dict(state, batch_stats={"dec": dec_s},
                     club_enc=_club_p(ref.club_enc))
        state["club_opt"] = our_model.club_tx.init(state["club_enc"])
    elif family == "cluster":
        # module.py EncResBlock: conv1/conv2/conv_shortcut are 1x1 convs
        net = {}
        for i, blk in enumerate(ref.semantic_enc_proj):
            p = {"conv1": _conv1x1_p(blk.conv1),
                 "conv2": _conv1x1_p(blk.conv2)}
            if blk.conv_shortcut is not None:
                p["conv_shortcut"] = _conv1x1_p(blk.conv_shortcut)
            net[f"enc_{i}"] = p
        params["net"] = net
    elif family == "ema":
        def head_p(h):
            return {"cluster1": _conv1x1_p(h.cluster1[0]),
                    "cluster2_fc1": _conv1x1_p(h.cluster2[0]),
                    "cluster2_fc2": _conv1x1_p(h.cluster2[2])}

        params["head"] = head_p(ref.trainable_head)
        params["centroid"] = _arr(ref.centroid.weight)
        state = dict(state, ema_head=head_p(ref.ema_head))
    else:
        raise ValueError(family)
    return params, state


# --------------------------------------------------------------------------
# the twin run
# --------------------------------------------------------------------------

def _rel(a: float, b: float) -> float:
    return abs(a - b) / max(abs(a), abs(b), 1e-12)


def run_module_twin(family: str, *, res: int = 32, batch: int = 2,
                    seed: int = 0) -> Dict[str, Any]:
    """One training-mode forward through both stacks from identical
    weights and inputs; returns per-loss rows + forward-output diffs."""
    from equss_tpu.data.transforms import normalize_images
    from equss_tpu.models.registry import build_model

    cfg = make_module_cfg(family)
    ref = build_ref_module(family, cfg, seed=seed)
    import torch

    our = build_model(cfg)
    params, state = our.init(jax.random.PRNGKey(seed), img_hw=(res, res))
    params, state = transplant(family, ref, our, params, state)

    rng = np.random.RandomState(seed + 3)
    img = rng.rand(batch, res, res, 3).astype(np.float32)
    img_n = np.asarray(normalize_images(jnp.asarray(img)))
    # the reference's _photo_aug distribution (dino_res.py:70-79),
    # precomputed and fed to BOTH sides
    scale = rng.uniform(0.9, 1.1, (batch, 1, 1, 3)).astype(np.float32)
    offset = rng.uniform(-0.1, 0.1, (batch, 1, 1, 3)).astype(np.float32)
    aug_n = img_n * scale + offset

    t_img = torch.from_numpy(img_n.transpose(0, 3, 1, 2)).contiguous()
    t_aug = torch.from_numpy(aug_n.transpose(0, 3, 1, 2)).contiguous()

    rows: Dict[str, Dict[str, float]] = {}
    out_diff: Dict[str, float] = {}
    key = jax.random.PRNGKey(seed + 11)

    def add_rows(t_out, j_aux, keys):
        for k in keys:
            rv, jv = float(t_out[k].detach()), float(j_aux[k])
            rows[k] = {"ref": rv, "jax": jv, "rel": _rel(rv, jv)}

    def code_diff(name, t_feat_nchw, j_code_nhwc):
        t_np = t_feat_nchw.detach().cpu().numpy()
        j_np = np.asarray(j_code_nhwc)
        if j_np.ndim == 4:
            j_np = j_np.transpose(0, 3, 1, 2)
        out_diff[name] = float(np.max(np.abs(t_np - j_np)))

    if family == "hihi":
        t_feat, t_vqs, t_out, shape = torch_unseg_forward(ref, t_img, True)
        j_out, j_state = our.apply(params, state, jnp.asarray(img_n),
                                   training=True, rng=key)
        add_rows(t_out, j_out["aux"], ["recon-loss", "vq0-loss", "vq1-loss"])
        code_diff("code", _to_nchw(t_feat, shape), j_out["code"])
        code_diff("z_q0", _to_nchw(t_vqs[0], shape), j_out["feat_vqs"][0])
        # EMA codebooks advanced identically
        new_w = np.concatenate([
            np.asarray(s["ema_weight"]).reshape(-1) for s in j_state["pq"]])
        ref_w = np.concatenate([
            q.codebook.weight.detach().numpy().reshape(-1)
            for vq in ref.vq_blocks for q in vq.quantizers])
        out_diff["ema_weight"] = float(np.max(np.abs(new_w - ref_w)))
    elif family == "vae":
        img2 = np.concatenate([img_n, aug_n], axis=0)
        t2 = torch.from_numpy(img2.transpose(0, 3, 1, 2)).contiguous()
        t_feat, t_vqs, t_out, shape = torch_vae_forward(ref, t2, True)
        j_out, _ = our.apply(params, state, jnp.asarray(img_n),
                             aug_img=jnp.asarray(aug_n), training=True,
                             rng=key)
        add_rows(t_out, j_out["aux"],
                 ["recon-loss", "vq0-loss", "vq1-loss",
                  "contra-loss-pos", "contra-loss-neg"])
        b = batch
        code_diff("z_q0", t_vqs[0][:b], j_out["feat_vqs"][0])
        code_diff("z_q1", t_vqs[1][:b], j_out["feat_vqs"][1])
    elif family == "res":
        t_sem1, t_out, shape = torch_res_forward(ref, t_img, t_aug, True,
                                                 cfg)
        j_out, j_state = our.apply(params, state, jnp.asarray(img_n),
                                   aug_img=jnp.asarray(aug_n),
                                   training=True, rng=key)
        add_rows(t_out, j_out["aux"],
                 ["recon-loss", "info_nce-loss", "club-loss",
                  "club-enc-loss", "club-enc-loss-first"])
        code_diff("code", _to_nchw(t_sem1, shape), j_out["code"])
    elif family == "contra":
        t_feat, t_vqs, t_out, shape = torch_contra_forward(
            ref, t_img, t_aug, True)
        j_out, _ = our.apply(params, state, jnp.asarray(img_n),
                             aug_img=jnp.asarray(aug_n), training=True,
                             rng=key)
        add_rows(t_out, j_out["aux"],
                 ["recon-loss", "vq0-loss", "vq1-loss",
                  "contra-loss-pos", "contra-loss-neg"])
        b2 = 2 * batch
        code_diff("code",
                  _to_nchw(t_feat, (b2, shape[1], shape[2]))[:batch],
                  j_out["code"])
    elif family == "cluster":
        t_sem1, t_out = torch_cluster_forward(ref, t_img, t_aug, True)
        j_out, _ = our.apply(params, state, jnp.asarray(img_n),
                             aug_img=jnp.asarray(aug_n), training=True,
                             rng=key)
        rows["margin-loss"] = {
            "ref": float(t_out["margin"].detach()),
            "jax": float(j_out["aux"]["margin-loss"]),
            "rel": _rel(float(t_out["margin"].detach()),
                        float(j_out["aux"]["margin-loss"]))}
        code_diff("code", t_sem1, j_out["code"])
    elif family == "ema":
        mb = cfg["model"]["memory_bank"]
        inr = cfg["loss"]["info_nce"]
        C, Q, d = mb["n_cluster"], mb["queue_size"], cfg["model"]["hidden_dim"]
        bank_rng = np.random.RandomState(seed + 17)
        cents = bank_rng.randn(C, d).astype(np.float32)
        queue = bank_rng.randn(C, Q, d).astype(np.float32)
        q_idx = bank_rng.randint(0, Q, (C, inr["num_queries"]))
        neg_idx = bank_rng.randint(
            0, (C - 1) * Q, (C, inr["num_queries"] * inr["num_neg"]))
        t_z, t_out = torch_ema_forward(ref, t_img, t_aug, True,
                                       (cents, queue), (q_idx, neg_idx))
        params["centroid"] = jnp.asarray(cents)
        state = dict(state, queue=jnp.asarray(queue),
                     bank_initialized=jnp.ones((), jnp.int32))
        j_out, j_state = our.apply(params, state, jnp.asarray(img_n),
                                   aug_img=jnp.asarray(aug_n),
                                   training=True, rng=key,
                                   proxy_idx=(q_idx, neg_idx))
        add_rows(t_out, j_out["aux"], ["mse-loss", "info_nce-loss"])
        code_diff("code", t_z, j_out["code"])
        # momentum-updated teacher heads advanced identically
        t_ema = np.concatenate([p.detach().numpy().reshape(-1)
                                for p in ref.ema_head.parameters()])
        j_ema = np.concatenate([np.asarray(x).reshape(-1) for x in
                                jax.tree.leaves(j_state["ema_head"])])
        out_diff["ema_head"] = float(np.max(np.abs(np.sort(t_ema)
                                                   - np.sort(j_ema))))
    else:
        raise ValueError(family)

    return {"rows": rows, "out_diff": out_diff}


def verify_ema_enqueue(*, seed: int = 0) -> Dict[str, Any]:
    """Margin-gate semantics check with the gate OPEN: run the reference
    _update_queue and our fixed-k analogue on identical state; compare
    the SET of enqueued pixels per cluster (order differs by design:
    pixel order vs widest-margin order) for clusters whose eligible
    count <= enqueue_k."""
    cfg = make_module_cfg("ema")
    cfg["model"]["memory_bank"]["margin"] = 0.05
    cfg["model"]["memory_bank"]["enqueue_k"] = 64   # >= any eligible count
    ref = build_ref_module("ema", cfg, seed=seed)
    import torch

    from equss_tpu.models.registry import build_model

    our = build_model(cfg)
    mb = cfg["model"]["memory_bank"]
    C, Q, d = mb["n_cluster"], mb["queue_size"], cfg["model"]["hidden_dim"]
    rng = np.random.RandomState(seed + 29)
    cents = rng.randn(C, d).astype(np.float32)
    queue = rng.randn(C, Q, d).astype(np.float32)
    z = rng.randn(40, d).astype(np.float32)

    ref.need_initialize = False
    with torch.no_grad():
        ref.centroid.weight.data.copy_(torch.from_numpy(cents))
    ref.queue = [torch.from_numpy(queue[i]).clone() for i in range(C)]
    ref.gather_together = lambda data: [data]
    zt = torch.from_numpy(z)
    znt = torch.nn.functional.normalize(zt, dim=-1)
    # _update_queue takes raw x as (b, d, h, w) and re-flattens it
    # (dino_ema.py:159-174); shape z so _flatten returns exactly z's rows.
    zt4 = zt.reshape(1, z.shape[0], 1, d).permute(0, 3, 1, 2).contiguous()
    ref.h, ref.w, ref.d = z.shape[0], 1, d
    ref._update_queue(zt4, znt)
    ref_sets = [set(map(tuple, np.round(ref.queue[i].numpy(), 5).tolist()))
                for i in range(C)]

    # our enqueue, replayed standalone (mirrors EMAModel.apply)
    def l2n(x):
        return x / np.maximum(
            np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    zn = l2n(z)
    cn = l2n(cents)
    d2 = (np.sum(zn**2, -1)[None] + np.sum(cn**2, -1)[:, None]
          - 2.0 * cn @ zn.T)
    assign = np.argmin(d2, 0)
    srt = np.sort(d2.T, axis=1)
    gap = srt[:, 1] - srt[:, 0]
    ours_sets = []
    for i in range(C):
        elig = z[(assign == i) & (gap > mb["margin"])]
        row = np.concatenate([queue[i], elig], 0)[-Q:]
        ours_sets.append(set(map(tuple, np.round(row, 5).tolist())))
    matches = [ref_sets[i] == ours_sets[i] for i in range(C)]
    return {"matches": matches, "all_match": all(matches)}
