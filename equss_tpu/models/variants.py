"""Research-fork model variants of the EQUSS skeleton.

Functional re-designs of the reference's experiment models, all sharing
the frozen-DINO backbone, the heads library and the batched quantizer
ops (so each variant is a thin composition, not a copied file):

* UnSegModel  — dino_unseg.py:12-140 ('hihi', the original enc -> multi-
  VQ chain -> dec reconstruction architecture; also serves vq_baseline)
* NewVQModel  — dino_new_vq.py:38-184 ('new': enc resblocks -> PQ ->
  dec recon + InfoNCE between (img, aug) halves)
* SPQModel    — dino_spq.py:14-161 ('spq': soft product quantization,
  softmax-weighted codeword sums + JSD + InfoNCE)
* ClusterModel— dino_cluster.py:19-166 ('cluster': encoder + margin
  ranking between ori/aug correlation matrices)
* VAEModel    — dino_vae.py:15-238 ('vae': two-level VQ-VAE-2-style
  top/bottom hierarchy + JSD contrast between aug halves)
* InfoModel   — dino_info.py:12-124 ('info': chained-VQ recon)
* ResModel    — dino_res.py:15-162 ('res': semantic+local encoders,
  recon, InfoNCE positive + CLUB MI-minimization negative)

All consume NHWC batches; photometric augmentation happens on device,
IN-GRAPH in the trainer's jitted step for every `consumes_aug` variant
(the reference builds aug_img per sample on the host,
dataset_aug.py:40-52,507-529 — here the batched
data/transforms.photometric_aug runs fused with the forward; a
precomputed batch['aug_img'] still takes precedence when provided).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from equss_tpu.losses.basic import info_nce_loss, jsd_loss, margin_ranking_loss, club_loss
from equss_tpu.models.heads import (
    CLUBEncoder,
    DecResBlock,
    EncResBlock,
    LinDecResBlock,
    LinEncResBlock,
    dropout2d,
)
from equss_tpu.models.vit import VisionTransformer, make_vit_config
from equss_tpu.ops.quantizer import (
    PQConfig,
    pq_data_init,
    pq_forward,
    pq_init,
)


def codebook_usage_percentiles(count: jnp.ndarray, prefix: str = "") -> Dict[str, jnp.ndarray]:
    """p10/p50/p90 of the sorted usage CDF (quantizer.py:15-30,
    dino_new_vq.py:21-36), vectorized."""
    count = count.reshape(-1).astype(jnp.float32)
    k = count.shape[0]
    prob = count / (jnp.sum(count) + 1.0)
    prob = jnp.sort(prob)[::-1]
    c_sum = jnp.cumsum(prob)
    out = {}
    for q in (10, 50, 90):
        idx = jnp.argmax(c_sum >= q / 100.0)
        out[f"{prefix}-p{q}"] = idx / k
    return out


class _BackboneMixin:
    """Shared frozen-DINO featurizer plumbing."""

    # Variants whose contrastive losses consume a photometric aug view set
    # this True; the trainer then generates aug_img in-graph per step
    # (the reference dataset emits it per sample, dataset_aug.py:507-529).
    consumes_aug = False

    def _setup_backbone(self, pre: Dict[str, Any], dtype=None):
        # model.pretrained.precision: 'f32' (default) | 'bf16' — same
        # autocast-analogue derivation as EQUSSConfig.from_config (was
        # previously ignored by every variant: their backbones silently
        # ran f32 einsum attention under configs claiming bf16)
        precision = pre.get("precision", "f32")
        if dtype is None:
            dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
        self.vit_cfg = make_vit_config(pre["model_type"],
                                       pre["dino_patch_size"], dtype=dtype,
                                       attn_bf16=(precision == "bf16"),
                                       gelu=pre.get("gelu"),
                                       ln_stats=pre.get("ln_stats", "f32"))
        self.backbone = VisionTransformer(self.vit_cfg)
        self.feat_dim = self.vit_cfg.embed_dim
        self.patch_size = pre["dino_patch_size"]
        self.dropout = pre.get("dropout", False)
        self.drop_prob = pre.get("drop_prob", 0.1)

    # expose .cfg.patch_size like the other models (trainer contract)
    @property
    def cfg(self):
        import types

        return types.SimpleNamespace(patch_size=self.patch_size)

    def features(self, params, img):
        feat = self.backbone.apply({"params": params["backbone"]}, img)["dense"]
        return jax.lax.stop_gradient(feat.astype(jnp.float32))

    def _init_backbone(self, key, img_hw, backbone_params):
        if backbone_params is None:
            backbone_params = self.backbone.init(
                key, jnp.zeros((1, *img_hw, 3)))["params"]
        return backbone_params


class _EncStack(nn.Module):
    """EncResBlock stack (dino_unseg.py:21-26).

    flavor picks the reference block library the host model imports from:
    'module' = blocks/module.py (dino_cluster, dino_new_vq), 'linear' =
    blocks/resnet_linear.py (dino_unseg/vae/res/contra/info)."""
    hidden_dim: int
    num_blocks: int
    flavor: str = "module"

    @nn.compact
    def __call__(self, x):
        blk = LinEncResBlock if self.flavor == "linear" else EncResBlock
        for i in range(self.num_blocks):
            x = blk(self.hidden_dim, name=f"enc_{i}")(x)
        return x


class _DecStack(nn.Module):
    """DecResBlock stack ending at feat_dim (dino_unseg.py:96-102).
    flavor as in _EncStack."""
    hidden_dim: int
    out_dim: int
    num_blocks: int
    last_norm: bool = False
    flavor: str = "module"

    @nn.compact
    def __call__(self, x, train: bool = True):
        blk = LinDecResBlock if self.flavor == "linear" else DecResBlock
        for i in range(self.num_blocks):
            out = self.out_dim if i == self.num_blocks - 1 else self.hidden_dim
            x = blk(out, name=f"dec_{i}")(x, train=train)
        if self.last_norm:
            x = nn.LayerNorm(name="dec_norm")(x)
        return x


# ---------------------------------------------------------------------------
# UnSeg ('hihi') — enc -> chained multi-VQ -> aggregate -> dec recon
# ---------------------------------------------------------------------------

class _UnSegNet(nn.Module):
    """The trainable torso of DINOUnSeg (dino_unseg.py:20-102), VQ blocks
    excluded (they are functional ops threaded from outside)."""
    hidden_dim: int
    feat_dim: int
    embed_dims: tuple
    enc_num_blocks: int
    dec_num_blocks: int
    agg_type: str = "concat"
    last_norm: bool = False
    # dino_unseg projects with Conv2d(..., bias=False) (dino_unseg.py:71);
    # dino_contra with nn.Linear(...) which carries bias (dino_contra.py:89)
    vq_in_bias: bool = False

    def setup(self):
        # dino_unseg imports its blocks from resnet_linear (dino_unseg.py:7)
        self.enc = _EncStack(self.hidden_dim, self.enc_num_blocks,
                             flavor="linear")
        self.vq_input_proj = [
            nn.Dense(e, use_bias=self.vq_in_bias, name=f"vq_in_{i}")
            for i, e in enumerate(self.embed_dims)]
        self.vq_output_proj = [
            nn.Dense(self.hidden_dim, name=f"vq_out_{i}")
            for i in range(len(self.embed_dims) - 1)]
        self.agg = nn.Dense(self.hidden_dim, name="agg")
        self.dec = _DecStack(self.hidden_dim, self.feat_dim,
                             self.dec_num_blocks, self.last_norm,
                             flavor="linear")

    def encode(self, feat):
        return self.enc(feat)

    def vq_input(self, i, feat):
        # LeakyReLU then 1x1 conv (dino_unseg.py:69-73)
        return self.vq_input_proj[i](nn.leaky_relu(feat, 0.1))

    def vq_output(self, i, feat, feat_vq):
        return self.vq_output_proj[i](jnp.concatenate([feat, feat_vq], -1))

    def decode(self, feat_vqs, train=True):
        if self.agg_type == "concat":
            feat = jnp.concatenate(feat_vqs, axis=-1)
        else:
            feat = sum(feat_vqs)
        feat = self.agg(feat)
        return feat, self.dec(feat, train=train)


class UnSegModel(_BackboneMixin):
    """params={'backbone','net','pq': [..]}, state={'pq': [..]}."""

    _vq_in_bias = False   # dino_unseg.py:71 Conv2d(bias=False)

    def __init__(self, cfg: Dict[str, Any]):
        m = cfg["model"]
        self._setup_backbone(m["pretrained"])
        vq = m["vq"]
        self.hidden_dim = m.get("hidden_dim", self.feat_dim)
        self.embed_dims = tuple(vq["embed_dims"])
        self.num_vq = len(self.embed_dims)
        num_pq = vq.get("num_pq", 1)
        if isinstance(num_pq, int):
            num_pq = [num_pq] * self.num_vq
        self.pq_cfgs = [
            PQConfig(
                num_pq=num_pq[i], num_codebook=vq["num_codebooks"][i],
                embed_dim=self.embed_dims[i], vq_type=vq.get("vq_type", "param"),
                assign_precision=vq.get("assign_precision", "exact"),
                need_initialized=vq.get("need_initialized", "none"),
                beta=vq.get("beta", 0.25), normalize=vq.get("normalize", "none"),
                use_restart=vq.get("use_restart", False),
                use_split=vq.get("use_split", False),
                use_gumbel=vq.get("use_gumbel", False),
                decay=vq.get("decay", 0.99), eps=vq.get("eps", 1e-5),
            )
            for i in range(self.num_vq)
        ]
        self.net = _UnSegNet(
            hidden_dim=self.hidden_dim, feat_dim=self.feat_dim,
            embed_dims=self.embed_dims,
            enc_num_blocks=m.get("enc_num_blocks", 1),
            dec_num_blocks=m.get("dec_num_blocks", 1),
            agg_type=vq.get("agg_type", "concat"),
            last_norm=m.get("last_norm", False),
            vq_in_bias=self._vq_in_bias,
        )
        self._embed_dims_by_type = {"feat": self.feat_dim}

    def output_dim(self, output_type: str) -> int:
        if output_type == "feat":
            return self.feat_dim
        return self.embed_dims[int(output_type[2:])]

    def init(self, key, img_hw=(224, 224), backbone_params=None):
        keys = jax.random.split(key, 2 + self.num_vq)
        backbone_params = self._init_backbone(keys[0], img_hw, backbone_params)
        gh, gw = img_hw[0] // self.patch_size, img_hw[1] // self.patch_size
        dummy = jnp.zeros((1, gh, gw, self.feat_dim))
        net_params = self._init_net(keys[1], dummy)
        pq_params, pq_states = [], []
        for i, c in enumerate(self.pq_cfgs):
            p, s = pq_init(keys[2 + i], c)
            pq_params.append(p)
            pq_states.append(s)
        return (
            {"backbone": backbone_params, "net": net_params, "pq": pq_params},
            {"pq": pq_states, "batch_stats": self._init_bn(dummy, net_params)},
        )

    def _init_net(self, key, dummy):
        def full(net, feat):
            f = net.encode(feat)
            vqs = []
            for i in range(self.num_vq):
                fi = net.vq_input(i, f)
                vqs.append(fi)
                if i < self.num_vq - 1:
                    f = net.vq_output(i, f, fi)
            return net.decode(vqs, train=True)

        variables = self.net.init(key, dummy, method=full)
        self._bn_template = variables.get("batch_stats", {})
        return variables["params"]

    def _init_bn(self, dummy, net_params):
        return getattr(self, "_bn_template", {})

    @property
    def needs_data_init(self) -> bool:
        return any(c.need_initialized in ("kmeans", "rand")
                   for c in self.pq_cfgs)

    def data_init(self, params, state, img, rng):
        """kmeans/rand codebook init from the first train batch, chained
        through the VQ stack so each quantizer clusters its ACTUAL input
        (dino_pqgo.py:341-355, applied per codebook in forward order)."""
        feat_dino = self.features(params, img)

        def full(net, feat):
            f = net.encode(feat)
            new_pq = []
            for i, c in enumerate(self.pq_cfgs):
                fi = net.vq_input(i, f)
                zf = fi.reshape(-1, c.num_pq, c.sub_dim)
                p_i, s_i = pq_data_init(
                    jax.random.fold_in(rng, i), zf,
                    params["pq"][i], state["pq"][i], c)
                new_pq.append((p_i, s_i))
                if i < self.num_vq - 1:
                    z_q, _, _, _ = pq_forward(fi, p_i, s_i, c, training=False)
                    f = net.vq_output(i, f, z_q)
            return new_pq

        variables = {"params": params["net"]}
        if state.get("batch_stats"):
            variables["batch_stats"] = state["batch_stats"]
        new_pq = self.net.apply(variables, feat_dino, method=full)
        return (
            dict(params, pq=[p for p, _ in new_pq]),
            dict(state, pq=[s for _, s in new_pq]),
        )

    def apply(self, params, state, img, img_pos=None, *, training=False,
              rng=None, **_):
        feat_dino = self.features(params, img)

        def full(net, feat):
            f = net.encode(feat)
            outs = {}
            feat_vqs = []
            pq_states = []
            for i in range(self.num_vq):
                fi = net.vq_input(i, f)
                z_q, idx, aux, new_s = pq_forward(
                    fi, params["pq"][i], state["pq"][i], self.pq_cfgs[i],
                    training=training,
                    rng=None if rng is None else jax.random.fold_in(rng, i),
                )
                pq_states.append(new_s)
                feat_vqs.append(z_q)
                outs[f"vq{i}-loss"] = aux["vq-loss"]
                if "codebook-usage" in aux:
                    outs[f"vq{i}-usage"] = aux["codebook-usage"]
                if i < self.num_vq - 1:
                    f = net.vq_output(i, f, z_q)
            agg, recon = net.decode(feat_vqs, train=training)
            return agg, feat_vqs, outs, pq_states, recon

        variables = {"params": params["net"]}
        if state.get("batch_stats"):
            variables["batch_stats"] = state["batch_stats"]
        (agg, feat_vqs, outs, pq_states, recon), mutated = self.net.apply(
            variables, feat_dino, method=full,
            mutable=["batch_stats"] if training else [],
        )
        outs["recon-loss"] = jnp.mean((recon - feat_dino) ** 2)
        outs["vq-loss"] = sum(
            outs[f"vq{i}-loss"] for i in range(self.num_vq)) / self.num_vq
        new_state = {
            "pq": pq_states,
            "batch_stats": mutated.get("batch_stats",
                                       state.get("batch_stats", {})),
        }
        out = {
            "feat": feat_dino,
            "code": agg,
            "z_q": feat_vqs[0],
            "feat_vqs": feat_vqs,
            "aux": outs,
        }
        return out, new_state


# ---------------------------------------------------------------------------
# NewVQ — enc -> PQ -> dec recon + InfoNCE between (img, aug) halves
# ---------------------------------------------------------------------------

class _NewVQNet(nn.Module):
    hidden_dim: int
    feat_dim: int
    enc_num_blocks: int
    dec_num_blocks: int

    def setup(self):
        self.enc = _EncStack(self.hidden_dim, self.enc_num_blocks)
        self.dec = _DecStack(self.hidden_dim, self.feat_dim,
                             self.dec_num_blocks)

    def encode(self, x):
        return self.enc(x)

    def decode(self, x, train=True):
        return self.dec(x, train=train)


class NewVQModel(_BackboneMixin):
    consumes_aug = True

    def __init__(self, cfg: Dict[str, Any]):
        m = cfg["model"]
        self._setup_backbone(m["pretrained"])
        vq = m["vq"]
        self.hidden_dim = vq["embed_dims"][0]
        num_pq = vq.get("num_pq", 1)
        if isinstance(num_pq, (list, tuple)):
            num_pq = num_pq[0]
        self.pq_cfg = PQConfig(
            num_pq=num_pq, num_codebook=vq["num_codebooks"][0],
            embed_dim=self.hidden_dim, vq_type=vq.get("vq_type", "param"),
                assign_precision=vq.get("assign_precision", "exact"),
            beta=vq.get("beta", 0.25), normalize=vq.get("normalize", "none"),
            use_weighted_sum=vq.get("use_weighted_sum", False),
            use_restart=vq.get("use_restart", False),
            need_initialized=vq.get("need_initialized", "none"),
            jsd_ts=cfg["loss"].get("jsd", {}).get("temperature", 1.0),
        )
        self.net = _NewVQNet(self.hidden_dim, self.feat_dim,
                             m.get("enc_num_blocks", 1),
                             m.get("dec_num_blocks", 1))
        # k-means candidate-sampling pretraining stage
        # (dino_new_vq.py:128-156: faiss k-means over the batch's DINO
        # pixels, train enc->VQ->dec recon on the n_kmeans nearest
        # pixels per centroid only).  The reference ships it unreachable
        # (stage is never passed, faiss import commented out); here it is
        # a live config knob `model.stage: 1` (+ model.n_kmeans), with
        # ops/kmeans on the MXU instead of host faiss.  Requires
        # eval.output_type: feat (no spatial z_q in this stage).
        self.stage = int(m.get("stage", 0))
        self.n_kmeans = int(m.get("n_kmeans", 100))
        ince = cfg["loss"].get("info_nce", {})
        self.info_nce_kwargs = dict(
            normalize=ince.get("normalize", "l2"),
            neg_sample=ince.get("neg_sample", 10),
            temperature=ince.get("temperature", 1.0),
            cal_type=ince.get("cal_type", "random"),
        )

    def output_dim(self, output_type: str) -> int:
        return self.feat_dim if output_type == "feat" else self.hidden_dim

    @property
    def needs_data_init(self) -> bool:
        return self.pq_cfg.need_initialized in ("kmeans", "rand")

    def data_init(self, params, state, img, rng):
        """kmeans/rand codebook init from the first train batch's ACTUAL
        VQ input — the encoder output — via the same first-batch
        clustering seam as the pqgo family (dino_pqgo.py:341-355; the
        Trainer hook fires it once before step 0)."""
        feat_dino = self.features(params, img)
        variables = {"params": params["net"]}
        if state.get("batch_stats"):
            variables["batch_stats"] = state["batch_stats"]
        feat, _ = self.net.apply(variables, feat_dino,
                                 method=self.net.encode, mutable=[])
        c = self.pq_cfg
        zf = feat.reshape(-1, c.num_pq, c.sub_dim)
        pq_p, pq_s = pq_data_init(rng, zf, params["pq"], state["pq"], c)
        return dict(params, pq=pq_p), dict(state, pq=pq_s)

    def init(self, key, img_hw=(224, 224), backbone_params=None):
        k0, k1, k2 = jax.random.split(key, 3)
        backbone_params = self._init_backbone(k0, img_hw, backbone_params)
        gh, gw = img_hw[0] // self.patch_size, img_hw[1] // self.patch_size
        dummy = jnp.zeros((1, gh, gw, self.feat_dim))

        def full(net, x):
            return net.decode(net.encode(x)[..., : self.hidden_dim] * 0
                              + jnp.zeros((1, gh, gw, self.hidden_dim)))

        variables = self.net.init(k1, dummy, method=full)
        pq_params, pq_state = pq_init(k2, self.pq_cfg)
        return (
            {"backbone": backbone_params, "net": variables["params"],
             "pq": pq_params},
            {"pq": pq_state,
             "batch_stats": variables.get("batch_stats", {})},
        )

    def apply(self, params, state, img, img_pos=None, aug_img=None, *,
              training=False, rng=None, **_):
        if training and aug_img is not None:
            img2 = jnp.concatenate([img, aug_img], axis=0)
        else:
            img2 = img
        feat_dino = self.features(params, img2)

        variables = {"params": params["net"]}
        if state.get("batch_stats"):
            variables["batch_stats"] = state["batch_stats"]
        feat, _ = self.net.apply(variables, feat_dino, method=self.net.encode,
                                 mutable=[])
        if training and self.stage == 1:
            if rng is None:
                raise ValueError("stage-1 sampling requires rng")
            from equss_tpu.ops.kmeans import kmeans as _kmeans

            # cluster the DINO pixels; keep the n_kmeans nearest per
            # centroid (faiss Kmeans + IndexFlatL2.search analogue,
            # dino_new_vq.py:135-146).  The encoder is pointwise (1x1
            # Dense blocks), so gathering the already-encoded spatial
            # feat equals encoding the gathered pixels.
            flat_dino = feat_dino.reshape(-1, self.feat_dim)
            cents, _ = _kmeans(jax.random.fold_in(rng, 3), flat_dino,
                               k=self.pq_cfg.num_codebook, n_iters=10)
            d2 = (jnp.sum(flat_dino * flat_dino, -1)[None, :]
                  + jnp.sum(cents * cents, -1)[:, None]
                  - 2.0 * cents @ flat_dino.T)         # (K, n)
            _, near = jax.lax.top_k(-d2, self.n_kmeans)
            sel = near.reshape(-1)                     # (K * n_kmeans,)
            feat_s = feat.reshape(-1, self.hidden_dim)[sel]
            z_q_s, idx_s, aux, pq_state = pq_forward(
                feat_s, params["pq"], state["pq"], self.pq_cfg,
                training=True, rng=rng,
            )
            recon, mutated = self.net.apply(
                variables, z_q_s, True, method=self.net.decode,
                mutable=["batch_stats"])
            aux["recon-loss"] = jnp.mean((recon - flat_dino[sel]) ** 2)
            b = img.shape[0]
            new_state = {"pq": pq_state,
                         "batch_stats": mutated.get(
                             "batch_stats", state.get("batch_stats", {}))}
            return {"feat": feat_dino[:b], "code": feat[:b], "z_q": z_q_s,
                    "indices": idx_s, "aux": aux}, new_state
        z_q, idx, aux, pq_state = pq_forward(
            feat, params["pq"], state["pq"], self.pq_cfg,
            training=training, rng=rng,
        )
        recon, mutated = self.net.apply(
            variables, z_q, training, method=self.net.decode,
            mutable=["batch_stats"] if training else [],
        ) if training else (self.net.apply(
            variables, z_q, False, method=self.net.decode), {})
        aux["recon-loss"] = jnp.mean((recon - feat_dino) ** 2)

        if training and aug_img is not None and rng is not None:
            b = img.shape[0]
            aux["info_nce"] = info_nce_loss(
                jax.random.fold_in(rng, 7), feat[:b], feat[b:],
                **self.info_nce_kwargs)
            aux["info_nce-loss"] = aux["info_nce"]
            feat = feat[:b]
            z_q = z_q[:b]
            idx = idx[:b]

        new_state = {"pq": pq_state,
                     "batch_stats": mutated.get(
                         "batch_stats", state.get("batch_stats", {}))}
        return {"feat": feat_dino[: img.shape[0]], "code": feat, "z_q": z_q,
                "indices": idx, "aux": aux}, new_state


# ---------------------------------------------------------------------------
# SPQ — soft product quantization (softmax-weighted codeword sums)
# ---------------------------------------------------------------------------

class SPQModel(_BackboneMixin):
    """dino_spq.py:14-161: 1x1-conv encoder, single (K, M*d) codebook
    parameter split into books, soft assignment Z = softmax(-d/tau) @ C,
    JSD between (img, aug) halves per book + InfoNCE."""

    consumes_aug = True

    def __init__(self, cfg: Dict[str, Any]):
        m = cfg["model"]
        self._setup_backbone(m["pretrained"])
        vq = m["vq"]
        self.hidden_dim = vq["embed_dims"][0]
        num_pq = vq.get("num_pq", 1)
        self.num_books = num_pq[0] if isinstance(num_pq, (list, tuple)) else num_pq
        self.num_codebook = vq["num_codebooks"][0]
        self.tau_q = 1.0                       # dino_spq.py:157
        ince = cfg["loss"].get("info_nce", {})
        self.info_nce_kwargs = dict(
            normalize=ince.get("normalize", "l2"),
            neg_sample=ince.get("neg_sample", 10),
            temperature=ince.get("temperature", 1.0),
            cal_type=ince.get("cal_type", "random"),
        )

    def output_dim(self, output_type: str) -> int:
        return self.feat_dim if output_type == "feat" else self.hidden_dim

    def init(self, key, img_hw=(224, 224), backbone_params=None):
        k0, k1, k2 = jax.random.split(key, 3)
        backbone_params = self._init_backbone(k0, img_hw, backbone_params)
        enc = nn.Dense(self.hidden_dim)
        gh, gw = img_hw[0] // self.patch_size, img_hw[1] // self.patch_size
        enc_params = enc.init(k1, jnp.zeros((1, gh, gw, self.feat_dim)))["params"]
        bound = jnp.sqrt(6.0 / (self.num_codebook + self.hidden_dim))
        codebook = jax.random.uniform(
            k2, (self.num_codebook, self.hidden_dim), jnp.float32,
            -bound, bound)                    # xavier_uniform (dino_spq.py:153)
        return ({"backbone": backbone_params, "enc": enc_params,
                 "codebook": codebook}, {})

    def soft_quantize(self, z: jnp.ndarray, codebook: jnp.ndarray):
        """Soft_Quantization (dino_spq.py:103-131), batched over books."""
        lead = z.shape[:-1]
        dsub = self.hidden_dim // self.num_books
        zb = z.reshape(-1, self.num_books, dsub)
        cb = codebook.reshape(self.num_codebook, self.num_books, dsub)
        cb = jnp.transpose(cb, (1, 0, 2))      # (B, K, dsub)
        d2 = (
            jnp.sum(zb * zb, -1)[..., None]
            + jnp.sum(cb * cb, -1)[None]
            - 2.0 * jnp.einsum("nbd,bkd->nbk", zb, cb,
                               preferred_element_type=jnp.float32,
                               precision="highest")
        )
        soft = jax.nn.softmax(-d2 * self.tau_q, axis=-1)       # (n, B, K)
        zq = jnp.einsum("nbk,bkd->nbd", soft, cb,
                        preferred_element_type=jnp.float32)
        return zq.reshape(*lead, self.hidden_dim), soft

    def apply(self, params, state, img, img_pos=None, aug_img=None, *,
              training=False, rng=None, **_):
        if training and aug_img is not None:
            img2 = jnp.concatenate([img, aug_img], axis=0)
        else:
            img2 = img
        feat_dino = self.features(params, img2)
        enc = nn.Dense(self.hidden_dim)
        feat = enc.apply({"params": params["enc"]}, feat_dino)
        z_q, soft = self.soft_quantize(feat, params["codebook"])

        aux: Dict[str, Any] = {}
        if training and aug_img is not None:
            n = soft.shape[0] // 2
            # JSD between halves, averaged over books (dino_spq.py:108-116)
            jsd = jnp.mean(jnp.stack([
                jsd_loss(soft[:n, b], soft[n:, b])
                for b in range(self.num_books)
            ]))
            aux["jsd"] = jsd
            b = img.shape[0]
            if rng is not None:
                aux["info_nce"] = info_nce_loss(
                    jax.random.fold_in(rng, 7), feat[:b], feat[b:],
                    **self.info_nce_kwargs)
                aux["info_nce-loss"] = aux["info_nce"]
            feat = feat[:b]
            z_q = z_q[:b]
        return {"feat": feat_dino[: img.shape[0]], "code": feat,
                "z_q": z_q, "aux": aux}, state


# ---------------------------------------------------------------------------
# Cluster — encoder + margin ranking on (ori, aug) correlations
# ---------------------------------------------------------------------------

class ClusterModel(_BackboneMixin):
    """dino_cluster.py:19-166 capability: encoder + margin ranking between
    ori/aug correlation matrices — plus a LIVE SwAV prototype/Sinkhorn
    path (cluster_swav.yaml).  The reference shipped the SwAV machinery
    commented out (dino_cluster.py:37-52,123-164) with its ClusterLoss
    live in loss.py:267-340 and a never-constructed queue; here the path
    works: L2-normalized prototypes, Sinkhorn targets, a fixed-size
    functional embedding queue gated on queue_start_iter, and prototype
    gradients frozen for the first freeze_prototypes_niter steps (SwAV
    semantics).  Queue/iteration live in model_state so the step stays
    pure under jit.
    """

    consumes_aug = True

    def __init__(self, cfg: Dict[str, Any]):
        m = cfg["model"]
        self._setup_backbone(m["pretrained"])
        # the encoder width is semantic_dim (dino_cluster.py:23,31-34);
        # the wrapper sizes its evaluator with hidden_dim
        # (ClusterWrapper.py:31) — cluster_baseline.yaml sets both 512
        self.hidden_dim = m.get("semantic_dim",
                                m.get("hidden_dim", self.feat_dim))
        self.enc_num_blocks = m.get("enc_num_blocks", 1)
        self.net = _EncStack(self.hidden_dim, self.enc_num_blocks)

        lc = cfg.get("loss", {}) or {}
        self.swav = float(lc.get("swav_weight", 0.0) or 0.0) > 0.0
        cl = lc.get("cluster", {}) or {}
        self.num_prototypes = int(cl.get("num_prototypes", 1024))
        self.swav_temp = float(cl.get("temperature", 0.1))
        self.swav_eps = float(cl.get("eps", 0.03))
        self.queue_start_iter = int(cl.get("queue_start_iter", 150))
        self.queue_stack_iter = int(cl.get("queue_stack_iter", 5))
        self.freeze_protos_niter = int(cl.get("freeze_prototypes_niter", 100))
        # the reference queue would hold queue_stack_iter full 2bhw batches
        # (loss.py:320-334) — unbounded at 64x28x28; bound it and stride-
        # subsample each batch into queue_len // queue_stack_iter slots
        self.queue_len = int(cl.get("queue_len", 4096))
        self.use_infonce = float(lc.get("info_nce_weight", 0.0) or 0.0) > 0.0
        ince = lc.get("info_nce", {}) or {}
        self.info_nce_kwargs = dict(
            normalize=ince.get("normalize", "l2"),
            neg_sample=ince.get("neg_sample", 100),
            temperature=ince.get("temperature", 1.0),
            cal_type=ince.get("cal_type", "random"),
        )

    def output_dim(self, output_type: str) -> int:
        return self.hidden_dim

    def init(self, key, img_hw=(224, 224), backbone_params=None):
        k0, k1, k2 = jax.random.split(key, 3)
        backbone_params = self._init_backbone(k0, img_hw, backbone_params)
        gh, gw = img_hw[0] // self.patch_size, img_hw[1] // self.patch_size
        net_params = self.net.init(
            k1, jnp.zeros((1, gh, gw, self.feat_dim)))["params"]
        params = {"backbone": backbone_params, "net": net_params}
        state: Dict[str, Any] = {}
        if self.swav:
            # nn.Linear(semantic_dim, num_prototypes, bias=False) analogue
            w = jax.random.normal(
                k2, (self.num_prototypes, self.hidden_dim)) / jnp.sqrt(
                    jnp.asarray(self.hidden_dim, jnp.float32))
            params["prototypes"] = w
            state = {
                "swav_queue": jnp.zeros((self.queue_len, self.hidden_dim)),
                "swav_queue_n": jnp.zeros((), jnp.int32),
                "swav_it": jnp.zeros((), jnp.int32),
            }
        return params, state

    def apply(self, params, state, img, img_pos=None, aug_img=None, *,
              training=False, rng=None, **_):
        if training and aug_img is not None:
            img2 = jnp.concatenate([img, aug_img], axis=0)
        else:
            img2 = img
        feat_dino = self.features(params, img2)
        semantic = self.net.apply({"params": params["net"]}, feat_dino)
        aux: Dict[str, Any] = {}
        new_state = state
        if training and aug_img is not None:
            b = img.shape[0]
            aux["margin"] = margin_ranking_loss(semantic[:b], semantic[b:])
            aux["margin-loss"] = aux["margin"]
            if self.swav:
                aux, new_state = self._swav(params, state, semantic, aux)
            if self.use_infonce and rng is not None:
                aux["info_nce"] = info_nce_loss(
                    jax.random.fold_in(rng, 23), semantic[:b], semantic[b:],
                    **self.info_nce_kwargs)
                aux["info_nce-loss"] = aux["info_nce"]
            semantic = semantic[:b]
        return {"feat": feat_dino[: img.shape[0]], "code": semantic,
                "aux": aux}, new_state

    def _swav(self, params, state, semantic, aux):
        from equss_tpu.losses.sinkhorn import cluster_loss

        it = state["swav_it"]
        # both views participate, like the commented reference intent
        # (dino_cluster.py:123-146): flatten to (2bhw, d), L2-normalize
        emb = semantic.reshape(-1, self.hidden_dim)
        emb = emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        w = params["prototypes"]
        w = w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12)
        # SwAV freezes prototype grads early in training
        # (cluster_swav.yaml freeze_prototypes_niter)
        w = jnp.where(it < self.freeze_protos_niter,
                      jax.lax.stop_gradient(w), w)
        scores = emb @ w.T                                    # (2bhw, K)

        queue = state["swav_queue"]
        q_scores = jax.lax.stop_gradient(queue @ w.T)         # (L, K)
        q_valid = (
            (jnp.arange(self.queue_len) < state["swav_queue_n"])
            & (it >= self.queue_start_iter)
        )
        aux["swav-loss"] = cluster_loss(
            scores, temperature=self.swav_temp, epsilon=self.swav_eps,
            queue_scores=q_scores, queue_valid=q_valid)

        # FIFO insert a strided subsample of this batch's embeddings
        # (queue[bhw:] = queue[:-bhw]; queue[:bhw] = embedding in the
        # reference ClusterLoss, loss.py:330-334)
        n = emb.shape[0]
        block = max(1, min(self.queue_len // max(1, self.queue_stack_iter), n))
        idx = (jnp.arange(block) * n) // block
        new_queue = jnp.concatenate(
            [jax.lax.stop_gradient(emb[idx]), queue[:-block]], axis=0)
        new_state = dict(
            state,
            swav_queue=new_queue,
            swav_queue_n=jnp.minimum(
                state["swav_queue_n"] + block, self.queue_len),
            swav_it=it + 1,
        )
        return aux, new_state


# ---------------------------------------------------------------------------
# VAE — two-level (top/bottom) hierarchy with JSD contrast
# ---------------------------------------------------------------------------

class _VAENet(nn.Module):
    """DINOVae torso, conv-exact (dino_vae.py:24-154): linear-flavor
    EncResBlock bottom stack; top encoder ReLU -> strided 4x4 conv
    (hidden -> hidden//4, /2 spatial) -> ReLU -> 1x1 (-> hidden);
    ReLU + biasless 1x1 vq input proj; top decoder 1x1 (e0 -> e0//4) ->
    ResBlock* -> ReLU -> ConvTranspose(4,2,1) back to full res; a second
    ConvTranspose `upsample_t` lifting the quantized top for the final
    concat; full decoder 1x1 -> ResBlock* -> ReLU -> 1x1 -> feat_dim."""
    hidden_dim: int
    feat_dim: int
    embed_dims: tuple
    enc_num_blocks: int = 1
    dec_num_blocks: int = 1
    last_norm: bool = False

    def setup(self):
        from equss_tpu.models.heads import ConvTranspose2dTorch, ReLUResBlock

        e0, e1 = self.embed_dims
        self.enc_bottom = _EncStack(self.hidden_dim, self.enc_num_blocks,
                                    flavor="linear")
        self.enc_top_conv = nn.Conv(self.hidden_dim // 4, (4, 4),
                                    strides=(2, 2), padding=[(1, 1), (1, 1)],
                                    name="enc_top_conv")
        self.enc_top_out = nn.Dense(self.hidden_dim, name="enc_top_out")
        self.vq_in_0 = nn.Dense(e0, use_bias=False, name="vq_in_0")
        self.dec_top_in = nn.Dense(e0 // 4, name="dec_top_in")
        self.dec_top_blocks = [ReLUResBlock(e0 // 4, name=f"dec_top_res_{i}")
                               for i in range(self.dec_num_blocks)]
        self.dec_top_up = ConvTranspose2dTorch(e0, name="dec_top_up")
        self.upsample_t = ConvTranspose2dTorch(e0, name="upsample_t")
        self.aggregate = nn.Dense(e1, name="aggregate")
        self.dec_in = nn.Dense(self.hidden_dim, name="dec_in")
        self.dec_blocks = [ReLUResBlock(self.hidden_dim // 4,
                                        name=f"dec_res_{i}")
                           for i in range(self.dec_num_blocks)]
        self.dec_out = nn.Dense(self.feat_dim, name="dec_out")
        if self.last_norm:
            self.dec_norm = nn.LayerNorm(name="dec_norm")

    def encode(self, x):
        """(fb full-res hidden, ft half-res hidden) — dino_vae.py:180-181."""
        fb = self.enc_bottom(x)
        h = nn.relu(fb)
        h = self.enc_top_conv(h)
        h = nn.relu(h)
        return fb, self.enc_top_out(h)

    def vq0_input(self, ft):
        return self.vq_in_0(nn.relu(ft))       # dino_vae.py:86-90

    def bottom_input(self, fb, zq0):
        """dec_proj_top on the quantized top, concat with the bottom
        features, 1x1 aggregate -> second VQ input (dino_vae.py:195-197).

        The concat takes relu(fb), NOT fb: the reference's enc_proj_top
        begins with ReLU(inplace=True) (dino_vae.py:32), which mutates
        feat_bottom in place when called at dino_vae.py:181, so the tensor
        reused in the concat at dino_vae.py:196 is already rectified."""
        d = self.dec_top_in(zq0)
        for blk in self.dec_top_blocks:
            d = blk(d)
        d = nn.relu(d)
        d = self.dec_top_up(d)
        return self.aggregate(jnp.concatenate([nn.relu(fb), d], -1))

    def decode(self, zq0, zq1, agg_type="concat"):
        """upsample_t on the top codes, concat/add with bottom codes,
        full decoder (dino_vae.py:204-217).  Returns (feat, recon)."""
        up0 = self.upsample_t(zq0)
        if agg_type == "concat":
            feat = jnp.concatenate([up0, zq1], -1)
        else:
            feat = up0 + zq1
        h = self.dec_in(feat)
        for blk in self.dec_blocks:
            h = blk(h)
        h = nn.relu(h)
        recon = self.dec_out(h)
        if self.last_norm:
            recon = self.dec_norm(recon)
        return up0, feat, recon


class VAEModel(_BackboneMixin):
    """dino_vae.py:169-238 capability: top VQ on a strided encoding,
    bottom VQ conditioned on the decoded top, recon + JSD(top) -
    0.01*JSD(bottom)."""

    consumes_aug = True

    def __init__(self, cfg: Dict[str, Any]):
        m = cfg["model"]
        self._setup_backbone(m["pretrained"])
        vq = m["vq"]
        self.hidden_dim = m.get("hidden_dim", self.feat_dim)
        self.embed_dims = tuple(vq["embed_dims"])
        assert len(self.embed_dims) == 2, "VAE variant uses 2 VQ levels"
        num_pq = vq.get("num_pq", 1)
        if isinstance(num_pq, int):
            num_pq = [num_pq] * 2
        elif len(num_pq) < 2:
            num_pq = list(num_pq) * 2
        self.pq_cfgs = [
            PQConfig(num_pq=num_pq[i], num_codebook=vq["num_codebooks"][i],
                     embed_dim=self.embed_dims[i],
                     vq_type=vq.get("vq_type", "param"),
                     assign_precision=vq.get("assign_precision", "exact"),
                     beta=vq.get("beta", 0.25),
                     need_initialized=vq.get("need_initialized", "none"),
                     normalize=vq.get("normalize", "none"),
                     use_restart=vq.get("use_restart", False),
                     use_split=vq.get("use_split", False),
                     use_gumbel=vq.get("use_gumbel", False),
                     use_weighted_sum=vq.get("use_weighted_sum", False),
                     decay=vq.get("decay", 0.99), eps=vq.get("eps", 1e-5))
            for i in range(2)
        ]
        self.agg_type = vq.get("agg_type", "concat")
        self.net = _VAENet(self.hidden_dim, self.feat_dim, self.embed_dims,
                           enc_num_blocks=m.get("enc_num_blocks", 1),
                           dec_num_blocks=m.get("dec_num_blocks", 1),
                           last_norm=m.get("last_norm", False))

    @property
    def needs_data_init(self) -> bool:
        return any(c.need_initialized in ("kmeans", "rand")
                   for c in self.pq_cfgs)

    def data_init(self, params, state, img, rng):
        """kmeans/rand codebook init chained through the two-level VAE
        stack: the bottom quantizer clusters its ACTUAL input (which
        depends on the top level's freshly initialized codewords), the
        same forward-order seam as the pqgo family (dino_pqgo.py:
        341-355)."""
        feat_dino = self.features(params, img)

        def run(net, x):
            fb, ft = net.encode(x)
            f0 = net.vq0_input(ft)
            c0 = self.pq_cfgs[0]
            p0, s0 = pq_data_init(
                jax.random.fold_in(rng, 0),
                f0.reshape(-1, c0.num_pq, c0.sub_dim),
                params["pq"][0], state["pq"][0], c0)
            zq0, _, _, _ = pq_forward(f0, p0, s0, c0, training=False)
            f1 = net.bottom_input(fb, zq0)
            c1 = self.pq_cfgs[1]
            p1, s1 = pq_data_init(
                jax.random.fold_in(rng, 1),
                f1.reshape(-1, c1.num_pq, c1.sub_dim),
                params["pq"][1], state["pq"][1], c1)
            return [(p0, s0), (p1, s1)]

        variables = {"params": params["net"]}
        if state.get("batch_stats"):
            variables["batch_stats"] = state["batch_stats"]
        new_pq, _ = self.net.apply(variables, feat_dino, method=run,
                                   mutable=[])
        return (
            dict(params, pq=[p for p, _ in new_pq]),
            dict(state, pq=[s for _, s in new_pq]),
        )

    def output_dim(self, output_type: str) -> int:
        if output_type == "feat":
            return self.feat_dim
        return self.embed_dims[int(output_type[2:])]

    def init(self, key, img_hw=(224, 224), backbone_params=None):
        keys = jax.random.split(key, 4)
        backbone_params = self._init_backbone(keys[0], img_hw, backbone_params)
        gh, gw = img_hw[0] // self.patch_size, img_hw[1] // self.patch_size
        dummy = jnp.zeros((1, gh, gw, self.feat_dim))

        def full(net, x):
            fb, ft = net.encode(x)
            f0 = net.vq0_input(ft)
            f1 = net.bottom_input(fb, f0)
            return net.decode(f0, f1, self.agg_type)

        variables = self.net.init(keys[1], dummy, method=full)
        pq0 = pq_init(keys[2], self.pq_cfgs[0])
        pq1 = pq_init(keys[3], self.pq_cfgs[1])
        return (
            {"backbone": backbone_params, "net": variables["params"],
             "pq": [pq0[0], pq1[0]]},
            {"pq": [pq0[1], pq1[1]],
             "batch_stats": variables.get("batch_stats", {})},
        )

    def apply(self, params, state, img, img_pos=None, aug_img=None, *,
              training=False, rng=None, **_):
        if training and aug_img is not None:
            img2 = jnp.concatenate([img, aug_img], axis=0)
        else:
            img2 = img
        feat_dino = self.features(params, img2)

        def full(net, x):
            fb, ft = net.encode(x)
            f0 = net.vq0_input(ft)
            zq0, _, aux0, s0 = pq_forward(
                f0, params["pq"][0], state["pq"][0], self.pq_cfgs[0],
                training=training, want_prob=training,
                rng=None if rng is None else jax.random.fold_in(rng, 0))
            f1 = net.bottom_input(fb, zq0)
            zq1, _, aux1, s1 = pq_forward(
                f1, params["pq"][1], state["pq"][1], self.pq_cfgs[1],
                training=training, want_prob=training,
                rng=None if rng is None else jax.random.fold_in(rng, 1))
            up0, agg, recon = net.decode(zq0, zq1, self.agg_type)
            return up0, zq1, aux0, aux1, (s0, s1), agg, recon

        variables = {"params": params["net"]}
        if state.get("batch_stats"):
            variables["batch_stats"] = state["batch_stats"]
        (zq0, zq1, aux0, aux1, (s0, s1), agg, recon), mutated = self.net.apply(
            variables, feat_dino, method=full,
            mutable=["batch_stats"] if training else [])

        aux: Dict[str, Any] = {
            "vq0-loss": aux0["vq-loss"], "vq1-loss": aux1["vq-loss"],
            "vq-loss": 0.5 * (aux0["vq-loss"] + aux1["vq-loss"]),
            "recon-loss": jnp.mean((recon - feat_dino) ** 2),
        }
        if training and aug_img is not None:
            # the reference feeds the PQ wrapper's CONCATENATED per-book
            # distributions (n_pixels, M*K) to the JSD with batchmean
            # over pixel rows (quantizer.py:609, dino_vae.py:220-224) —
            # per-book rows would deflate the value by M
            def _pix_rows(a, c):
                return a["distance_prob"].reshape(
                    -1, c.num_pq * c.num_codebook)

            p0 = _pix_rows(aux0, self.pq_cfgs[0])
            p1 = _pix_rows(aux1, self.pq_cfgs[1])
            pos = jsd_loss(p0[: p0.shape[0] // 2], p0[p0.shape[0] // 2:])
            neg = jsd_loss(p1[: p1.shape[0] // 2], p1[p1.shape[0] // 2:])
            aux["contra-loss-pos"] = pos
            aux["contra-loss-neg"] = neg
            aux["contra-loss"] = pos - 0.01 * neg   # dino_vae.py:227

        b = img.shape[0]
        new_state = {"pq": [s0, s1],
                     "batch_stats": mutated.get(
                         "batch_stats", state.get("batch_stats", {}))}
        return {"feat": feat_dino[:b], "code": agg[:b], "z_q": zq1[:b],
                "feat_vqs": [zq0[:b], zq1[:b]], "aux": aux}, new_state


# ---------------------------------------------------------------------------
# Res — semantic + local encoders, InfoNCE pos + CLUB MI-minimization neg
# ---------------------------------------------------------------------------

class ResModel(_BackboneMixin):
    """dino_res.py:15-199 capability: semantic + local encoders, recon,
    InfoNCE positive between the aug halves of the semantic features, and
    an ADVERSARIAL CLUB MI-upper-bound negative between the aug halves of
    the local features.

    The reference trains the CLUB encoder with its own Adam in an inner
    mi_iter loop inside forward (:106-143, :160-162), excluded from the
    model optimizer (build.py:80-82).  Functionally here: the CLUB
    encoder params + their optimizer state live in ``state`` and a
    lax.scan runs the mi_iter likelihood-ascent updates on the detached
    local features inside the (pure) step; the model's club-loss is then
    computed against the freshly-updated, stop-gradient'd encoder —
    identical min-max order to the reference, no optimizer side effects.
    """

    consumes_aug = True

    def __init__(self, cfg: Dict[str, Any]):
        import optax

        m = cfg["model"]
        self._setup_backbone(m["pretrained"])
        # dino_res.py:23-25: semantic/local/hidden dims default to feat_dim
        self.hidden_dim = m.get("hidden_dim", self.feat_dim)
        self.semantic_dim = m.get("semantic_dim", self.feat_dim)
        self.local_dim = m.get("local_dim", self.feat_dim)
        # dino_res imports its blocks from resnet_linear (dino_res.py:8)
        self.semantic_enc = _EncStack(
            self.semantic_dim, m.get("enc_num_blocks", 1), flavor="linear")
        self.local_enc = _EncStack(
            self.local_dim, m.get("enc_num_blocks", 1), flavor="linear")
        self.club = CLUBEncoder(hidden_dim=self.hidden_dim,
                                out_dim=self.local_dim)
        # aggregate 1x1 conv + DecResBlock stack back to feat_dim
        # (dino_res.py:41-56); last_norm optional
        self.agg = nn.Dense(self.hidden_dim, name="agg")
        self.dec = _DecStack(self.hidden_dim, self.feat_dim,
                             m.get("dec_num_blocks", 1),
                             m.get("last_norm", False), flavor="linear")
        ince = cfg["loss"].get("info_nce", {})
        self.info_nce_kwargs = dict(
            normalize=ince.get("normalize", "l2"),
            neg_sample=ince.get("neg_sample", 10),
            temperature=ince.get("temperature", 1.0),
            cal_type=ince.get("cal_type", "random"),
        )
        club_cfg = cfg["loss"].get("club", {}) or {}
        # inner adversarial iterations + clip (res_baseline.yaml:45-47)
        self.mi_iter = int(club_cfg.get("mi_iter", 5))
        self.club_clip = float(club_cfg.get("clip_grad", 1.0))
        copt = (cfg.get("optimizer", {}) or {}).get("club_enc", {}) or {}
        self.club_tx = optax.chain(
            optax.clip_by_global_norm(self.club_clip),
            optax.adam(float(copt.get("lr", 3.0e-6))),
        )

    def output_dim(self, output_type: str) -> int:
        # the evaluator consumes `code` = semantic features; the reference
        # wrapper hardcodes hidden_dim (ResWrapper.py:30) which only works
        # because res_baseline.yaml sets all three dims equal
        return self.semantic_dim

    def init(self, key, img_hw=(224, 224), backbone_params=None):
        keys = jax.random.split(key, 6)
        backbone_params = self._init_backbone(keys[0], img_hw, backbone_params)
        gh, gw = img_hw[0] // self.patch_size, img_hw[1] // self.patch_size
        dummy = jnp.zeros((1, gh, gw, self.feat_dim))
        sem = self.semantic_enc.init(keys[1], dummy)["params"]
        loc = self.local_enc.init(keys[2], dummy)["params"]
        club = self.club.init(
            keys[3], jnp.zeros((1, gh, gw, self.local_dim)))["params"]
        agg = self.agg.init(keys[4], jnp.zeros(
            (1, gh, gw, self.semantic_dim + self.local_dim)))["params"]
        dec_vars = self.dec.init(
            keys[5], jnp.zeros((1, gh, gw, self.hidden_dim)))
        state = {"club_enc": club, "club_opt": self.club_tx.init(club),
                 "batch_stats": dec_vars.get("batch_stats", {})}
        return ({"backbone": backbone_params, "semantic": sem, "local": loc,
                 "agg": agg, "dec": dec_vars["params"]}, state)

    def _club_nll(self, club_params, loc_1, loc_2):
        """-loglikeli of the second aug half under the encoder's Gaussian
        prediction from the first (dino_res.py:126, club_encoder.py:98-108):
        0.01 * mean over samples of the summed per-dim NLL, via the
        get_mu_logvar path (no residual).  The 0.01 scale is part of the
        objective — it interacts with the clip_grad=1.0 on the CLUB Adam."""
        mu, logvar = self.club.apply({"params": club_params}, loc_1,
                                     residual=False)
        flat2 = loc_2.reshape(-1, self.local_dim)
        return 0.01 * jnp.mean(
            jnp.sum((flat2 - mu) ** 2 / jnp.exp(logvar) + logvar, axis=-1))

    def apply(self, params, state, img, img_pos=None, aug_img=None, *,
              training=False, rng=None, **_):
        if training and aug_img is not None:
            img2 = jnp.concatenate([img, aug_img], axis=0)
        else:
            img2 = img
        feat_dino = self.features(params, img2)
        semantic = self.semantic_enc.apply({"params": params["semantic"]},
                                           feat_dino)
        local = self.local_enc.apply({"params": params["local"]}, feat_dino)
        # concat -> 1x1 aggregate conv -> DecResBlock stack (dino_res.py:
        # 168-179); the linear-flavor dec blocks carry BatchNorm state
        agg = self.agg.apply({"params": params["agg"]},
                             jnp.concatenate([semantic, local], -1))
        dec_vars = {"params": params["dec"]}
        if state.get("batch_stats"):
            dec_vars["batch_stats"] = state["batch_stats"]
        if training:
            recon, mutated = self.dec.apply(dec_vars, agg, True,
                                            mutable=["batch_stats"])
        else:
            recon = self.dec.apply(dec_vars, agg, False)
            mutated = {}
        aux: Dict[str, Any] = {"recon-loss": jnp.mean((recon - feat_dino) ** 2)}
        new_state = dict(state, batch_stats=mutated.get(
            "batch_stats", state.get("batch_stats", {})))

        if training and aug_img is not None and rng is not None:
            b = img.shape[0]
            aux["info_nce"] = info_nce_loss(
                jax.random.fold_in(rng, 3), semantic[:b], semantic[b:],
                **self.info_nce_kwargs)
            aux["info_nce-loss"] = aux["info_nce"]

            # inner adversarial loop: mi_iter likelihood updates of the
            # CLUB encoder on the detached local halves (dino_res.py:160-162)
            d_loc = jax.lax.stop_gradient(local)
            loc_1, loc_2 = d_loc[:b], d_loc[b:]

            def club_step(carry, _):
                cp, copt = carry
                nll, grads = jax.value_and_grad(self._club_nll)(
                    cp, loc_1, loc_2)
                updates, copt = self.club_tx.update(grads, copt, cp)
                cp = jax.tree.map(lambda p, u: p + u, cp, updates)
                return (cp, copt), nll

            (club_new, copt_new), nlls = jax.lax.scan(
                club_step, (state["club_enc"], state["club_opt"]),
                None, length=self.mi_iter)
            aux["club-enc-loss"] = nlls[-1]
            aux["club-enc-loss-first"] = nlls[0]

            # MI upper bound against the updated, frozen encoder; grads
            # flow into local_enc only (dino_res.py:195-197 + the model
            # optimizer excluding club_enc, build.py:80-82)
            p_mu, p_logvar = self.club.apply(
                {"params": jax.lax.stop_gradient(club_new)}, local[:b])
            aux["club-loss"] = club_loss(local[b:], p_mu, p_logvar)
            new_state = dict(new_state, club_enc=club_new, club_opt=copt_new)
            semantic = semantic[:b]
        return {"feat": feat_dino[: img.shape[0]], "code": semantic,
                "aux": aux}, new_state


# ---------------------------------------------------------------------------
# Info — chained-VQ recon (dino_info.py:85-124)
# ---------------------------------------------------------------------------

class _InfoNet(nn.Module):
    """Trainable torso of DINOInfo (dino_info.py:17-84): EncResBlock
    stack, per-VQ 1x1-conv+BN input projections, 1x1-conv+ReLU output
    projections CHAINED on the running feature, a concat projection over
    [all vq outputs; final running feature], and a DecResBlock decoder
    closed by LayerNorm."""
    feat_dim: int
    embed_dims: tuple
    enc_num_blocks: int
    dec_num_blocks: int

    def setup(self):
        # dino_info imports its blocks from resnet_linear (dino_info.py:7)
        self.enc = _EncStack(self.feat_dim, self.enc_num_blocks,
                             flavor="linear")
        self.vq_input_proj = [
            nn.Dense(e, use_bias=False, name=f"vq_in_{i}")
            for i, e in enumerate(self.embed_dims)]
        self.vq_input_bn = [
            nn.BatchNorm(name=f"vq_in_bn_{i}")
            for i in range(len(self.embed_dims))]
        # one per VQ level (dino_info.py:66-73), applied to the running
        # feature itself — NOT to [feat; vq] like dino_unseg
        self.vq_output_proj = [
            nn.Dense(self.feat_dim, name=f"vq_out_{i}")
            for i in range(len(self.embed_dims))]
        self.concat_proj = nn.Dense(self.feat_dim, name="concat_proj")
        self.dec = _DecStack(self.feat_dim, self.feat_dim,
                             self.dec_num_blocks, last_norm=True,
                             flavor="linear")

    def encode(self, feat):
        return self.enc(feat)

    def vq_input(self, i, feat, train=True):
        x = self.vq_input_proj[i](feat)
        return self.vq_input_bn[i](x, use_running_average=not train)

    def vq_output(self, i, feat):
        # chained Conv1x1 + ReLU on the running feature (dino_info.py:105)
        return nn.relu(self.vq_output_proj[i](feat))

    def decode(self, feat_vqs, train=True):
        feat = self.concat_proj(jnp.concatenate(feat_vqs, axis=-1))
        return feat, self.dec(feat, train=train)


class InfoModel(_BackboneMixin):
    """DINOInfo (dino_info.py:12-124): enc -> per-level {input-proj -> VQ;
    output-proj chained on the running feature} -> append the FINAL
    running feature to feat_vqs -> concat-proj -> dec -> LayerNorm'd
    recon MSE against the DINO features."""

    def __init__(self, cfg: Dict[str, Any]):
        m = cfg["model"]
        self._setup_backbone(m["pretrained"])
        vq = m["vq"]
        self.embed_dims = tuple(vq["embed_dims"])
        self.num_vq = len(self.embed_dims)
        self.pq_cfgs = [
            PQConfig(
                num_pq=1, num_codebook=vq["num_codebooks"][i],
                embed_dim=self.embed_dims[i],
                vq_type=vq.get("vq_type", "param"),
                assign_precision=vq.get("assign_precision", "exact"),
                beta=vq.get("beta", 0.25), normalize=vq.get("normalize", "none"),
                use_restart=vq.get("use_restart", False),
                use_gumbel=vq.get("use_gumbel", False),
                need_initialized=vq.get("need_initialized", "none"),
                decay=vq.get("decay", 0.99), eps=vq.get("eps", 1e-5),
            )
            for i in range(self.num_vq)
        ]
        self.net = _InfoNet(
            feat_dim=self.feat_dim, embed_dims=self.embed_dims,
            enc_num_blocks=m.get("enc_num_blocks", 1),
            dec_num_blocks=m.get("dec_num_blocks", 1),
        )

    def output_dim(self, output_type: str) -> int:
        if output_type == "feat":
            return self.feat_dim
        i = int(output_type[2:])
        # feat_vqs carries num_vq quantized levels + the final running
        # feature (dino_info.py:107-108)
        return self.embed_dims[i] if i < self.num_vq else self.feat_dim

    @property
    def needs_data_init(self) -> bool:
        return any(c.need_initialized in ("kmeans", "rand")
                   for c in self.pq_cfgs)

    def data_init(self, params, state, img, rng):
        """kmeans/rand codebook init through the chained projection
        stack, each quantizer clustering its ACTUAL input fi (the
        running feature f does not depend on codewords here, so no
        re-quantize is needed between levels).  Same first-batch seam
        as dino_pqgo.py:341-355."""
        feat_dino = self.features(params, img)

        def run(net, feat):
            f = net.encode(feat)
            new_pq = []
            for i, c in enumerate(self.pq_cfgs):
                fi = net.vq_input(i, f, train=False)
                zf = fi.reshape(-1, c.num_pq, c.sub_dim)
                p_i, s_i = pq_data_init(
                    jax.random.fold_in(rng, i), zf,
                    params["pq"][i], state["pq"][i], c)
                new_pq.append((p_i, s_i))
                f = net.vq_output(i, f)
            return new_pq

        variables = {"params": params["net"]}
        if state.get("batch_stats"):
            variables["batch_stats"] = state["batch_stats"]
        new_pq, _ = self.net.apply(variables, feat_dino, method=run,
                                   mutable=[])
        return (
            dict(params, pq=[p for p, _ in new_pq]),
            dict(state, pq=[s for _, s in new_pq]),
        )

    def _full(self, net, feat, params, state, training, rng):
        f = net.encode(feat)
        outs: Dict[str, Any] = {}
        feat_vqs = []
        pq_states = []
        for i in range(self.num_vq):
            fi = net.vq_input(i, f, train=training)
            z_q, idx, aux, new_s = pq_forward(
                fi, params["pq"][i], state["pq"][i], self.pq_cfgs[i],
                training=training,
                rng=None if rng is None else jax.random.fold_in(rng, i),
            )
            pq_states.append(new_s)
            feat_vqs.append(z_q)
            outs[f"vq{i}-loss"] = aux["vq-loss"]
            if "codebook-usage" in aux:
                outs[f"vq{i}-usage"] = aux["codebook-usage"]
            f = net.vq_output(i, f)
        feat_vqs.append(f)            # final running feature joins the concat
        agg, recon = net.decode(feat_vqs, train=training)
        return agg, feat_vqs, outs, pq_states, recon

    def init(self, key, img_hw=(224, 224), backbone_params=None):
        keys = jax.random.split(key, 2 + self.num_vq)
        backbone_params = self._init_backbone(keys[0], img_hw, backbone_params)
        gh, gw = img_hw[0] // self.patch_size, img_hw[1] // self.patch_size
        dummy = jnp.zeros((1, gh, gw, self.feat_dim))
        pq_params, pq_states = [], []
        for i, c in enumerate(self.pq_cfgs):
            p, s = pq_init(keys[2 + i], c)
            pq_params.append(p)
            pq_states.append(s)
        params_probe = {"pq": pq_params}
        variables = self.net.init(
            keys[1], dummy, params_probe, {"pq": pq_states}, False, None,
            method=self._net_init_fn)
        return (
            {"backbone": backbone_params, "net": variables["params"],
             "pq": pq_params},
            {"pq": pq_states,
             "batch_stats": variables.get("batch_stats", {})},
        )

    def _net_init_fn(self, net, feat, params, state, training, rng):
        return self._full(net, feat, params, state, training, rng)

    def apply(self, params, state, img, img_pos=None, *, training=False,
              rng=None, **_):
        feat_dino = self.features(params, img)
        variables = {"params": params["net"]}
        if state.get("batch_stats"):
            variables["batch_stats"] = state["batch_stats"]
        (agg, feat_vqs, outs, pq_states, recon), mutated = self.net.apply(
            variables, feat_dino, params, state, training, rng,
            method=self._net_init_fn,
            mutable=["batch_stats"] if training else [],
        )
        outs["recon-loss"] = jnp.mean((recon - feat_dino) ** 2)
        outs["vq-loss"] = sum(
            outs[f"vq{i}-loss"] for i in range(self.num_vq)) / self.num_vq
        new_state = {
            "pq": pq_states,
            "batch_stats": mutated.get("batch_stats",
                                       state.get("batch_stats", {})),
        }
        return {
            "feat": feat_dino,
            "code": agg,
            "z_q": feat_vqs[0],
            "feat_vqs": feat_vqs,
            "aux": outs,
        }, new_state


# ---------------------------------------------------------------------------
# PQGO-CLS — student/EMA-teacher heads + per-subspace codeword classifier
# ---------------------------------------------------------------------------

class PQGOCLSModel(_BackboneMixin):
    """dino_pqgo_cls.py:16-185: trainable SegmentationHead (student) and a
    momentum (EMA) teacher head; PQ runs on the (detached) teacher output
    producing per-subspace pseudo-labels; a grouped per-subspace
    classifier on the student predicts those labels (CE), plus
    student<->teacher MSE and the STEGO loss on the student code.

    The EMA head lives in ``state`` and updates functionally each
    training step (no in-place momentum mutation, :128-134).
    The grouped Conv1d classifier (:84-88) becomes a per-subspace einsum
    with weight (M, dsub, K) — identical math, MXU-batched.
    """

    consumes_aug = True

    def __init__(self, cfg: Dict[str, Any]):
        from equss_tpu.losses.stego import StegoLossConfig, stego_loss
        from equss_tpu.models.equss import pq_config_from_dict, stego_config_from_dict
        from equss_tpu.models.heads import SegmentationHead

        m = cfg["model"]
        self._setup_backbone(m["pretrained"])
        self.hidden_dim = m["vq"]["embed_dims"][0]
        self.momentum = m.get("encoder", {}).get("momentum", 0.996)
        self.pq_cfg = pq_config_from_dict(m["vq"])
        self.stego_cfg = stego_config_from_dict(cfg["loss"]["stego"])
        self.head = SegmentationHead(self.hidden_dim)
        self._stego_loss = stego_loss
        self.M = self.pq_cfg.num_pq
        self.K = self.pq_cfg.num_codebook
        self.dsub = self.pq_cfg.sub_dim

    def output_dim(self, output_type: str) -> int:
        return self.hidden_dim

    def init(self, key, img_hw=(224, 224), backbone_params=None):
        keys = jax.random.split(key, 4)
        backbone_params = self._init_backbone(keys[0], img_hw, backbone_params)
        gh, gw = img_hw[0] // self.patch_size, img_hw[1] // self.patch_size
        head_params = self.head.init(
            keys[1], jnp.zeros((1, gh, gw, self.feat_dim)))["params"]
        pq_params, pq_state = pq_init(keys[2], self.pq_cfg)
        # grouped classifier: (M, dsub, K) weight + (M, K) bias
        w = jax.random.normal(keys[3], (self.M, self.dsub, self.K)) * (
            1.0 / jnp.sqrt(self.dsub))
        params = {
            "backbone": backbone_params, "head": head_params,
            "pq": pq_params,
            "classifier": {"w": w.astype(jnp.float32),
                           "b": jnp.zeros((self.M, self.K), jnp.float32)},
        }
        # EMA teacher initialized from the student (dino_pqgo_cls.py:34-36)
        state = {"pq": pq_state,
                 "ema_head": jax.tree.map(jnp.copy, head_params)}
        return params, state

    def apply(self, params, state, img, img_pos=None, aug_img=None, *,
              training=False, rng=None, **_):
        from equss_tpu.models.heads import dropout2d as drop2d

        keys = (jax.random.split(rng, 4) if rng is not None else [None] * 4)
        feat = self.features(params, img)
        if training and self.dropout:
            feat = drop2d(keys[0], feat, self.drop_prob)
        z_student = self.head.apply({"params": params["head"]}, feat)

        aug = aug_img if aug_img is not None else img
        feat_aug = self.features(params, aug)
        if training and self.dropout:
            feat_aug = drop2d(keys[1], feat_aug, self.drop_prob)

        # momentum update + teacher forward (no gradient)
        ema_head = state["ema_head"]
        if training:
            ema_head = jax.tree.map(
                lambda k_, q: k_ * self.momentum + q * (1.0 - self.momentum),
                ema_head, jax.lax.stop_gradient(params["head"]))
        z_teacher = jax.lax.stop_gradient(
            self.head.apply({"params": ema_head}, feat_aug))

        z_q, pseudo, aux, pq_state = pq_forward(
            z_teacher, params["pq"], state["pq"], self.pq_cfg,
            training=training, rng=keys[2],
        )

        def l2n(x):
            return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                                   1e-12)

        aux["mse-loss"] = jnp.mean(
            (l2n(z_student) - jax.lax.stop_gradient(l2n(z_teacher))) ** 2)

        if training:
            if img_pos is None:
                raise ValueError("training forward requires img_pos")
            feat_pos = self.features(params, img_pos)
            if self.dropout:
                feat_pos = drop2d(keys[3], feat_pos, self.drop_prob)
            code_pos = self.head.apply({"params": params["head"]}, feat_pos)
            aux["stego-loss"] = self._stego_loss(
                keys[2], feat, feat_pos, z_student, code_pos, self.stego_cfg)

        # grouped per-subspace classifier + CE on pseudo-labels
        zs = z_student.reshape(-1, self.M, self.dsub)
        logits = jnp.einsum("nmd,mdk->nmk", zs, params["classifier"]["w"],
                            preferred_element_type=jnp.float32)
        logits = logits + params["classifier"]["b"][None]
        labels = jax.lax.stop_gradient(pseudo.reshape(-1, self.M))
        log_p = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(log_p, labels[..., None], axis=-1)
        aux["cls-loss"] = jnp.mean(ce)

        new_state = {"pq": pq_state, "ema_head": ema_head}
        return {"feat": feat, "code": z_student, "z_q": z_q,
                "indices": pseudo, "aux": aux}, new_state


# ---------------------------------------------------------------------------
# EMA — student/EMA head + k-means memory bank + proxy loss
# ---------------------------------------------------------------------------

class EMAModel(_BackboneMixin):
    """dino_ema.py:15-104 capability: student/EMA SegmentationHead pair,
    a per-cluster memory bank initialized by k-means over teacher
    features (the reference used faiss GPU k-means, :84-99 — here
    ops/kmeans runs on device), and a proxy InfoNCE against cluster
    centroids.  All bank state (centroids, fixed-size queues, init flag)
    is functional, so the step stays pure under jit — the reference kept
    Python lists of growing tensors (:46-49), which cannot shard.
    NOTE: this variant was disabled in the reference's own builder
    (build.py:24, import commented); included for inventory completeness.
    """

    consumes_aug = True

    def __init__(self, cfg: Dict[str, Any]):
        from equss_tpu.models.heads import SegmentationHead

        m = cfg["model"]
        self._setup_backbone(m["pretrained"])
        self.hidden_dim = m.get("hidden_dim", 70)
        self.momentum = m.get("encoder", {}).get("momentum", 0.996)
        mb = m.get("memory_bank", {})
        self.n_cluster = mb.get("n_cluster", 27)
        self.queue_size = mb.get("queue_size", 64)
        self.num_support = mb.get("num_support", 16)
        self.enqueue_k = mb.get("enqueue_k", 4)
        self.margin = mb.get("margin", 0.1)    # ema.yaml:37
        ince = cfg["loss"].get("info_nce", {})
        self.proxy_kwargs = dict(
            temperature=ince.get("temperature", 1.0),
            num_queries=ince.get("num_queries", 16),
            num_neg=ince.get("num_neg", 64),
        )
        self.head = SegmentationHead(self.hidden_dim)

    def output_dim(self, output_type: str) -> int:
        return self.hidden_dim

    def init(self, key, img_hw=(224, 224), backbone_params=None):
        k0, k1, k2 = jax.random.split(key, 3)
        backbone_params = self._init_backbone(k0, img_hw, backbone_params)
        gh, gw = img_hw[0] // self.patch_size, img_hw[1] // self.patch_size
        head_params = self.head.init(
            k1, jnp.zeros((1, gh, gw, self.feat_dim)))["params"]
        # the centroids are a TRAINABLE embedding updated by the model
        # optimizer through the proxy-loss gradient (dino_ema.py:48,274 —
        # nn.Embedding default N(0,1) init), NOT an EMA buffer
        centroid = jax.random.normal(k2, (self.n_cluster, self.hidden_dim))
        state = {
            "ema_head": jax.tree.map(jnp.copy, head_params),
            "queue": jnp.zeros((self.n_cluster, self.queue_size,
                                self.hidden_dim)),
            "bank_initialized": jnp.zeros((), jnp.int32),
        }
        return {"backbone": backbone_params, "head": head_params,
                "centroid": centroid}, state

    needs_data_init = True

    def data_init(self, params, state, img, rng):
        """One-time STUDENT-feature bank init (dino_ema.py:84-110 faiss
        k-means analogue, fired from forward on the first batch): k-means
        the student head's output, take the num_support nearest pixels
        per centroid, set the centroid embedding to their MEAN
        (dino_ema.py:106-107) and seed the queue with them.  Runs once
        via the Trainer hook instead of a lax.cond in every jitted step."""
        feat = self.features(params, img)
        z = self.head.apply({"params": params["head"]}, feat)
        cents, queue = self._init_bank(rng, z.reshape(-1, self.hidden_dim))
        return dict(params, centroid=cents), dict(
            state, queue=queue, bank_initialized=jnp.ones((), jnp.int32))

    def _init_bank(self, key, z_flat):
        from equss_tpu.ops.kmeans import kmeans

        cents, assign = kmeans(key, z_flat, k=self.n_cluster, n_iters=10)
        d2 = (
            jnp.sum(z_flat**2, -1)[None, :]
            + jnp.sum(cents**2, -1)[:, None]
            - 2.0 * cents @ z_flat.T
        )                                      # (n_cluster, n)
        _, idx = jax.lax.top_k(-d2, self.num_support)
        supports = z_flat[idx]                 # (n_cluster, num_support, d)
        cents = jnp.mean(supports, axis=1)     # dino_ema.py:106
        # fixed-capacity analogue of the reference's variable-length
        # Python-list queues: tile the supports to fill queue_size slots
        reps = -(-self.queue_size // self.num_support)
        queue = jnp.tile(supports, (1, reps, 1))[:, : self.queue_size]
        return cents, queue

    def apply(self, params, state, img, img_pos=None, aug_img=None, *,
              training=False, rng=None, **_):
        from equss_tpu.models.heads import dropout2d as drop2d

        keys = jax.random.split(rng, 4) if rng is not None else [None] * 4
        feat = self.features(params, img)
        if training and self.dropout:
            feat = drop2d(keys[0], feat, self.drop_prob)
        z_student = self.head.apply({"params": params["head"]}, feat)

        def l2n(x):
            return x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

        aux: Dict[str, Any] = {}
        new_state = dict(state)
        if training:
            # momentum update BEFORE the teacher forward (dino_ema.py:
            # 254-257)
            ema_head = jax.tree.map(
                lambda k_, q: k_ * self.momentum + q * (1.0 - self.momentum),
                state["ema_head"], jax.lax.stop_gradient(params["head"]))
            aug = aug_img if aug_img is not None else img
            feat_t = self.features(params, aug)
            if self.dropout:
                # the reference drops BOTH views (dino_ema.py:244,247)
                feat_t = drop2d(keys[1], feat_t, self.drop_prob)
            z_teacher = jax.lax.stop_gradient(
                self.head.apply({"params": ema_head}, feat_t))
            # MSE between the L2-NORMALIZED flattened views
            # (dino_ema.py:252-259)
            s_flat = z_student.reshape(-1, self.hidden_dim)
            t_flat = z_teacher.reshape(-1, self.hidden_dim)
            aux["mse-loss"] = jnp.mean((l2n(s_flat) - l2n(t_flat)) ** 2)

            # the memory bank is fed by the STUDENT output (dino_ema.py:
            # 268: _update_queue(z1_1, norm_z1_1)), gradient-free
            z_flat = jax.lax.stop_gradient(s_flat)
            norm_z = l2n(z_flat)
            # bank init happens ONCE in data_init (Trainer hook).  Guard
            # for callers that drive train_step on a fresh state without
            # the hook: seed the queue from strided student pixels
            # (centroids are the N(0,1)-initialized trainable embedding,
            # exactly the reference's state had _init_memory_bank never
            # fired — a gather, not a k-means, in the per-step graph).
            initialized = state["bank_initialized"] > 0
            stride = max(1, z_flat.shape[0] // self.n_cluster)
            fb_idx = (jnp.arange(self.n_cluster) * stride) % z_flat.shape[0]
            queue = jnp.where(
                initialized[..., None, None], state["queue"],
                jnp.broadcast_to(z_flat[fb_idx][:, None],
                                 (self.n_cluster, self.queue_size,
                                  self.hidden_dim)))

            # assignment in NORMALIZED space against NORMALIZED centroids;
            # enqueue gated on the top-2 distance margin; RAW (un-
            # normalized) student pixels enter the queue (dino_ema.py:
            # 159-187).  The reference enqueues every pixel that clears
            # the margin; fixed-shape analogue: the enqueue_k widest-
            # margin pixels per cluster, invalid slots keep old entries.
            centroid = jax.lax.stop_gradient(params["centroid"])
            cent_n = l2n(centroid)
            d2 = (
                jnp.sum(norm_z**2, -1)[None, :]
                + jnp.sum(cent_n**2, -1)[:, None]
                - 2.0 * cent_n @ norm_z.T
            )                                                  # (C, n)
            assign = jnp.argmin(d2, axis=0)                    # (n,)
            top2 = -jax.lax.top_k(-d2.T, 2)[0]                 # (n, 2) asc
            gap = top2[:, 1] - top2[:, 0]                      # (n,) >= 0
            mask = jax.nn.one_hot(assign, self.n_cluster,
                                  dtype=bool).T                # (C, n)
            eligible = mask & (gap > self.margin)[None]
            score = jnp.where(eligible, gap[None], -jnp.inf)
            top_v, top_i = jax.lax.top_k(score, self.enqueue_k)
            items = z_flat[top_i]                              # (C, k, d)
            n_valid = jnp.sum(top_v > -jnp.inf, axis=-1)       # (C,)

            # append-at-end, keep-last semantics (dino_ema.py:214-217)
            qs, ek = self.queue_size, self.enqueue_k

            def upd(old_row, item_row, v):
                j = jnp.arange(qs)
                from_old = j < qs - v
                old_idx = jnp.clip(j + v, 0, qs - 1)
                item_idx = jnp.clip(j - (qs - v), 0, ek - 1)
                return jnp.where(from_old[:, None], old_row[old_idx],
                                 item_row[item_idx])

            queue = jax.vmap(upd)(queue, items, n_valid)

            from equss_tpu.losses.basic import proxy_loss

            # centroid gradient flows into params["centroid"] — the
            # proxy CE is how the embedding trains (dino_ema.py:274)
            aux["info_nce-loss"] = proxy_loss(
                keys[2], queue, params["centroid"],
                sample_override=_.get("proxy_idx"), **self.proxy_kwargs)
            aux["proxy-loss"] = aux["info_nce-loss"]

            new_state = {
                "ema_head": ema_head, "queue": queue,
                "bank_initialized": jnp.ones((), jnp.int32),
            }
        return {"feat": feat, "code": z_student, "aux": aux}, new_state


# ---------------------------------------------------------------------------
# Contra — unseg skeleton over [img; photometric-aug] with JSD contrast
# ---------------------------------------------------------------------------

class ContraModel(UnSegModel):
    """dino_contra.py:139-276: the chained multi-VQ/enc/dec skeleton run
    on the concatenated (img, aug) batch; JSD between the aug halves of
    the FIRST VQ's assignment distribution is the positive contrast and
    of the LAST VQ's the negative (:252-257).  The reference's host-side
    sklearn k-means positive-sampling stage (stage==1, :143-200) maps to
    ops/kmeans + the kNN-positive pipeline; the T-SNE dump side effect
    (:263-272) belongs to analysis tooling, not the training step."""

    consumes_aug = True
    _vq_in_bias = True    # dino_contra.py:89 nn.Linear carries bias

    def apply(self, params, state, img, img_pos=None, aug_img=None, *,
              training=False, rng=None, **_):
        if training and aug_img is not None:
            img2 = jnp.concatenate([img, aug_img], axis=0)
        else:
            img2 = img
        feat_dino = self.features(params, img2)

        def full(net, feat):
            f = net.encode(feat)
            outs = {}
            feat_vqs = []
            pq_states = []
            probs = []
            for i in range(self.num_vq):
                fi = net.vq_input(i, f)
                z_q, idx, aux, new_s = pq_forward(
                    fi, params["pq"][i], state["pq"][i], self.pq_cfgs[i],
                    training=training, want_prob=training,
                    rng=None if rng is None else jax.random.fold_in(rng, i),
                )
                pq_states.append(new_s)
                feat_vqs.append(z_q)
                probs.append(aux.get("distance_prob"))
                outs[f"vq{i}-loss"] = aux["vq-loss"]
                if i < self.num_vq - 1:
                    f = net.vq_output(i, f, z_q)
            agg, recon = net.decode(feat_vqs, train=training)
            return agg, feat_vqs, outs, pq_states, probs, recon

        variables = {"params": params["net"]}
        if state.get("batch_stats"):
            variables["batch_stats"] = state["batch_stats"]
        (agg, feat_vqs, outs, pq_states, probs, recon), mutated = \
            self.net.apply(variables, feat_dino, method=full,
                           mutable=["batch_stats"] if training else [])
        outs["recon-loss"] = jnp.mean((recon - feat_dino) ** 2)
        outs["vq-loss"] = sum(
            outs[f"vq{i}-loss"] for i in range(self.num_vq)) / self.num_vq

        b = img.shape[0]
        if training and aug_img is not None and probs[0] is not None:
            # concatenated-book rows, like the wrapper output the
            # reference hands its JSD (dino_contra.py:252-257)
            def halves_jsd(p, c):
                flat = p.reshape(-1, c.num_pq * c.num_codebook)
                n = flat.shape[0] // 2
                return jsd_loss(flat[:n], flat[n:])

            outs["contra-loss-pos"] = halves_jsd(probs[0], self.pq_cfgs[0])
            outs["contra-loss-neg"] = halves_jsd(probs[-1],
                                                 self.pq_cfgs[-1])

        new_state = {"pq": pq_states,
                     "batch_stats": mutated.get(
                         "batch_stats", state.get("batch_stats", {}))}
        return {"feat": feat_dino[:b], "code": agg[:b],
                "z_q": feat_vqs[0][:b],
                "feat_vqs": [v[:b] for v in feat_vqs],
                "aux": outs}, new_state
