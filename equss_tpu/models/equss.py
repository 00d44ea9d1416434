"""EQUSS: frozen DINO ViT -> expansion head -> product quantization.

The flagship model, equivalent of DIONPQGO (/root/reference/model/
dino_pqgo.py:15-154) re-designed functionally: parameters and quantizer
state are explicit pytrees threaded through a pure ``apply``, so the
whole step jits/pjits cleanly.  NHWC throughout.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from equss_tpu.losses.stego import StegoLossConfig, stego_loss
from equss_tpu.models.heads import ExpansionHead, dropout2d
from equss_tpu.models.vit import VisionTransformer, make_vit_config
from equss_tpu.ops.quantizer import (
    PQConfig,
    ema_jsd_entropy,
    pq_data_init,
    pq_forward,
    pq_init,
)


def pq_config_from_dict(vq: Dict[str, Any]) -> PQConfig:
    """cfg['model']['vq'] (config/pqgo_baseline.yaml:32-48) -> PQConfig."""
    num_pq = vq.get("num_pq", 1)
    if isinstance(num_pq, (list, tuple)):
        num_pq = num_pq[0]
    return PQConfig(
        num_pq=num_pq,
        num_codebook=vq["num_codebooks"][0],
        embed_dim=vq["embed_dims"][0],
        vq_type=vq.get("vq_type", "param"),
        beta=vq.get("beta", 0.25),
        book=vq.get("book", 1.0),
        normalize=vq.get("normalize", "none"),
        use_weighted_sum=vq.get("use_weighted_sum", False),
        use_gumbel=vq.get("use_gumbel", False),
        use_restart=vq.get("use_restart", False),
        use_split=vq.get("use_split", False),
        need_initialized=vq.get("need_initialized", "none"),
        pq_dropout=vq.get("pq_dropout", 0.0),
        decay=vq.get("decay", 0.99),
        eps=vq.get("eps", 1e-5),
        jsd_ts=vq.get("jsd_ts", 1.0),
        use_pallas=vq.get("use_pallas", "auto"),
        assign_precision=vq.get("assign_precision", "exact"),
    )


def stego_config_from_dict(stego: Dict[str, Any]) -> StegoLossConfig:
    d = StegoLossConfig()   # defaults when a config omits the block (sl)
    return StegoLossConfig(
        pos_intra_weight=stego.get("pos_intra_weight", d.pos_intra_weight),
        pos_inter_weight=stego.get("pos_inter_weight", d.pos_inter_weight),
        neg_inter_weight=stego.get("neg_inter_weight", d.neg_inter_weight),
        pos_intra_shift=stego.get("pos_intra_shift", d.pos_intra_shift),
        pos_inter_shift=stego.get("pos_inter_shift", d.pos_inter_shift),
        neg_inter_shift=stego.get("neg_inter_shift", d.neg_inter_shift),
        zero_clamp=stego.get("zero_clamp", True),
        pointwise=stego.get("pointwise", True),
        stabilize=stego.get("stabilize", False),
        feature_samples=stego.get("feature_samples", 11),
        neg_samples=stego.get("neg_samples", 5),
        correlation_precision=stego.get("correlation_precision",
                                        d.correlation_precision),
    )


@dataclasses.dataclass(frozen=True)
class EQUSSConfig:
    model_type: str = "vit_small"
    patch_size: int = 8
    hidden_dim: int = 1024
    dropout: bool = True
    drop_prob: float = 0.1
    freeze_backbone: bool = True
    backbone_dtype: Any = jnp.float32
    attn_bf16: bool = False
    # model.pretrained.gelu: None (auto) | 'erf' | 'tanh' — lets
    # parity-sensitive bf16 runs keep the exact erf GELU
    gelu: Any = None
    # model.pretrained.ln_stats: 'f32' (default) | 'bf16' opt-in speed
    # mode (ViTConfig.ln_stats_bf16; PERF.md r5)
    ln_stats: str = "f32"
    pq: PQConfig = dataclasses.field(default_factory=PQConfig)
    stego: StegoLossConfig = dataclasses.field(default_factory=StegoLossConfig)

    @staticmethod
    def from_config(cfg: Dict[str, Any], dtype=None) -> "EQUSSConfig":
        m = cfg["model"]
        pre = m["pretrained"]
        # model.pretrained.precision: 'f32' (default) | 'bf16' — bf16 is
        # the analogue of the reference's fp16 autocast (train.py:80)
        precision = pre.get("precision", "f32")
        if dtype is None:
            dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
        return EQUSSConfig(
            model_type=pre["model_type"],
            patch_size=pre["dino_patch_size"],
            hidden_dim=m["vq"]["embed_dims"][0],
            dropout=pre.get("dropout", True),
            drop_prob=pre.get("drop_prob", 0.1),
            freeze_backbone=pre.get("freeze_backbone", True),
            backbone_dtype=dtype,
            attn_bf16=(precision == "bf16"),
            gelu=pre.get("gelu"),
            ln_stats=pre.get("ln_stats", "f32"),
            pq=pq_config_from_dict(m["vq"]),
            stego=stego_config_from_dict(cfg["loss"]["stego"]),
        )


class EQUSS:
    """Pure-functional model bundle (dino_pqgo.py:15-154 equivalent).

    params = {'backbone': ..., 'head': ..., 'pq': ...}
    state  = {'pq': ...}
    """

    def __init__(self, cfg: EQUSSConfig):
        self.cfg = cfg
        self.vit_cfg = make_vit_config(
            cfg.model_type, cfg.patch_size, dtype=cfg.backbone_dtype,
            attn_bf16=cfg.attn_bf16, gelu=cfg.gelu, ln_stats=cfg.ln_stats,
        )
        self.backbone = VisionTransformer(self.vit_cfg)
        self.head = ExpansionHead(cfg.hidden_dim)
        self.feat_dim = self.vit_cfg.embed_dim

    def output_dim(self, output_type: str) -> int:
        """Probe input dim for eval.output_type (wrapper/PQGOWrapper.py:37-46):
        both 'feat' (the expansion-head code) and 'vqN' are hidden_dim."""
        return self.cfg.hidden_dim

    # -- init ---------------------------------------------------------------
    def init(
        self,
        key: jax.Array,
        img_hw: Tuple[int, int] = (224, 224),
        backbone_params: Optional[Dict[str, Any]] = None,
    ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        k_bb, k_head, k_pq = jax.random.split(key, 3)
        dummy = jnp.zeros((1, *img_hw, 3), jnp.float32)
        if backbone_params is None:
            backbone_params = self.backbone.init(k_bb, dummy)["params"]
        gh, gw = img_hw[0] // self.cfg.patch_size, img_hw[1] // self.cfg.patch_size
        head_params = self.head.init(
            k_head, jnp.zeros((1, gh, gw, self.feat_dim))
        )["params"]
        pq_params, pq_state = pq_init(k_pq, self.cfg.pq)
        params = {"backbone": backbone_params, "head": head_params,
                  "pq": pq_params}
        state = {"pq": pq_state}
        return params, state

    # -- featurizer (dino_featurizer.py:64-83) -------------------------------
    def features(self, params: Dict[str, Any], img: jnp.ndarray) -> jnp.ndarray:
        feat = self.backbone.apply({"params": params["backbone"]}, img)["dense"]
        feat = feat.astype(jnp.float32)
        if self.cfg.freeze_backbone:
            feat = jax.lax.stop_gradient(feat)
        return feat

    def encode(self, params: Dict[str, Any], feat: jnp.ndarray) -> jnp.ndarray:
        """Expansion head: cluster1 + cluster2 (dino_pqgo.py:127-128)."""
        return self.head.apply({"params": params["head"]}, feat)

    # -- data-dependent codebook init (first batch) ---------------------------
    @property
    def needs_data_init(self) -> bool:
        return self.cfg.pq.need_initialized in ("kmeans", "rand")

    def data_init(
        self,
        params: Dict[str, Any],
        state: Dict[str, Any],
        img: jnp.ndarray,
        rng: jax.Array,
    ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        """kmeans/rand codebook init from the first train batch
        (dino_pqgo.py:341-355): cluster the expansion-head code and
        overwrite the codebook before the first optimizer step.  Runs
        without dropout so the init is deterministic given the batch."""
        code = self.encode(params, self.features(params, img))
        zf = code.reshape(-1, self.cfg.pq.num_pq, self.cfg.pq.sub_dim)
        pq_p, pq_s = pq_data_init(
            rng, zf, params["pq"], state["pq"], self.cfg.pq)
        return dict(params, pq=pq_p), dict(state, pq=pq_s)

    # -- full forward ---------------------------------------------------------
    def apply(
        self,
        params: Dict[str, Any],
        state: Dict[str, Any],
        img: Optional[jnp.ndarray] = None,
        img_pos: Optional[jnp.ndarray] = None,
        *,
        feat: Optional[jnp.ndarray] = None,
        feat_pos: Optional[jnp.ndarray] = None,
        training: bool = False,
        rng: Optional[jax.Array] = None,
        stego_override: Optional[Tuple] = None,
        **_: Any,
    ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        """Forward (dino_pqgo.py:114-154).

        Either images or precomputed dense features may be supplied: the
        backbone is frozen, so caching its features once and training
        the head/PQ from the cache (``feat``/``feat_pos``) skips the ViT
        entirely — a TPU-first training mode the reference lacks.

        Returns (out, new_state); out holds code, z_q, indices, aux
        (vq-loss, stego-loss, codebook telemetry, distance_prob).
        """
        cfg = self.cfg
        if training and rng is None:
            raise ValueError("training forward requires rng")
        k_drop = k_drop_pos = k_pq = k_stego = None
        if rng is not None:
            k_drop, k_drop_pos, k_pq, k_stego = jax.random.split(rng, 4)

        code_pos = None
        if training:
            if feat is None and img_pos is None:
                raise ValueError("training forward requires img_pos (kNN positive)")
            if feat is not None:
                if feat_pos is None:
                    raise ValueError("cached-feature training requires feat_pos")
                both = jnp.concatenate([feat, feat_pos], 0)
                b = feat.shape[0]
            else:
                # ONE backbone forward over [img; img_pos]: the reference
                # runs the frozen ViT twice (dino_pqgo.py:125,132)
                b = img.shape[0]
                both = self.features(params, jnp.concatenate([img, img_pos], 0))
            if cfg.dropout:
                both = dropout2d(k_drop, both, cfg.drop_prob)
            code_both = self.encode(params, both)
            feat, feat_pos = both[:b], both[b:]
            code, code_pos = code_both[:b], code_both[b:]
        else:
            if feat is None:
                feat = self.features(params, img)
            code = self.encode(params, feat)

        z_q, indices, aux, pq_state = pq_forward(
            code, params["pq"], state["pq"], cfg.pq,
            training=training, rng=k_pq,
        )

        if training:
            aux["stego-loss"] = stego_loss(
                k_stego, feat, feat_pos, code, code_pos, cfg.stego,
                sample_override=stego_override,
            )
            if cfg.pq.vq_type == "ema" and "distance_prob" in aux:
                # telemetry on batch halves (dino_pqgo.py:452-455)
                prob = aux["distance_prob"]
                flat = prob.reshape(-1, prob.shape[-2], prob.shape[-1])
                half = flat.shape[0] // 2
                jsd, ent = ema_jsd_entropy(flat[:half], flat[half: 2 * half])
                aux["jsd"] = jsd
                aux["entropy"] = ent

        out = {
            "feat": feat,
            "code": code,
            "z_q": z_q,
            "indices": indices,
            "aux": aux,
        }
        return out, {"pq": pq_state}
