"""STEGO baseline: frozen DINO + segmentation head + correspondence loss.

Equivalent of DINOStego (/root/reference/model/dino_stego.py:11-66) —
the EQUSS pipeline without the quantizer, with a low-dim code head
(dim=70 by default, config/stego.yaml).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from equss_tpu.losses.stego import StegoLossConfig, stego_loss
from equss_tpu.models.equss import stego_config_from_dict
from equss_tpu.models.heads import ExpansionHead, dropout2d
from equss_tpu.models.vit import VisionTransformer, make_vit_config


@dataclasses.dataclass(frozen=True)
class STEGOConfig:
    model_type: str = "vit_small"
    patch_size: int = 8
    dim: int = 70
    dropout: bool = True
    drop_prob: float = 0.1
    freeze_backbone: bool = True
    backbone_dtype: Any = jnp.float32
    attn_bf16: bool = False
    gelu: Any = None
    ln_stats: str = "f32"
    stego: StegoLossConfig = dataclasses.field(default_factory=StegoLossConfig)

    @staticmethod
    def from_config(cfg: Dict[str, Any], dtype=None) -> "STEGOConfig":
        pre = cfg["model"]["pretrained"]
        # model.pretrained.precision: 'f32' (default) | 'bf16' — same
        # autocast-analogue derivation as EQUSSConfig.from_config (this
        # was previously ignored here: the stego backbone silently ran
        # f32 einsum attention under a config claiming bf16)
        precision = pre.get("precision", "f32")
        if dtype is None:
            dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
        # stego.yaml puts the loss knobs directly under cfg['loss']
        loss_cfg = cfg["loss"].get("stego", cfg["loss"])
        return STEGOConfig(
            model_type=pre["model_type"],
            patch_size=pre["dino_patch_size"],
            dim=pre.get("dim", 70),
            dropout=pre.get("dropout", True),
            drop_prob=pre.get("drop_prob", 0.1),
            freeze_backbone=pre.get("freeze_backbone", True),
            backbone_dtype=dtype,
            attn_bf16=(precision == "bf16"),
            gelu=pre.get("gelu"),
            ln_stats=pre.get("ln_stats", "f32"),
            stego=stego_config_from_dict(loss_cfg),
        )


class STEGOModel:
    """params = {'backbone', 'head'}; state = {} (stateless)."""

    def __init__(self, cfg: STEGOConfig):
        self.cfg = cfg
        self.vit_cfg = make_vit_config(cfg.model_type, cfg.patch_size,
                                       ln_stats=cfg.ln_stats,
                                       dtype=cfg.backbone_dtype,
                                       attn_bf16=cfg.attn_bf16,
                                       gelu=cfg.gelu)
        self.backbone = VisionTransformer(self.vit_cfg)
        self.head = ExpansionHead(cfg.dim)
        self.feat_dim = self.vit_cfg.embed_dim

    def output_dim(self, output_type: str) -> int:
        return self.cfg.dim

    def init(self, key, img_hw=(224, 224), backbone_params=None):
        k_bb, k_head = jax.random.split(key)
        if backbone_params is None:
            backbone_params = self.backbone.init(
                k_bb, jnp.zeros((1, *img_hw, 3)))["params"]
        gh, gw = img_hw[0] // self.cfg.patch_size, img_hw[1] // self.cfg.patch_size
        head_params = self.head.init(
            k_head, jnp.zeros((1, gh, gw, self.feat_dim)))["params"]
        return {"backbone": backbone_params, "head": head_params}, {}

    def features(self, params, img):
        feat = self.backbone.apply({"params": params["backbone"]}, img)["dense"]
        feat = feat.astype(jnp.float32)
        if self.cfg.freeze_backbone:
            feat = jax.lax.stop_gradient(feat)
        return feat

    def apply(self, params, state, img, img_pos=None, *, training=False,
              rng=None, stego_override=None, **_):
        """stego_override: optional (coords1, coords2, perms) injected
        into the STEGO loss in place of its random draws — the
        deterministic-replay seam the twin-parity harness uses
        (losses/stego.py sample_override)."""
        cfg = self.cfg
        if training and rng is None:
            raise ValueError("training forward requires rng")
        keys = jax.random.split(rng, 3) if rng is not None else [None] * 3

        feat = self.features(params, img)
        if training and cfg.dropout:
            feat = dropout2d(keys[0], feat, cfg.drop_prob)
        code = self.head.apply({"params": params["head"]}, feat)

        aux: Dict[str, Any] = {}
        if training:
            if img_pos is None:
                raise ValueError("training forward requires img_pos")
            feat_pos = self.features(params, img_pos)
            if cfg.dropout:
                feat_pos = dropout2d(keys[1], feat_pos, cfg.drop_prob)
            code_pos = self.head.apply({"params": params["head"]}, feat_pos)
            aux["stego-loss"] = stego_loss(keys[2], feat, feat_pos,
                                           code, code_pos, cfg.stego,
                                           sample_override=stego_override)
        return {"feat": feat, "code": code, "aux": aux}, state
