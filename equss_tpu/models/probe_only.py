"""Probe-only baseline: frozen DINO features -> cluster/linear probes.

The minimum end-to-end slice (SURVEY §7.3 / BASELINE.json configs[0]
'cluster_baseline'): no head, no quantizer — only the evaluator's probes
train, directly on frozen dense DINO features.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from equss_tpu.models.vit import VisionTransformer, make_vit_config


@dataclasses.dataclass(frozen=True)
class ProbeOnlyConfig:
    model_type: str = "vit_small"
    patch_size: int = 8
    backbone_dtype: Any = jnp.float32
    attn_bf16: bool = False
    gelu: Any = None
    ln_stats: str = "f32"

    @staticmethod
    def from_config(cfg: Dict[str, Any], dtype=None) -> "ProbeOnlyConfig":
        pre = cfg["model"]["pretrained"]
        # same autocast-analogue derivation as EQUSSConfig.from_config
        precision = pre.get("precision", "f32")
        if dtype is None:
            dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
        return ProbeOnlyConfig(model_type=pre["model_type"],
                               patch_size=pre["dino_patch_size"],
                               backbone_dtype=dtype,
                               attn_bf16=(precision == "bf16"),
                               gelu=pre.get("gelu"),
                               ln_stats=pre.get("ln_stats", "f32"))


class ProbeOnlyModel:
    def __init__(self, cfg: ProbeOnlyConfig):
        self.cfg = cfg
        self.vit_cfg = make_vit_config(cfg.model_type, cfg.patch_size,
                                       dtype=cfg.backbone_dtype,
                                       attn_bf16=cfg.attn_bf16,
                                       gelu=cfg.gelu,
                                       ln_stats=cfg.ln_stats)
        self.backbone = VisionTransformer(self.vit_cfg)
        self.feat_dim = self.vit_cfg.embed_dim

    def output_dim(self, output_type: str) -> int:
        return self.feat_dim

    def init(self, key, img_hw=(224, 224), backbone_params=None):
        if backbone_params is None:
            backbone_params = self.backbone.init(
                key, jnp.zeros((1, *img_hw, 3)))["params"]
        return {"backbone": backbone_params}, {}

    def features(self, params, img):
        feat = self.backbone.apply({"params": params["backbone"]}, img)["dense"]
        return jax.lax.stop_gradient(feat.astype(jnp.float32))

    def apply(self, params, state, img, img_pos=None, *, training=False,
              rng=None, **_):
        feat = self.features(params, img)
        return {"feat": feat, "code": feat, "aux": {}}, state
