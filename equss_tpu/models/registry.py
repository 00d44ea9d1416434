"""Model registry.

Replaces the reference's dispatch-by-wandb-run-name-substring
(/root/reference/build.py:39-63) with an explicit ``model.name`` config
key; the substring behavior is kept as a fallback so reference configs
work unchanged (their run names contain the keywords).
"""
from __future__ import annotations

from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Callable[[Dict[str, Any]], Any]] = {}

# dispatch order for the substring fallback (build.py:39-63 if-chain order)
_KEYWORD_ORDER = [
    "hihi", "sl", "pqgocls", "pqgo", "stego", "spq", "new", "cluster",
    "res", "contra", "vae", "info", "ema", "vq",
]


def register(name: str):
    def deco(builder):
        _REGISTRY[name] = builder
        return builder
    return deco


def available_models():
    return sorted(_REGISTRY)


def resolve_model_name(cfg: Dict[str, Any]) -> str:
    name = cfg.get("model", {}).get("name")
    if name:
        if name not in _REGISTRY:
            raise ValueError(
                f"Unknown model '{name}'; available: {available_models()}")
        return name
    run_name = (cfg.get("wandb", {}) or {}).get("name", "").lower()
    for kw in _KEYWORD_ORDER:
        if kw in run_name and kw in _REGISTRY:
            return kw
    raise ValueError(
        f"Could not resolve model from run name '{run_name}'; set model.name "
        f"to one of {available_models()}")


def build_model(cfg: Dict[str, Any]):
    """Config dict -> model object (init/apply/output_dim protocol)."""
    return _REGISTRY[resolve_model_name(cfg)](cfg)


# ---------------------------------------------------------------------------
# builders
# ---------------------------------------------------------------------------

@register("pqgo")
def _build_pqgo(cfg):
    from equss_tpu.models.equss import EQUSS, EQUSSConfig

    return EQUSS(EQUSSConfig.from_config(cfg))


# vq/pq baselines are EQUSS with different vq settings (num_pq=1 => VQ)
@register("vq")
def _build_vq(cfg):
    return _build_pqgo(cfg)


@register("stego")
def _build_stego(cfg):
    from equss_tpu.models.stego import STEGOConfig, STEGOModel

    return STEGOModel(STEGOConfig.from_config(cfg))


@register("probe")
def _build_probe(cfg):
    from equss_tpu.models.probe_only import ProbeOnlyConfig, ProbeOnlyModel

    return ProbeOnlyModel(ProbeOnlyConfig.from_config(cfg))


@register("hihi")
def _build_unseg(cfg):
    from equss_tpu.models.variants import UnSegModel

    return UnSegModel(cfg)


@register("new")
def _build_new_vq(cfg):
    from equss_tpu.models.variants import NewVQModel

    return NewVQModel(cfg)


@register("spq")
def _build_spq(cfg):
    from equss_tpu.models.variants import SPQModel

    return SPQModel(cfg)


@register("cluster")
def _build_cluster(cfg):
    from equss_tpu.models.variants import ClusterModel

    return ClusterModel(cfg)


@register("vae")
def _build_vae(cfg):
    from equss_tpu.models.variants import VAEModel

    return VAEModel(cfg)


@register("res")
def _build_res(cfg):
    from equss_tpu.models.variants import ResModel

    return ResModel(cfg)


@register("info")
def _build_info(cfg):
    from equss_tpu.models.variants import InfoModel

    return InfoModel(cfg)


@register("contra")
def _build_contra(cfg):
    from equss_tpu.models.variants import ContraModel

    return ContraModel(cfg)


@register("ema")
def _build_ema(cfg):
    from equss_tpu.models.variants import EMAModel

    return EMAModel(cfg)


@register("pqgocls")
def _build_pqgocls(cfg):
    from equss_tpu.models.variants import PQGOCLSModel

    return PQGOCLSModel(cfg)


@register("sl")
def _build_sl(cfg):
    # supervised linear-probe training on the STEGO head
    # (sl_train.py + wrapper/SupervisedWrapper.py) — the trainer's
    # supervised mode routes CE gradients into the head
    from equss_tpu.models.stego import STEGOConfig, STEGOModel

    return STEGOModel(STEGOConfig.from_config(cfg))
