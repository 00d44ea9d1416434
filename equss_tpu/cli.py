"""CLI trainer: ``python -m equss_tpu.cli --config configs/X.yaml [a.b=c ...]``.

Equivalent of the reference entry points (train.py:541-543 plus the
eval.py / train_vq.py / sl_train.py clones — one trainer here serves all
model variants via the registry).  Flow (train.py run():390-538):
config -> seed -> data -> model/trainer -> epoch loop with periodic
validation -> best checkpoint -> final evaluation (optionally with CRF).
"""
from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional

import numpy as np


def _load_backbone(cfg: Dict[str, Any]):
    pre = cfg["model"]["pretrained"]
    path = pre.get("pretrained_weights")
    if not path:
        return None
    from equss_tpu.models.vit import load_dino_backbone

    _, params = load_dino_backbone(pre["model_type"], pre["dino_patch_size"],
                                   pretrained_path=path)
    return params


def _make_batch_fns(cfg: Dict[str, Any]):
    """Return (train_batches(epoch), val_batches()) callables."""
    seed = cfg.get("seed", 0)
    if cfg.get("dataset", {}).get("synthetic"):
        from equss_tpu.data.synthetic import synthetic_batches

        res = cfg["dataset"]["train"]["res"]
        vres = cfg["dataset"]["val"]["res"]
        bs = cfg["dataloader"]["train"]["batch_size"]
        vbs = cfg["dataloader"]["val"]["batch_size"]
        nb = cfg["dataset"].get("synthetic_batches", 16)
        ncls = cfg["num_classes"]

        def train_batches(epoch):
            return synthetic_batches(seed + epoch, nb, bs, res, ncls)

        def val_batches():
            return synthetic_batches(seed + 10_000, max(nb // 4, 1), vbs,
                                     vres, ncls, with_pos=False)

        cfg["_iter_per_epoch"] = nb      # cosine-schedule horizon
        return train_batches, val_batches, res

    from equss_tpu.data.pipeline import build_data

    train_data = build_data(cfg, "train", seed=seed)
    val_data = build_data(cfg, "val", seed=seed)
    bs = cfg["dataloader"]["train"]["batch_size"]
    vbs = cfg["dataloader"]["val"]["batch_size"]

    def train_batches(epoch):
        return train_data.batches(bs, seed=seed + epoch)

    def val_batches():
        return val_data.batches(vbs, shuffle=False, drop_last=False)

    # cosine schedules need the true per-epoch update count
    # (build.py:123-141 semantics)
    cfg["_iter_per_epoch"] = max(len(train_data) // bs, 1)
    return train_batches, val_batches, cfg["dataset"]["train"]["res"]


def run(cfg: Dict[str, Any]) -> Dict[str, Any]:
    import jax

    from equss_tpu.core.checkpoint import CheckpointManager
    from equss_tpu.core.logging import MetricsLogger
    from equss_tpu.train.trainer import Trainer

    save_dir = os.path.join(
        cfg.get("save_dir", "output"),
        (cfg.get("wandb", {}) or {}).get("name", "run") + "_" +
        time.strftime("%Y%m%d_%H%M%S"),
    )
    logger = MetricsLogger(save_dir=save_dir,
                           use_wandb=not cfg.get("debug", False))
    logger.banner(f"devices: {jax.devices()}")

    train_batches, val_batches, res = _make_batch_fns(cfg)
    trainer = Trainer(cfg, backbone_params=_load_backbone(cfg))
    profile_dir = cfg.get("train", {}).get("profile_dir")
    if profile_dir:
        # capture an xplane trace of the first steps (the reference only
        # had wall-clock prints, train.py:137-138; SURVEY §5)
        import jax as _jax

        _jax.profiler.start_trace(profile_dir)
        import atexit

        atexit.register(_jax.profiler.stop_trace)
    ckpt = CheckpointManager(os.path.join(save_dir, "ckpt"))

    result = trainer.fit(train_batches, val_batches, logger=logger,
                         checkpointer=ckpt, img_hw=(res, res))
    logger.banner(f"best: {result['best']}")

    # final eval on the last state (the reference reloads best.pth and
    # evaluates with and without CRF, train.py:515-530)
    final = trainer.validate(result["state"], val_batches())
    logger.log({f"final_{k}": v for k, v in final.items()},
               step=int(result["state"]["step"]))
    if cfg.get("eval", {}).get("final_crf", False) and hasattr(trainer, "validate_crf"):
        crf_metrics = trainer.validate_crf(result["state"], val_batches())
        logger.log({f"final_crf_{k}": v for k, v in crf_metrics.items()},
                   step=int(result["state"]["step"]))
    ckpt.close()      # wait for async orbax saves before interpreter exit
    logger.close()
    return result


def run_crop_job(cfg: Dict[str, Any]) -> None:
    """Five-crop materialization (data/crop_dataset.py my_app)."""
    from equss_tpu.data.jobs import materialize_crops

    d = cfg["dataset"]["train"]
    out = materialize_crops(
        d["dataset_name"], d["data_dir"],
        mode="train", crop_type=d.get("crop_type", "five"),
        crop_ratio=d.get("crop_ratio", 0.5),
    )
    print(f"cropped corpus written to {out}")


def run_knn_job(cfg: Dict[str, Any]) -> None:
    """kNN-positive cache precompute (data/precompute_knns.py my_app)."""
    import os

    from equss_tpu.data.jobs import precompute_knns
    from equss_tpu.data.pipeline import UnSegData
    from equss_tpu.models.registry import build_model

    model = build_model(cfg)
    params, _ = model.init(
        __import__("jax").random.PRNGKey(cfg.get("seed", 0)),
        img_hw=(cfg["dataset"]["train"]["res"],) * 2,
        backbone_params=_load_backbone(cfg),
    )
    d = cfg["dataset"]["train"]
    # NB pos_images must be OFF here — this job CREATES the neighbor cache
    data = UnSegData(
        mode="train", data_dir=d["data_dir"],
        dataset_name=d["dataset_name"],
        model_type=d.get("model_type", "vit_small"),
        crop_type=d.get("crop_type"), crop_ratio=d.get("crop_ratio", 0.5),
        loader_crop_type=d.get("loader_crop_type", "center"),
        res=d["res"], pos_images=False, seed=cfg.get("seed", 0),
    )
    out_path = os.path.join(
        d["data_dir"], "nns",
        f"nns_{d.get('model_type', 'vit_small')}_{d['dataset_name']}_train_"
        f"{d.get('crop_type')}_224.npz",
    )
    print("->", precompute_knns(model, params, data, out_path, k=30))


def main(argv: Optional[List[str]] = None):
    import sys as _sys

    from equss_tpu.core.config import prepare_config
    from equss_tpu.core.random import set_seed

    argv = list(_sys.argv[1:]) if argv is None else list(argv)
    job = "train"
    if argv and argv[0] in ("train", "crop", "knn"):
        job = argv.pop(0)
    cfg, _ = prepare_config(argv)
    set_seed(cfg.get("seed", 0))
    if job == "crop":
        return run_crop_job(cfg)
    if job == "knn":
        return run_knn_job(cfg)
    return run(cfg)


if __name__ == "__main__":
    main()
