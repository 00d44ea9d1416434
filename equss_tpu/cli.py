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
        import jax

        from equss_tpu.data.synthetic import synthetic_batches

        res = cfg["dataset"]["train"]["res"]
        vres = cfg["dataset"]["val"]["res"]
        bs = cfg["dataloader"]["train"]["batch_size"]
        vbs = cfg["dataloader"]["val"]["batch_size"]
        nb = cfg["dataset"].get("synthetic_batches", 16)
        ncls = cfg["num_classes"]
        pi, pc = jax.process_index(), jax.process_count()

        def train_batches(epoch):
            return synthetic_batches(seed + epoch, nb, bs, res, ncls,
                                     process_index=pi, process_count=pc)

        def val_batches():
            return synthetic_batches(seed + 10_000, max(nb // 4, 1), vbs,
                                     vres, ncls, with_pos=False,
                                     process_index=pi, process_count=pc)

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


def _final_eval(cfg, trainer, state, val_batches, logger) -> Dict[str, Any]:
    """Final evaluation ± CRF on a (best) state (train.py:515-530), with
    PNG prediction dumps when is_visualize is set (train.py:338-356)."""
    step = int(state["step"])
    viz_dir = None
    if cfg.get("is_visualize") and cfg.get("visualize_path"):
        viz_dir = os.path.join(cfg["visualize_path"], str(step))
    final_crf = cfg.get("eval", {}).get("final_crf", False)
    # the reference visualizes during the CRF pass; without one, the
    # plain final eval carries the dump
    final = trainer.validate(state, val_batches(),
                             visualize_to=None if final_crf else viz_dir)
    logger.log({f"final_{k}": v for k, v in final.items()}, step=step)
    if final_crf:
        # the exact MXU mean field costs ~281 ms/img @320 (README CRF
        # row) — warn up front so a full val set isn't a surprise
        print(f"final_crf: running CRF-refined eval (exact mean field, "
              f"~0.3 s/img on one chip — expect minutes on a full val "
              f"set)", flush=True)
        t0 = time.time()
        crf_metrics = trainer.validate_crf(state, val_batches(),
                                           visualize_to=viz_dir)
        print(f"final_crf: done in {time.time() - t0:.1f}s", flush=True)
        logger.log({f"final_crf_{k}": v for k, v in crf_metrics.items()},
                   step=step)
        final.update({f"crf_{k}": v for k, v in crf_metrics.items()})
    return final


def _wandb_cfg(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """cfg['wandb'] -> wandb.init kwargs (utils/wandb_utils.py:26-49):
    project/name/tags/notes/id/group/mode pass through."""
    w = dict(cfg.get("wandb", {}) or {})
    w.setdefault("config", {k: v for k, v in cfg.items() if k != "wandb"})
    return w


def run(cfg: Dict[str, Any]) -> Dict[str, Any]:
    import jax

    from equss_tpu.core.checkpoint import CheckpointManager
    from equss_tpu.core.logging import MetricsLogger
    from equss_tpu.parallel.mesh import broadcast_object, replicate
    from equss_tpu.train.trainer import Trainer

    save_dir = os.path.join(
        cfg.get("save_dir", "output"),
        (cfg.get("wandb", {}) or {}).get("name", "run") + "_" +
        time.strftime("%Y%m%d_%H%M%S"),
    )
    # all hosts must agree on the run directory (wandb_utils.py:52-58)
    save_dir = broadcast_object(save_dir, is_source=jax.process_index() == 0)
    logger = MetricsLogger(save_dir=save_dir,
                           use_wandb=not cfg.get("debug", False),
                           wandb_cfg=_wandb_cfg(cfg),
                           is_master=jax.process_index() == 0)
    logger.banner(f"devices: {jax.devices()}")

    train_batches, val_batches, res = _make_batch_fns(cfg)
    trainer = Trainer(cfg, backbone_params=_load_backbone(cfg))

    resume = cfg.get("resume", {}) or {}
    resume_state = None
    if resume.get("checkpoint"):
        template = jax.device_get(trainer.init_state(
            jax.random.PRNGKey(cfg.get("seed", 0)), img_hw=(res, res)))
        restored = CheckpointManager(resume["checkpoint"]).restore(
            template=template)
        if resume.get("mode", "eval") == "eval":
            # reference resume semantics: restore and jump straight to
            # final evaluation (train.py:428-432,515-530)
            state = replicate(trainer.mesh, restored)
            final = _final_eval(cfg, trainer, state, val_batches, logger)
            logger.banner(f"eval-only: {final}")
            logger.close()
            return {"state": state, "best": final}
        resume_state = restored          # mode: train — continue training

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
                         checkpointer=ckpt, img_hw=(res, res),
                         state=resume_state)
    logger.banner(f"best: {result['best']}")

    # reload the BEST checkpoint for the final evaluation ± CRF
    # (train.py:515-530; fit only saves on Cluster-mIoU improvement, so
    # the latest saved step is the best state)
    eval_state = result["state"]
    if ckpt.latest_step() is not None:
        eval_state = replicate(trainer.mesh, ckpt.restore(
            template=jax.device_get(result["state"])))
    _final_eval(cfg, trainer, eval_state, val_batches, logger)
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


def run_pack_job(cfg: Dict[str, Any]) -> None:
    """Packed decoded-corpus cache build (data/cache.py) — one decode
    pass per split; afterwards epoch iteration serves memmap slices
    (dataloader.<mode>.pack: auto picks the pack up automatically)."""
    from equss_tpu.data.cache import default_pack_base, pack_dataset
    from equss_tpu.data.datasets import build_base_dataset

    for mode in ("train", "val"):
        d = (cfg.get("dataset", {}) or {}).get(mode)
        if not d:
            continue
        try:
            ds = build_base_dataset(
                d["dataset_name"], mode, d["data_dir"], d["res"],
                d.get("crop_type"), d.get("crop_ratio", 0.5),
                d.get("loader_crop_type", "center"), cfg.get("seed", 0))
        except (FileNotFoundError, OSError) as e:
            print(f"pack: {mode} corpus not found ({e}) — skipped")
            continue
        if not hasattr(ds, "image_files"):
            print(f"pack: {mode} dataset has no file list — skipped")
            continue
        out = pack_dataset(ds, default_pack_base(
            d["data_dir"], d["dataset_name"], mode, d.get("crop_type"),
            d["res"], d.get("crop_ratio", 0.5)))
        print(f"packed {mode} corpus -> {out}")


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


def run_export_job(cfg: Dict[str, Any]) -> str:
    """Freeze a trained checkpoint into a standalone serving artifact
    (equss_tpu/serve.py — a deployment surface the reference lacks).

    ``python -m equss_tpu.cli export --config X.yaml \
        resume.checkpoint=/run/ckpt export.path=model.eqx``
    """
    import jax

    from equss_tpu import serve
    from equss_tpu.core.checkpoint import CheckpointManager
    from equss_tpu.train.trainer import Trainer

    exp_cfg = cfg.get("export", {}) or {}
    ckpt_path = (cfg.get("resume", {}) or {}).get("checkpoint")
    out_path = exp_cfg.get("path", "model.eqx")
    res = int(exp_cfg.get("res", cfg["dataset"]["val"]["res"]))

    trainer = Trainer(cfg, backbone_params=_load_backbone(cfg))
    template = jax.device_get(trainer.init_state(
        jax.random.PRNGKey(cfg.get("seed", 0)), img_hw=(res, res)))
    state = template
    if ckpt_path:
        state = CheckpointManager(ckpt_path).restore(template=template)
    else:
        print("export: no resume.checkpoint given — exporting the "
              "freshly initialized model (smoke use only)")
    platforms = exp_cfg.get("platforms")
    if isinstance(platforms, str):     # dotlist export.platforms=tpu,cpu
        platforms = [p.strip() for p in platforms.split(",") if p.strip()]
    exported = serve.export_predictor(
        trainer, state, (res, res),
        batch_size=int(exp_cfg.get("batch_size", 1)),
        normalize=bool(exp_cfg.get("normalize", True)),
        platforms=platforms,
        # export.symbolic_batch=off pins the batch so the TPU trace can
        # capture the fused Pallas assignment kernel (serve.py docstring).
        # OmegaConf parses the dotlist literal `off` as boolean False —
        # normalize both spellings.
        symbolic_batch={False: "off", True: "auto"}.get(
            exp_cfg.get("symbolic_batch", "auto"),
            str(exp_cfg.get("symbolic_batch", "auto"))))
    serve.save_predictor(exported, out_path)
    print(f"-> {out_path} ({os.path.getsize(out_path)} bytes; "
          f"input {exported.in_avals[0].shape})")
    return out_path


def _maybe_init_distributed(cfg: Dict[str, Any]) -> None:
    """Multi-host bring-up from dotlist flags or environment — the
    torchrun-rank analogue (/root/reference/utils/dist_utils.py:33-41).

    Launch recipe, one command per host:

        python -m equss_tpu.cli --config X.yaml \
            dist.coordinator=HOST0:1234 dist.num_processes=N \
            dist.process_id=<rank>

    or via env: EQUSS_COORDINATOR / EQUSS_NUM_PROCESSES /
    EQUSS_PROCESS_ID.  Must run before anything touches the jax backend;
    afterwards build_data shards the dataset per process and
    mesh.shard_batch assembles global batches from the local slices.
    On TPU pods where the runtime knows the topology, plain
    ``jax.distributed.initialize()`` with no arguments also works —
    pass dist.auto=true for that.
    """
    dist = cfg.get("dist", {}) or {}
    if dist.get("auto"):
        import jax

        jax.distributed.initialize()
        return
    nproc = dist.get("num_processes", os.environ.get("EQUSS_NUM_PROCESSES"))
    if not nproc or int(nproc) <= 1:
        return
    from equss_tpu.parallel.mesh import init_distributed

    init_distributed(
        coordinator=dist.get("coordinator",
                             os.environ.get("EQUSS_COORDINATOR")),
        num_processes=int(nproc),
        process_id=int(dist.get("process_id",
                                os.environ.get("EQUSS_PROCESS_ID"))),
    )


def main(argv: Optional[List[str]] = None):
    import sys as _sys

    from equss_tpu.core.config import prepare_config
    from equss_tpu.core.random import set_seed

    argv = list(_sys.argv[1:]) if argv is None else list(argv)
    job = "train"
    if argv and argv[0] in ("train", "crop", "knn", "export", "pack"):
        job = argv.pop(0)
    cfg, _ = prepare_config(argv)
    _maybe_init_distributed(cfg)
    set_seed(cfg.get("seed", 0))
    if job == "crop":
        return run_crop_job(cfg)
    if job == "pack":
        return run_pack_job(cfg)
    if job == "knn":
        return run_knn_job(cfg)
    if job == "export":
        return run_export_job(cfg)
    return run(cfg)


if __name__ == "__main__":
    main()
