"""End-to-end workflow demo at flagship scale on real hardware.

Exercises the COMPLETE user workflow of the reference
(/root/reference/README.md usage: crop_dataset.py -> precompute_knns.py
-> train.py -> final CRF eval) plus this framework's serving export, on
a generated miniature COCO-Stuff-layout corpus — so the whole path can
be proven on a box with no real datasets and no egress:

    1. corpus   : COCO-Stuff-27 directory layout (images/annotations/
                  curated lists, data/dataset_aug.py:55-143 contract)
    2. crop     : five-crop materialization (data/crop_dataset.py)
    3. pack     : decoded-corpus cache (this framework's addition)
    4. knn      : kNN-positive precompute (data/precompute_knns.py)
    5. train    : flagship pqgo config, ViT-S/8 @224, PQ(64x256),
                  1 epoch + best-checkpoint final eval incl. dense CRF
                  (train.py:390-538)
    6. export   : StableHLO serving artifact + load_predictor check

Run:  python tools/e2e_demo.py [--root /tmp/equss_e2e] [--keep]
Prints one JSON line per stage and a final summary.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(root: str, n_train: int = 96, n_val: int = 24,
                 res: int = 320, seed: int = 0) -> None:
    """Miniature corpus in the exact cocostuff directory layout
    (data/dataset_aug.py:95-109 path contract).  Images are structured
    (class-coded color blobs + noise) so probes move above chance."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    # fine-label ids whose fine->coarse 27-class map spreads across
    # several coarse classes (dataset_utils.py:140-157)
    fine_ids = np.asarray([0, 2, 9, 16, 20, 60, 96, 105, 118, 123,
                           134, 147, 158, 168, 176], np.int32)
    colors = rng.uniform(0.1, 0.9, (len(fine_ids), 3))
    for split, n in (("train2017", n_train), ("val2017", n_val)):
        os.makedirs(os.path.join(root, "images", split), exist_ok=True)
        os.makedirs(os.path.join(root, "annotations", split), exist_ok=True)
        os.makedirs(os.path.join(root, "curated", split), exist_ok=True)
        ids = []
        for i in range(n):
            iid = f"e2e_{split[:-4]}_{i:06d}"
            ids.append(iid)
            # blockwise class regions (32x32 cells)
            grid = rng.randint(0, len(fine_ids), (res // 32, res // 32))
            lab = np.repeat(np.repeat(grid, 32, 0), 32, 1)
            img = colors[lab] + 0.06 * rng.randn(res, res, 3)
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(root, "images", split, iid + ".jpg"),
                quality=95)
            Image.fromarray(fine_ids[lab].astype(np.uint8)).save(
                os.path.join(root, "annotations", split, iid + ".png"))
        for list_name in ("Coco164kFull_Stuff_Coarse.txt",
                          "Coco164kFew_Stuff_6.txt",
                          "Coco164kFull_Stuff_Coarse_7.txt"):
            with open(os.path.join(root, "curated", split, list_name),
                      "w") as f:
                f.write("\n".join(ids))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/equss_e2e")
    ap.add_argument("--keep", action="store_true",
                    help="keep corpus + outputs after the run")
    ap.add_argument("--epochs", type=int, default=1)
    args = ap.parse_args(argv)

    corpus = os.path.join(args.root, "cocostuff27")
    out_dir = os.path.join(args.root, "output")
    os.makedirs(out_dir, exist_ok=True)

    from equss_tpu.cli import main as cli_main

    timings = {}

    def stage(name, fn):
        t0 = time.time()
        ret = fn()
        timings[name] = round(time.time() - t0, 2)
        print(json.dumps({"stage": name, "seconds": timings[name]}),
              flush=True)
        return ret

    base = ["--config", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "pqgo_cocostuff27.yaml"), "--debug",
        f"data_dir={corpus}", f"save_dir={out_dir}"]

    cfg_path = base[1]
    stage("corpus", lambda: build_corpus(corpus))
    # five-crop materialization + kNN cache (reference offline jobs)
    stage("crop", lambda: cli_main(["crop", "--config", cfg_path,
                                    f"data_dir={corpus}"]))
    stage("pack", lambda: cli_main(["pack", "--config", cfg_path,
                                    f"data_dir={corpus}"]))
    stage("knn", lambda: cli_main(["knn", "--config", cfg_path,
                                   f"data_dir={corpus}",
                                   "dataset.train.num_neighbors=7"]))
    result = stage("train", lambda: cli_main(base + [
        f"train.max_epochs={args.epochs}",
        "train.valid_interval_iters=15",
        "train.print_interval_iters=5",
        "is_visualize=true",
        f"visualize_path={os.path.join(out_dir, 'viz')}",
    ]))

    # serving export on the best checkpoint + a predictor round trip
    def export_and_check():
        import glob

        ckpts = sorted(glob.glob(os.path.join(out_dir, "*", "ckpt")))
        assert ckpts, f"no best checkpoint written under {out_dir}"
        art = os.path.join(out_dir, "model.eqx")
        cli_main(["export", "--config", cfg_path, f"data_dir={corpus}",
                  f"save_dir={out_dir}", f"resume.checkpoint={ckpts[-1]}",
                  "export.res=224",
                  f"export.path={art}", "export.batch_size=4"])
        from equss_tpu.serve import load_predictor
        predict = load_predictor(art)
        out = predict(np.random.RandomState(0)
                      .rand(4, 224, 224, 3).astype(np.float32))
        assert out["cluster_preds"].shape == (4, 224, 224), (
            out["cluster_preds"].shape)
        return {"artifact_mb": round(os.path.getsize(art) / 2**20, 1),
                "ckpts": len(ckpts)}

    export_info = stage("export", export_and_check)

    summary = {
        "e2e": "ok",
        "backend": _backend(),
        "timings_s": timings,
        "final_metrics": {k: round(float(v), 4)
                          for k, v in (result.get("best") or {}).items()
                          if isinstance(v, (int, float))},
        "export": export_info,
    }
    print(json.dumps(summary), flush=True)
    if not args.keep:
        shutil.rmtree(args.root, ignore_errors=True)
    return 0


def _backend() -> str:
    import jax

    return jax.devices()[0].platform


if __name__ == "__main__":
    sys.exit(main())
