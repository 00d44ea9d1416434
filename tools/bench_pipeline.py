"""Full-train-loop input-pipeline benchmark (the README table's method).

Measures images/sec of the REAL training loop — host decode -> transfer
thread -> jitted pqgo train step — for each input path:

  pil    — per-item PIL decode (reference DataLoader analogue)
  native — batched C++ JPEG/PNG decode (native/imageloader.cpp)
  pack   — packed decoded-corpus memmap cache (data/cache.py)

Usage:
  python tools/bench_pipeline.py [--corpus DIR] [--n 512] [--epochs 3]

The corpus defaults to a synthetic five-crop-layout fixture built on
first use under /tmp/equss_pipe_bench (realistic multi-octave-noise
320x240 JPEGs + uint8 label PNGs; real-photo JPEGs decode ~2x slower,
so treat ratios, not absolutes, as the portable signal).  Timing
follows PERF.md: device-resident sync via a fetched scalar after each
epoch, first (compile/warm) epoch discarded.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np


def build_fixture(root: str, n: int) -> None:
    from PIL import Image

    crop_root = os.path.join(root, "cropped", "cocostuff27_five_crop_0.5")
    img_dir = os.path.join(crop_root, "img", "train")
    lbl_dir = os.path.join(crop_root, "label", "train")
    if os.path.exists(os.path.join(img_dir, f"{n - 1}.jpg")):
        return
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lbl_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    n_unique = min(n, 64)
    for i in range(n_unique):
        h, w = 240, 320
        img = np.zeros((h, w, 3))
        for s in (8, 32, 128):      # multi-octave noise ~ natural stats
            img += np.kron(rng.rand(h // s + 1, w // s + 1, 3),
                           np.ones((s, s, 1)))[:h, :w]
        img += 0.35 * rng.rand(h, w, 3)
        img = (255 * (img - img.min()) / (img.max() - img.min()))
        Image.fromarray(img.astype(np.uint8)).save(
            os.path.join(img_dir, f"{i}.jpg"), quality=75)
        Image.fromarray(rng.randint(0, 28, (h, w)).astype(np.uint8)).save(
            os.path.join(lbl_dir, f"{i}.png"))
    for i in range(n_unique, n):    # symlink rotation: decode still runs
        os.symlink(os.path.join(img_dir, f"{i % n_unique}.jpg"),
                   os.path.join(img_dir, f"{i}.jpg"))
        os.symlink(os.path.join(lbl_dir, f"{i % n_unique}.png"),
                   os.path.join(lbl_dir, f"{i}.png"))
    nns_dir = os.path.join(root, "nns")
    os.makedirs(nns_dir, exist_ok=True)
    nns = np.stack([np.concatenate([[i], rng.choice(n, 7)])
                    for i in range(n)])
    np.savez(os.path.join(
        nns_dir, "nns_vit_small_cocostuff27_train_five_224.npz"), nns=nns)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/equss_pipe_bench")
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--paths", default="pil,native,pack")
    ap.add_argument("--producers-scan", default=None,
                    help="comma list, e.g. 1,2,4,8: measure HOST-ONLY "
                         "pack-reader img/s at each whole-batch producer "
                         "count (the 1->N reader-scaling record)")
    args = ap.parse_args()

    from equss_tpu.core.config import prepare_config
    from equss_tpu.data.cache import default_pack_base, pack_dataset
    from equss_tpu.data.pipeline import UnSegData
    from equss_tpu.parallel.mesh import device_prefetch
    from equss_tpu.train.trainer import Trainer

    build_fixture(args.corpus, args.n)

    cfg, _ = prepare_config([
        "--config", os.path.join(os.path.dirname(__file__), "..",
                                 "configs", "pqgo_cocostuff27.yaml"),
        f"data_dir={args.corpus}", "debug=true",
        f"dataloader.train.batch_size={args.batch}",
    ])
    cfg["_iter_per_epoch"] = args.n // args.batch

    def pipe(**kw):
        return UnSegData(
            "train", args.corpus, "cocostuff27", crop_type="five", res=224,
            pos_images=True, num_neighbors=7, num_workers=0, **kw)

    if args.producers_scan:
        base = default_pack_base(args.corpus, "cocostuff27", "train",
                                 "five", 224)
        if not os.path.exists(base + ".bin"):
            pack_dataset(pipe(pack="off").dataset, base, log_every=0)
        scan = {}
        for p in [int(x) for x in args.producers_scan.split(",")]:
            data = pipe(pack="on", producers=p)
            assert data._fast_batch_kind() == "pack"
            rates = []
            for epoch in range(args.epochs):
                t0 = time.perf_counter()
                count = sum(b["img"].shape[0]
                            for b in data.batches(args.batch, seed=epoch))
                rates.append(count / (time.perf_counter() - t0))
            scan[p] = max(rates)
            print(f"  pack host-only producers={p}: {scan[p]:.0f} img/s")
        print({k: round(v) for k, v in scan.items()})
        return

    trainer = Trainer(cfg)
    ts = trainer.init_state(jax.random.PRNGKey(0), img_hw=(224, 224))

    if args.n < args.batch:
        raise SystemExit(f"--n {args.n} < --batch {args.batch}: the train "
                         f"loop would yield zero (drop_last) batches")

    def run_epochs(data, tag):
        nonlocal ts
        rates = []
        for epoch in range(args.epochs):
            t0 = time.perf_counter()
            count = 0
            for batch in device_prefetch(
                    map(trainer._host_trim,
                        data.batches(args.batch, seed=epoch)),
                    trainer.mesh):
                ts, metrics = trainer._train_step(ts, batch)
                count += args.batch
            float(metrics["loss"])          # device sync (PERF.md)
            dt = time.perf_counter() - t0
            rates.append(count / dt)
            print(f"  {tag} epoch {epoch}: {count / dt:.1f} img/s "
                  f"({count} imgs, {dt:.1f}s)")
        return max(rates[1:]) if len(rates) > 1 else rates[0]

    results = {}
    for tag in args.paths.split(","):
        if tag == "pil":
            data = pipe(native="off", pack="off")
        elif tag == "native":
            data = pipe(native="on", pack="off")
        elif tag == "pack":
            base = default_pack_base(args.corpus, "cocostuff27", "train",
                                     "five", 224)
            if not os.path.exists(base + ".bin"):
                t0 = time.perf_counter()
                pack_dataset(pipe(pack="off").dataset, base, log_every=0)
                print(f"  [pack build: {time.perf_counter() - t0:.1f}s]")
            data = pipe(pack="on")
        else:
            raise SystemExit(f"unknown path {tag}")
        assert data._fast_batch_kind() == (None if tag == "pil" else tag)
        results[tag] = run_epochs(data, tag)

    print({k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
