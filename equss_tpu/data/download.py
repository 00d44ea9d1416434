"""Dataset download helper.

Equivalent of /root/reference/data/download_dataset.py:6-22: fetches the
STEGO-hosted zips for potsdam/cityscapes/cocostuff.  Gated behind
explicit invocation — the TPU build environment has no egress, so this
only runs on machines that do.
"""
from __future__ import annotations

import os
import subprocess
from typing import Iterable

# STEGO-hosted archives (download_dataset.py:6-22)
DATASET_URLS = {
    "potsdam": [
        "https://marhamilresearch4.blob.core.windows.net/stego-public/pytorch_data/potsdam.zip",
    ],
    "potsdamraw": [
        "https://marhamilresearch4.blob.core.windows.net/stego-public/pytorch_data/potsdamraw.zip",
    ],
    "cityscapes": [
        "https://marhamilresearch4.blob.core.windows.net/stego-public/pytorch_data/cityscapes.zip",
    ],
    "cocostuff": [
        "https://marhamilresearch4.blob.core.windows.net/stego-public/pytorch_data/cocostuff.zip",
    ],
}


def download_datasets(names: Iterable[str], out_dir: str,
                      unzip: bool = True) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        if name not in DATASET_URLS:
            raise ValueError(
                f"Unknown dataset {name}; known: {sorted(DATASET_URLS)}")
        for url in DATASET_URLS[name]:
            dest = os.path.join(out_dir, os.path.basename(url))
            if not os.path.exists(dest):
                subprocess.run(["wget", "-q", "-O", dest, url], check=True)
            if unzip:
                subprocess.run(["unzip", "-qo", dest, "-d", out_dir],
                               check=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("datasets", nargs="+", choices=sorted(DATASET_URLS))
    ap.add_argument("--out", default="../Datasets")
    ap.add_argument("--no-unzip", action="store_true")
    args = ap.parse_args()
    download_datasets(args.datasets, args.out, unzip=not args.no_unzip)
