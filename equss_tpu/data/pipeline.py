"""Input pipeline: UnSegData facade + batching with kNN positives.

Equivalent of UnSegDataset + build_dataloader
(/root/reference/data/dataset_aug.py:388-529, build.py:167-199), without
torch DataLoader machinery: a seeded epoch iterator collates numpy
batches and (in train mode) attaches the kNN positive image sampled from
the precomputed top-k neighbor cache (dataset_aug.py:519-527).

There is no DistributedSampler: under pjit the GLOBAL batch is assembled
on the host and sharded over the mesh's data axis by the trainer, which
is the JAX-native replacement for per-rank batch slicing
(build.py:183-198).  Multi-host setups slice image lists per process
before constructing the pipeline.
"""
from __future__ import annotations

import os
from os.path import join
from typing import Any, Dict, Iterator, Optional

import numpy as np

from equss_tpu.data.datasets import build_base_dataset


class UnSegData:
    def __init__(
        self,
        mode: str,
        data_dir: str,
        dataset_name: str,
        model_type: str = "vit_small",
        crop_type: Optional[str] = None,
        crop_ratio: float = 0.5,
        loader_crop_type: str = "center",
        res: int = 224,
        pos_images: bool = False,
        num_neighbors: int = 7,
        seed: int = 0,
        nns_path: Optional[str] = None,
    ) -> None:
        self.mode = mode
        self.pos_images = pos_images
        self.num_neighbors = num_neighbors
        self.dataset = build_base_dataset(
            dataset_name, mode, data_dir, res, crop_type, crop_ratio,
            loader_crop_type, seed,
        )
        self.nns: Optional[np.ndarray] = None
        if pos_images:
            if nns_path is None:
                # cache naming contract (dataset_aug.py:488-489)
                base = "cocostuff27" if "cocostuff" in dataset_name else dataset_name
                nns_path = join(
                    data_dir, "nns",
                    f"nns_{model_type}_{dataset_name}_{mode}_{crop_type}_224.npz",
                )
            if not os.path.exists(nns_path):
                raise FileNotFoundError(
                    f"could not find nn file {nns_path}; run the kNN "
                    f"precompute job (equss_tpu.data.jobs.precompute_knns)")
            self.nns = np.load(nns_path)["nns"]
            assert len(self.dataset) == self.nns.shape[0]

    def __len__(self) -> int:
        return len(self.dataset)

    def item(self, index: int, rng: np.random.RandomState) -> Dict[str, Any]:
        ret = dict(self.dataset[index])
        if self.nns is not None:
            # random 1..num_neighbors-th neighbor (dataset_aug.py:519-521)
            k = rng.randint(1, self.num_neighbors + 1)
            ind_pos = int(self.nns[index][k])
            pos = self.dataset[ind_pos]
            ret["index_pos"] = ind_pos
            ret["img_pos"] = pos["img"]
            ret["label_pos"] = pos["label"]
        return ret

    def batches(
        self,
        batch_size: int,
        *,
        shuffle: Optional[bool] = None,
        seed: int = 0,
        drop_last: Optional[bool] = None,
        max_batches: Optional[int] = None,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Epoch iterator of collated numpy batches."""
        shuffle = (self.mode == "train") if shuffle is None else shuffle
        drop_last = shuffle if drop_last is None else drop_last
        rng = np.random.RandomState(seed)
        order = np.arange(len(self.dataset))
        if shuffle:
            rng.shuffle(order)
        n = len(order)
        stop = n - (n % batch_size) if drop_last else n
        count = 0
        for start in range(0, stop, batch_size):
            idxs = order[start: start + batch_size]
            items = [self.item(int(i), rng) for i in idxs]
            batch: Dict[str, Any] = {}
            for key in items[0]:
                vals = [it[key] for it in items]
                if isinstance(vals[0], np.ndarray):
                    batch[key] = np.stack(vals)
                elif isinstance(vals[0], (int, np.integer)):
                    batch[key] = np.asarray(vals, np.int32)
                else:
                    batch[key] = vals          # e.g. paths
            yield batch
            count += 1
            if max_batches is not None and count >= max_batches:
                return


def build_data(cfg: Dict[str, Any], mode: str, seed: int = 0) -> UnSegData:
    """cfg['dataset'][mode] -> UnSegData (build.py:148-164 contract)."""
    d = cfg["dataset"][mode]
    return UnSegData(
        mode=mode,
        data_dir=d["data_dir"],
        dataset_name=d["dataset_name"],
        model_type=d.get("model_type", "vit_small"),
        crop_type=d.get("crop_type"),
        crop_ratio=d.get("crop_ratio", 0.5),
        loader_crop_type=d.get("loader_crop_type", "center"),
        res=d["res"],
        pos_images=(mode == "train"),
        num_neighbors=d.get("num_neighbors", 7) if mode == "train" else -1,
        seed=seed,
        nns_path=d.get("nns_path"),
    )
