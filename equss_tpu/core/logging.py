"""Metrics/logging sinks.

Replaces the reference's wandb + time_log stack
(/root/reference/utils/wandb_utils.py, utils/print_utils.py): a JSONL
sink that any dashboard can tail, stdout banners, and an optional wandb
passthrough when the package is available (it is not baked into the TPU
image, so it is strictly optional)."""
from __future__ import annotations

import datetime
import json
import os
import sys
from typing import Any, Dict, Optional


def time_log() -> str:
    ts = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
    return f"-------------------- {ts} --------------------"


class MetricsLogger:
    def __init__(self, save_dir: Optional[str] = None,
                 use_wandb: bool = False,
                 wandb_cfg: Optional[Dict[str, Any]] = None,
                 is_master: bool = True) -> None:
        self.is_master = is_master
        self.save_dir = save_dir
        self._file = None
        self._wandb = None
        if not is_master:
            return
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
            self._file = open(os.path.join(save_dir, "metrics.jsonl"), "a")
        if use_wandb:
            try:
                import wandb  # optional

                self._wandb = wandb
                wandb.init(**(wandb_cfg or {}))
            except ImportError:
                print("[logging] wandb not available; JSONL sink only")

    def log(self, metrics: Dict[str, Any], step: int) -> None:
        if not self.is_master:
            return
        record = {"step": step}
        for k, v in metrics.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                record[k] = v
        if self._file is not None:
            self._file.write(json.dumps(record) + "\n")
            self._file.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def banner(self, msg: str) -> None:
        if self.is_master:
            print(time_log(), flush=True)
            print(msg, flush=True)

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
        if self._wandb is not None:
            self._wandb.finish()


def count_params(tree) -> int:
    """Total parameter count (utils/param_utils.py:10-26)."""
    import jax

    return sum(x.size for x in jax.tree.leaves(tree))


def compute_param_norm(tree) -> float:
    """Global L2 norm over a param pytree (utils/param_utils.py:29-48)."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree.leaves(tree)
    if not leaves:
        return 0.0
    return float(jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves)))
