"""Orbax checkpointing.

Replaces the reference's master-only ``torch.save`` of
{model, 3x optimizer, 3x scheduler, best, epoch, iter, scaler}
(/root/reference/train.py:158-182) with Orbax: the full train-state
pytree (params, quantizer EMA buffers, three optimizer states, step and
best-metric metadata) is saved atomically and restored with
``strict`` structure matching.  Unlike the reference, this IS a real
mid-training resume (the reference's resume.checkpoint skips straight to
final eval, train.py:428-432)."""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 2) -> None:
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Dict[str, Any], *,
             metadata: Optional[Dict[str, Any]] = None,
             wait: bool = False) -> None:
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            **({"metadata": ocp.args.JsonSave(metadata)} if metadata else {}),
        )
        self._mgr.save(step, args=args)
        if wait:
            self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None,
                template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
        # an in-flight async save of the requested step must land first
        self._mgr.wait_until_finished()
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint in {self.directory}")
        if template is not None:
            args = ocp.args.Composite(
                state=ocp.args.StandardRestore(template))
        else:
            args = ocp.args.Composite(state=ocp.args.StandardRestore())
        out = self._mgr.restore(step, args=args)
        return out["state"]

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
