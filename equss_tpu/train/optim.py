"""Optimizer/scheduler builders.

Replaces the reference's build_optimizer / build_scheduler /
split_params_for_optimizer (/root/reference/build.py:72-145) with optax
transforms:

* adam ignores weight decay entirely (the reference passes only lr,
  build.py:102-107);
* adamw applies decay with a mask excluding quantizer params and all
  params with ndim <= 1 (bias/scale), mirroring build.py:72-95;
* schedulers: constant, or cosine annealing over
  max_epochs * iter_per_epoch // num_accum update steps (build.py:131-141);
* gradient accumulation via optax.MultiSteps (train.py:106-123's
  no_sync/step-every-k pattern).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax


# subtrees excluded from weight decay: quantizer params (the reference
# routes VectorQuantizer/EMAVectorQuantizer params to the no-wd group,
# build.py:77-80) and the CLUB encoder (excluded from the model optimizer
# entirely, build.py:81-82 — here it trains jointly, documented deviation,
# so at minimum it must not be decayed)
_NO_WD_SUBTREES = ("pq", "club_enc")


def wd_mask(params: Dict[str, Any]) -> Dict[str, Any]:
    """True where weight decay applies: ndim > 1, outside quantizer/club
    subtrees (build.py:72-95).  Passed as a CALLABLE mask to optax so it
    evaluates against the actual param tree at optimizer init."""

    def mask_tree(tree, excluded: bool):
        if isinstance(tree, dict):
            return {k: mask_tree(v, excluded or k in _NO_WD_SUBTREES)
                    for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            return type(tree)(mask_tree(v, excluded) for v in tree)
        return (not excluded) and jnp.ndim(tree) > 1

    return mask_tree(params, False)


def build_schedule(
    sched_cfg: Dict[str, Any],
    base_lr: float,
    iter_per_epoch: int,
    max_epochs: int,
    num_accum: int = 1,
) -> optax.Schedule:
    name = sched_cfg.get("name", "constant").lower()
    if name == "constant":
        factor = sched_cfg.get("factor", 1.0)
        return optax.constant_schedule(base_lr * factor)
    if name in ("cos", "cosine"):
        t_max = max(max_epochs * (iter_per_epoch // max(num_accum, 1)), 1)
        min_lr = sched_cfg.get("min_lr", 0.0)
        return optax.cosine_decay_schedule(
            base_lr, decay_steps=t_max, alpha=min_lr / max(base_lr, 1e-12)
        )
    raise ValueError(f"Unsupported scheduler type {name}")


def build_optimizer(
    opt_cfg: Dict[str, Any],
    sched_cfg: Optional[Dict[str, Any]] = None,
    *,
    iter_per_epoch: int = 1,
    max_epochs: int = 1,
    num_accum: int = 1,
    clip_grad: Optional[float] = None,
) -> optax.GradientTransformation:
    """cfg['optimizer'][x] + cfg['scheduler'][x] -> optax transform."""
    name = opt_cfg["name"].lower()
    lr = build_schedule(sched_cfg or {}, opt_cfg["lr"], iter_per_epoch,
                        max_epochs, num_accum)

    if name == "adam":
        core = optax.adam(lr)    # reference Adam takes lr only
    elif name == "adamw":
        b1, b2 = opt_cfg.get("betas", (0.9, 0.999))
        core = optax.adamw(
            lr, b1=b1, b2=b2,
            weight_decay=opt_cfg.get("weight_decay", 0.0),
            mask=wd_mask,    # callable: resolved against the real tree
        )
    elif name == "sgd":
        core = optax.sgd(lr, momentum=opt_cfg.get("momentum", 0.9))
        wd = opt_cfg.get("weight_decay", 0.0)
        if wd:
            core = optax.chain(
                optax.add_decayed_weights(wd, mask=wd_mask), core)
    else:
        raise ValueError(f"Unsupported optimizer type {name}")

    parts = []
    if clip_grad is not None and clip_grad > 0:
        parts.append(optax.clip_by_global_norm(clip_grad))
    parts.append(core)
    tx = optax.chain(*parts)
    if num_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=num_accum)
    return tx


def global_grad_norm(grads) -> jnp.ndarray:
    leaves = jax.tree.leaves(grads)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))
