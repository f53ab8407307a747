"""Optimizer + LR schedule (reference: SGD lr .005 mom .9 wd 1e-4, grad-clip
35/L2, linear warmup 500 iters ratio 1/3, step decay ×0.1 at epochs [8, 11];
configs/cityscapes/fusetrack.py:226-233, mmdet/apis/train.py:66-137).

Frozen subtrees (FlowNet2, and the stem/stage-1 of a frozen_stages backbone)
are masked out of the update entirely — matching torch semantics where
requires_grad=False parameters never enter the optimizer (so neither
momentum nor weight decay touches them).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import optax


def _frozen_path(path: Sequence[str], frozen_stages: int) -> bool:
    parts = [str(p) for p in path]
    joined = "/".join(parts)
    if "flownet2" in joined:
        return True
    if frozen_stages >= 0 and "backbone" in parts:
        i = parts.index("backbone")
        nxt = parts[i + 1] if i + 1 < len(parts) else ""
        if nxt in ("conv1", "bn1"):
            return True  # stem
        for s in range(1, frozen_stages + 1):
            if nxt.startswith(f"layer{s}_"):
                return True
    return False


def trainable_mask(params, frozen_stages: int = 1):
    """Pytree of bools: True where the parameter is trainable."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    vals = [
        not _frozen_path([getattr(k, "key", getattr(k, "name", k)) for k in path],
                         frozen_stages)
        for path, _ in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, vals)


def build_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    total_epochs: int,
    decay_epochs: Sequence[int] = (8, 11),
    warmup_iters: int = 500,
    warmup_ratio: float = 1.0 / 3.0,
    gamma: float = 0.1,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """mmcv StepLrUpdater w/ linear warmup: lr ramps from base·ratio to base
    over warmup_iters, then ×gamma at each decay epoch."""

    decay_steps = jnp.asarray([e * steps_per_epoch for e in decay_epochs])

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        n_decays = jnp.sum(step >= decay_steps.astype(jnp.float32))
        lr = base_lr * (gamma ** n_decays)
        # mmcv linear warmup: factor = 1 - (1 - k/warmup)·(1 - ratio)
        k = jnp.minimum(step, warmup_iters)
        wf = 1.0 - (1.0 - k / warmup_iters) * (1.0 - warmup_ratio)
        return jnp.where(step < warmup_iters, lr * wf, lr)

    return schedule


def build_optimizer(
    params,
    schedule,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    grad_clip: float = 35.0,
    frozen_stages: int = 1,
    skip_nonfinite: int = 8,
):
    """SGD+momentum+wd with global-norm clipping; frozen subtrees masked.

    ``skip_nonfinite`` > 0 wraps the whole chain in
    ``optax.apply_if_finite``: a step whose gradients contain inf/NaN is
    skipped entirely (params, momentum and step count untouched) instead of
    poisoning every parameter through the global-norm clip (one non-finite
    leaf makes the global norm NaN, which scales EVERY grad to NaN). This is
    the torch-AMP GradScaler skip-step semantics, which the reference relies
    on under fp16 (mmcv Fp16OptimizerHook); here bf16/TPU rounding can tip a
    transient warmup loss spike (measured: the track-head match CE hitting
    ~e2 on outlier batches) into an overflowing backward, so the guard is on
    by default for all training. After ``skip_nonfinite`` CONSECUTIVE bad
    steps the NaNs propagate, so genuine divergence still surfaces instead
    of silently spinning."""
    mask = trainable_mask(params, frozen_stages)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=schedule, momentum=momentum),
    )
    tx = optax.masked(tx, mask)
    if skip_nonfinite > 0:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=skip_nonfinite)
    return tx, mask
