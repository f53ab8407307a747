"""Loss primitives — pure jnp, mask-weighted, static-shape.

Replaces the reference's loss zoo (/root/reference/mmdet/models/losses/ and
the sigmoid_focal_loss CUDA op, mmdet/ops/sigmoid_focal_loss/). Every loss
takes an explicit per-element ``weight`` and an ``avg_factor`` so padded
(invalid) slots contribute exactly zero, the static-shape replacement for
the reference's dynamic filtering.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _reduce(loss, weight=None, avg_factor=None):
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        return jnp.sum(loss)
    return jnp.sum(loss) / jnp.maximum(avg_factor, 1e-6)


def smooth_l1_loss(pred, target, beta=1.0, weight=None, avg_factor=None):
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    return _reduce(loss, weight, avg_factor)


def softmax_cross_entropy(
    logits, labels, weight=None, avg_factor=None, ignore_index=None
):
    """logits (..., C), integer labels (...)."""
    num_classes = logits.shape[-1]
    labels_safe = jnp.clip(labels, 0, num_classes - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.take_along_axis(logp, labels_safe[..., None], axis=-1)[..., 0]
    if ignore_index is not None:
        keep = (labels != ignore_index).astype(loss.dtype)
        loss = loss * keep
        if avg_factor is None and weight is None:
            return jnp.sum(loss) / jnp.maximum(jnp.sum(keep), 1.0)
    return _reduce(loss, weight, avg_factor)


def binary_cross_entropy_with_logits(logits, targets, weight=None, avg_factor=None):
    # numerically-stable bce: max(x,0) - x*t + log(1+exp(-|x|))
    loss = (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return _reduce(loss, weight, avg_factor)


def sigmoid_focal_loss(
    logits, labels, gamma=2.0, alpha=0.25, weight=None, avg_factor=None
):
    """Per-anchor focal loss; labels are 1-based fg class ids, 0 = background
    (the reference CUDA op's convention, mmdet/ops/sigmoid_focal_loss/)."""
    num_classes = logits.shape[-1]
    # one-hot over foreground classes: class i ↔ label i+1
    t = jax.nn.one_hot(labels - 1, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    pt = p * t + (1 - p) * (1 - t)
    at = alpha * t + (1 - alpha) * (1 - t)
    ce = (
        jnp.maximum(logits, 0.0)
        - logits * t
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    loss = at * ((1 - pt) ** gamma) * ce
    loss = jnp.sum(loss, axis=-1)
    return _reduce(loss, weight, avg_factor)


def accuracy(logits, labels, valid=None):
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    if valid is not None:
        v = valid.astype(jnp.float32)
        return jnp.sum(correct * v) / jnp.maximum(jnp.sum(v), 1.0)
    return jnp.mean(correct)
