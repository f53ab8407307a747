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


def mse_loss(pred, target, weight=None, avg_factor=None):
    """losses/mse_loss.py equivalent."""
    return _reduce((pred - target) ** 2, weight, avg_factor)


def balanced_l1_loss(
    pred, target, beta=1.0, alpha=0.5, gamma=1.5, weight=None, avg_factor=None
):
    """Libra R-CNN balanced L1 (losses/balanced_l1_loss.py): promotes
    inlier gradients. b chosen so the two branches join smoothly at beta."""
    diff = jnp.abs(pred - target)
    b = jnp.e ** (gamma / alpha) - 1.0
    loss = jnp.where(
        diff < beta,
        alpha / b * (b * diff + 1.0) * jnp.log1p(b * diff / beta) - alpha * diff,
        gamma * diff + gamma / b - alpha * beta,
    )
    return _reduce(loss, weight, avg_factor)


def iou_loss(pred, target, eps=1e-6, weight=None, avg_factor=None):
    """-log(IoU) loss over aligned (x1,y1,x2,y2) boxes (losses/iou_loss.py)."""
    ix1 = jnp.maximum(pred[..., 0], target[..., 0])
    iy1 = jnp.maximum(pred[..., 1], target[..., 1])
    ix2 = jnp.minimum(pred[..., 2], target[..., 2])
    iy2 = jnp.minimum(pred[..., 3], target[..., 3])
    inter = jnp.maximum(ix2 - ix1 + 1, 0) * jnp.maximum(iy2 - iy1 + 1, 0)
    ap = jnp.maximum(pred[..., 2] - pred[..., 0] + 1, 0) * jnp.maximum(
        pred[..., 3] - pred[..., 1] + 1, 0
    )
    at = jnp.maximum(target[..., 2] - target[..., 0] + 1, 0) * jnp.maximum(
        target[..., 3] - target[..., 1] + 1, 0
    )
    ious = inter / jnp.maximum(ap + at - inter, eps)
    loss = -jnp.log(jnp.clip(ious, eps, 1.0))
    return _reduce(loss, weight, avg_factor)


def bounded_iou_loss(pred, target, beta=0.2, eps=1e-3, weight=None, avg_factor=None):
    """Bounded IoU loss (losses/iou_loss.py:34, "Improving Localization
    Accuracy"): smooth-L1 over per-coordinate bounded IoU surrogates."""
    px = (pred[..., 0] + pred[..., 2]) * 0.5
    py = (pred[..., 1] + pred[..., 3]) * 0.5
    pw = pred[..., 2] - pred[..., 0] + 1.0
    ph = pred[..., 3] - pred[..., 1] + 1.0
    tx = (target[..., 0] + target[..., 2]) * 0.5
    ty = (target[..., 1] + target[..., 3]) * 0.5
    tw = target[..., 2] - target[..., 0] + 1.0
    th = target[..., 3] - target[..., 1] + 1.0

    dx = tx - px
    dy = ty - py
    loss_dx = 1.0 - jnp.maximum(
        (tw - 2.0 * jnp.abs(dx)) / (tw + 2.0 * jnp.abs(dx) + eps), 0.0
    )
    loss_dy = 1.0 - jnp.maximum(
        (th - 2.0 * jnp.abs(dy)) / (th + 2.0 * jnp.abs(dy) + eps), 0.0
    )
    loss_dw = 1.0 - jnp.minimum(tw / (pw + eps), pw / (tw + eps))
    loss_dh = 1.0 - jnp.minimum(th / (ph + eps), ph / (th + eps))
    comb = jnp.stack([loss_dx, loss_dy, loss_dw, loss_dh], axis=-1)
    loss = jnp.where(
        comb < beta, 0.5 * comb * comb / beta, comb - 0.5 * beta
    ).sum(axis=-1)
    return _reduce(loss, weight, avg_factor)


def giou_loss(pred, target, eps=1e-7, weight=None, avg_factor=None):
    """Generalized IoU loss."""
    ix1 = jnp.maximum(pred[..., 0], target[..., 0])
    iy1 = jnp.maximum(pred[..., 1], target[..., 1])
    ix2 = jnp.minimum(pred[..., 2], target[..., 2])
    iy2 = jnp.minimum(pred[..., 3], target[..., 3])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    ap = jnp.maximum(pred[..., 2] - pred[..., 0], 0) * jnp.maximum(
        pred[..., 3] - pred[..., 1], 0
    )
    at = jnp.maximum(target[..., 2] - target[..., 0], 0) * jnp.maximum(
        target[..., 3] - target[..., 1], 0
    )
    union = ap + at - inter + eps
    iou = inter / union
    cx1 = jnp.minimum(pred[..., 0], target[..., 0])
    cy1 = jnp.minimum(pred[..., 1], target[..., 1])
    cx2 = jnp.maximum(pred[..., 2], target[..., 2])
    cy2 = jnp.maximum(pred[..., 3], target[..., 3])
    area_c = jnp.maximum(cx2 - cx1, 0) * jnp.maximum(cy2 - cy1, 0) + eps
    giou = iou - (area_c - union) / area_c
    return _reduce(1.0 - giou, weight, avg_factor)


def ghm_c_loss(logits, labels, valid=None, bins=10, momentum=0.0, weight=None):
    """Gradient Harmonizing classification loss (losses/ghm_loss.py:22,
    GHM-C): BCE re-weighted by inverse gradient density. Static form: the
    histogram over |sigmoid(x) - t| is computed with one-hot bin membership
    (no dynamic indexing). `labels` are 1-based fg ids, 0 = background.
    Momentum (EMA of bin counts) is a training-state concern; the stateless
    per-batch density (momentum=0) is implemented, which is the published
    default behavior for a single step."""
    num_classes = logits.shape[-1]
    t = jax.nn.one_hot(labels - 1, num_classes, dtype=logits.dtype)
    if valid is None:
        v = jnp.ones(labels.shape, logits.dtype)
    else:
        v = valid.astype(logits.dtype)
    g = jnp.abs(jax.nn.sigmoid(logits) - t)  # gradient magnitude
    edges = jnp.linspace(0.0, 1.0, bins + 1)
    edges = edges.at[-1].add(1e-6)
    in_bin = (g[..., None] >= edges[:-1]) & (g[..., None] < edges[1:])
    in_bin = in_bin & (v[..., None, None] > 0)
    counts = jnp.sum(in_bin, axis=tuple(range(g.ndim)))  # (bins,)
    tot = jnp.maximum(jnp.sum(v) * num_classes, 1.0)
    density = jnp.where(counts > 0, counts / tot * jnp.sum(counts > 0), 1.0)
    w = jnp.sum(in_bin / jnp.maximum(density, 1e-12), axis=-1)  # inv density
    ce = (
        jnp.maximum(logits, 0.0)
        - logits * t
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    loss = ce * w * v[..., None]
    return jnp.sum(loss) / tot


def ghm_r_loss(pred, target, valid=None, mu=0.02, bins=10):
    """GHM-R regression loss (losses/ghm_loss.py:80): ASL1 base re-weighted
    by inverse gradient density, same static histogram trick."""
    diff = pred - target
    asl1 = jnp.sqrt(diff * diff + mu * mu) - mu
    g = jnp.abs(diff / jnp.sqrt(diff * diff + mu * mu))
    if valid is None:
        v = jnp.ones(pred.shape, pred.dtype)
    else:
        v = jnp.broadcast_to(valid[..., None], pred.shape).astype(pred.dtype)
    edges = jnp.linspace(0.0, 1.0, bins + 1)
    edges = edges.at[-1].add(1e3)
    in_bin = (g[..., None] >= edges[:-1]) & (g[..., None] < edges[1:])
    in_bin = in_bin & (v[..., None] > 0)
    counts = jnp.sum(in_bin, axis=tuple(range(g.ndim)))
    tot = jnp.maximum(jnp.sum(v), 1.0)
    density = jnp.where(counts > 0, counts / tot * jnp.sum(counts > 0), 1.0)
    w = jnp.sum(in_bin / jnp.maximum(density, 1e-12), axis=-1)
    return jnp.sum(asl1 * w * v) / tot


def accuracy(logits, labels, valid=None):
    pred = jnp.argmax(logits, axis=-1)
    correct = (pred == labels).astype(jnp.float32)
    if valid is not None:
        v = valid.astype(jnp.float32)
        return jnp.sum(correct * v) / jnp.maximum(jnp.sum(v), 1.0)
    return jnp.mean(correct)
