"""Random pos/neg sampler — static-shape replacement for the reference
RandomSampler (/root/reference/mmdet/core/bbox/samplers/random_sampler.py):
up to num·pos_fraction positives, negatives fill the remainder
(neg_pos_ub=-1). Output slots are ordered positives-first so downstream
heads can statically slice the positive prefix.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SampleResult(NamedTuple):
    inds: jnp.ndarray  # (num,) indices into the candidate set
    pos_mask: jnp.ndarray  # (num,) True for positive slots (a prefix)
    valid: jnp.ndarray  # (num,) slot validity
    num_pos: jnp.ndarray  # scalar int
    num_neg: jnp.ndarray  # scalar int


def _sample_by_priority(pos_prio, neg_prio, is_pos, is_neg, num, max_pos):
    """Shared slot selection: keep the `max_pos` best-priority positives
    (lower = keep first), fill the remainder with best-priority negatives.
    Positives occupy a slot prefix so heads can slice statically."""
    # rank positives; only the first max_pos are kept
    pk = jnp.where(is_pos, pos_prio, jnp.inf)
    pos_rank = jnp.argsort(jnp.argsort(pk))
    kept_pos = is_pos & (pos_rank < max_pos)

    # normalize priorities into disjoint bands: kept pos [0,1), neg [1,2)
    def _norm(p, mask):
        p = jnp.where(mask, p, 0.0)
        lo = jnp.min(jnp.where(mask, p, jnp.inf))
        hi = jnp.max(jnp.where(mask, p, -jnp.inf))
        rng = jnp.maximum(hi - lo, 1e-12)
        return jnp.clip((p - lo) / rng, 0.0, 1.0) * (1.0 - 1e-6)

    prio = jnp.where(
        kept_pos,
        _norm(pos_prio, kept_pos),
        jnp.where(is_neg, 1.0 + _norm(neg_prio, is_neg), jnp.inf),
    )
    order = jnp.argsort(prio)
    inds = order[:num]
    slot_prio = prio[inds]
    valid = jnp.isfinite(slot_prio)
    pos_mask = slot_prio < 1.0
    return SampleResult(
        inds.astype(jnp.int32),
        pos_mask,
        valid,
        jnp.sum(pos_mask.astype(jnp.int32)),
        jnp.sum((valid & ~pos_mask).astype(jnp.int32)),
    )


def random_sample(
    key,
    assigned_gt_inds,
    num: int,
    pos_fraction: float,
) -> SampleResult:
    """assigned_gt_inds: (N,) from max_iou_assign. Returns `num` slots."""
    n = assigned_gt_inds.shape[0]
    is_pos = assigned_gt_inds > 0
    is_neg = assigned_gt_inds == 0
    max_pos = int(num * pos_fraction)

    kp, kn = jax.random.split(key)
    rp = jax.random.uniform(kp, (n,))
    rn = jax.random.uniform(kn, (n,))
    return _sample_by_priority(rp, rn, is_pos, is_neg, num, max_pos)


def pseudo_sample(assigned_gt_inds, num: int) -> SampleResult:
    """PseudoSampler equivalent (samplers/pseudo_sampler.py): keep everything,
    no subsampling — here truncated to `num` slots, positives first."""
    n = assigned_gt_inds.shape[0]
    is_pos = assigned_gt_inds > 0
    is_neg = assigned_gt_inds == 0
    idx = jnp.arange(n, dtype=jnp.float32)
    return _sample_by_priority(idx, idx, is_pos, is_neg, num, num)


def ohem_sample(
    assigned_gt_inds,
    losses,
    num: int,
    pos_fraction: float,
    key=None,
) -> SampleResult:
    """OHEM (samplers/ohem_sampler.py): pick the `k` HARDEST candidates —
    highest current classification loss — instead of random ones. `losses`
    is the per-candidate loss from a preliminary head forward. Static-shape:
    hardness is just a sort priority (negated loss, lower = harder-first)."""
    is_pos = assigned_gt_inds > 0
    is_neg = assigned_gt_inds == 0
    max_pos = int(num * pos_fraction)
    hard = -losses
    return _sample_by_priority(hard, hard, is_pos, is_neg, num, max_pos)


def instance_balanced_sample(
    key,
    assigned_gt_inds,
    num: int,
    pos_fraction: float,
) -> SampleResult:
    """InstanceBalancedPosSampler (samplers/instance_balanced_pos_sampler.py):
    positives spread evenly across gt instances. Static form: per-gt random
    rank becomes the primary sort key so each gt contributes its ⌈k/G⌉ best
    slots before any gt contributes more."""
    n = assigned_gt_inds.shape[0]
    is_pos = assigned_gt_inds > 0
    is_neg = assigned_gt_inds == 0
    max_pos = int(num * pos_fraction)

    kp, kn = jax.random.split(key)
    rp = jax.random.uniform(kp, (n,))
    rn = jax.random.uniform(kn, (n,))

    # within-instance rank: how many same-gt candidates have smaller rp
    same_gt = (assigned_gt_inds[:, None] == assigned_gt_inds[None, :]) & is_pos[
        None, :
    ]
    within_rank = jnp.sum(same_gt & (rp[None, :] < rp[:, None]), axis=1)
    # primary key = within-instance rank → round-robin across instances
    pos_prio = within_rank.astype(jnp.float32) + rp * 0.999
    return _sample_by_priority(pos_prio, rn, is_pos, is_neg, num, max_pos)


def iou_balanced_neg_sample(
    key,
    assigned_gt_inds,
    max_overlaps,
    num: int,
    pos_fraction: float,
    floor_thr: float = -1.0,
    floor_fraction: float = 0.0,
    num_bins: int = 3,
    neg_iou_thr: float = 0.5,
) -> SampleResult:
    """IoUBalancedNegSampler (samplers/iou_balanced_neg_sampler.py, Libra
    R-CNN): negatives drawn evenly from IoU bins over [floor_thr, neg_iou_thr)
    so hard negatives aren't swamped by easy ones. Static form: per-bin random
    rank is the primary negative sort key (round-robin across bins)."""
    n = assigned_gt_inds.shape[0]
    is_pos = assigned_gt_inds > 0
    is_neg = assigned_gt_inds == 0
    max_pos = int(num * pos_fraction)

    kp, kn = jax.random.split(key)
    rp = jax.random.uniform(kp, (n,))
    rn = jax.random.uniform(kn, (n,))

    lo = max(floor_thr, 0.0)
    width = (neg_iou_thr - lo) / num_bins
    bin_idx = jnp.clip(
        jnp.floor((max_overlaps - lo) / max(width, 1e-12)), 0, num_bins - 1
    ).astype(jnp.int32)
    same_bin = (bin_idx[:, None] == bin_idx[None, :]) & is_neg[None, :]
    within_rank = jnp.sum(same_bin & (rn[None, :] < rn[:, None]), axis=1)
    neg_prio = within_rank.astype(jnp.float32) + rn * 0.999
    return _sample_by_priority(rp, neg_prio, is_pos, is_neg, num, max_pos)


def combined_sample(
    key,
    assigned_gt_inds,
    max_overlaps,
    num: int,
    pos_fraction: float,
    **neg_kwargs,
) -> SampleResult:
    """CombinedSampler (samplers/combined_sampler.py): instance-balanced
    positives + IoU-balanced negatives — the configuration Libra R-CNN uses."""
    n = assigned_gt_inds.shape[0]
    is_pos = assigned_gt_inds > 0
    is_neg = assigned_gt_inds == 0
    max_pos = int(num * pos_fraction)

    kp, kn = jax.random.split(key)
    rp = jax.random.uniform(kp, (n,))
    rn = jax.random.uniform(kn, (n,))

    same_gt = (assigned_gt_inds[:, None] == assigned_gt_inds[None, :]) & is_pos[
        None, :
    ]
    pos_rank = jnp.sum(same_gt & (rp[None, :] < rp[:, None]), axis=1)
    pos_prio = pos_rank.astype(jnp.float32) + rp * 0.999

    num_bins = neg_kwargs.get("num_bins", 3)
    neg_iou_thr = neg_kwargs.get("neg_iou_thr", 0.5)
    width = neg_iou_thr / num_bins
    bin_idx = jnp.clip(
        jnp.floor(max_overlaps / max(width, 1e-12)), 0, num_bins - 1
    ).astype(jnp.int32)
    same_bin = (bin_idx[:, None] == bin_idx[None, :]) & is_neg[None, :]
    neg_rank = jnp.sum(same_bin & (rn[None, :] < rn[:, None]), axis=1)
    neg_prio = neg_rank.astype(jnp.float32) + rn * 0.999
    return _sample_by_priority(pos_prio, neg_prio, is_pos, is_neg, num, max_pos)
