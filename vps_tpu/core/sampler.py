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

    # rank positives; only the first max_pos random positives are kept
    pos_key = jnp.where(is_pos, rp, jnp.inf)
    pos_rank = jnp.argsort(jnp.argsort(pos_key))  # rank of each elem
    kept_pos = is_pos & (pos_rank < max_pos)

    # combined priority: kept positives ∈ [0,1), negatives ∈ [1,2), rest +inf
    prio = jnp.where(kept_pos, rp, jnp.where(is_neg, 1.0 + rn, jnp.inf))
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
