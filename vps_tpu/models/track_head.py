"""Track head (reference MaskTrack-RCNN-style,
/root/reference/mmdet/models/track_heads/track_head.py): two shared FCs on
flattened 7×7×256 ROI features of the current and reference frame, a
dot-product match matrix with a prepended all-zero "new object" column, and
`compute_comp_scores` combining match log-likelihood with bbox score / IoU /
label-consistency terms (match_coeff=[1.0, 2.0, 10.0]).

Static-shape version: the reference's per-image dynamic splits become fixed
capacities with validity masks; the dummy column is column 0, as in the
reference.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from vps_tpu.registry import HEADS


@HEADS.register
class TrackHead(nn.Module):
    num_fcs: int = 2
    in_channels: int = 256
    roi_feat_size: int = 7
    fc_out_channels: int = 1024
    match_coeff: Sequence[float] = (1.0, 2.0, 10.0)
    bbox_dummy_iou: float = 0.0

    @nn.compact
    def embed(self, x):
        """x: (N, 7, 7, C) ROI feats → (N, fc_out) embeddings (shared FCs)."""
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            x = nn.Dense(
                self.fc_out_channels,
                kernel_init=nn.initializers.normal(0.01),
                bias_init=nn.initializers.zeros,
                name=f"fc{i}",
            )(x)
            if i < self.num_fcs - 1:
                x = jax.nn.relu(x)
        return x

    def __call__(self, x, ref_x, ref_valid=None):
        """Match current ROIs against reference ROIs.

        x (N, 7, 7, C), ref_x (M, 7, 7, C); ref_valid (M,) masks padded ref
        slots. Returns match logits (N, M+1): column 0 = "new object" dummy
        (zero logit), invalid ref columns = -inf.
        """
        ex = self.embed(x)
        eref = self.embed(ref_x)
        prod = ex @ eref.T  # (N, M)
        if ref_valid is not None:
            prod = jnp.where(ref_valid[None, :], prod, -1e10)
        dummy = jnp.zeros((prod.shape[0], 1), prod.dtype)
        return jnp.concatenate([dummy, prod], axis=1)


def compute_comp_scores(
    match_ll, bbox_scores, bbox_ious, label_delta, match_coeff=(1.0, 2.0, 10.0),
    bbox_dummy_iou=0.0, add_bbox_dummy=True,
):
    """track_head.py:73-91: comprehensive matching score. All inputs (N, M)
    except match_ll (N, M+1); dummy column gets iou=bbox_dummy_iou, label
    delta=1."""
    n = match_ll.shape[0]
    if add_bbox_dummy:
        bbox_ious = jnp.concatenate(
            [jnp.full((n, 1), bbox_dummy_iou, bbox_ious.dtype), bbox_ious], axis=1
        )
        label_delta = jnp.concatenate(
            [jnp.ones((n, 1), label_delta.dtype), label_delta], axis=1
        )
    return (
        match_ll
        + match_coeff[0] * jnp.log(jnp.maximum(bbox_scores, 1e-12))
        + match_coeff[1] * bbox_ious
        + match_coeff[2] * label_delta
    )


def track_match_loss(match_logits, ids, id_weights):
    """track_head.py:135-174: weighted CE over match columns + match_acc.

    match_logits (N, M+1); ids (N,) target column (0 = new object); id_weights
    (N,) {0,1}. Invalid (padded) rows carry weight 0.
    """
    logp = jax.nn.log_softmax(match_logits, axis=-1)
    n_valid = jnp.sum(id_weights)
    ids_safe = jnp.clip(ids, 0, match_logits.shape[1] - 1)
    ll = jnp.take_along_axis(logp, ids_safe[:, None], axis=-1)[:, 0]
    loss = -jnp.sum(ll * id_weights) / jnp.maximum(n_valid, 1.0)
    pred = jnp.argmax(match_logits, axis=-1)
    acc = jnp.sum((pred == ids) * id_weights) / jnp.maximum(n_valid, 1.0)
    return loss, acc
