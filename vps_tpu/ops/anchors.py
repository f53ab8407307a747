"""Anchor generation — static shapes, computed once per feature-map size.

Matches the reference's generator including the legacy rounding and -1/+1
centering (/root/reference/mmdet/core/anchor/anchor_generator.py:18-72):
base anchors are centered at 0.5*(s-1) and rounded; grid anchors enumerate
shift-major (all A anchors of one location contiguous).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp


class AnchorGenerator:
    def __init__(
        self,
        base_size: float,
        scales: Sequence[float],
        ratios: Sequence[float],
        scale_major: bool = True,
        ctr: Tuple[float, float] = None,
    ):
        self.base_size = base_size
        self.scales = np.asarray(scales, np.float32)
        self.ratios = np.asarray(ratios, np.float32)
        self.scale_major = scale_major
        self.ctr = ctr
        self.base_anchors = self._gen_base_anchors()

    @property
    def num_base_anchors(self) -> int:
        return self.base_anchors.shape[0]

    def _gen_base_anchors(self) -> np.ndarray:
        w = h = self.base_size
        if self.ctr is None:
            x_ctr = 0.5 * (w - 1)
            y_ctr = 0.5 * (h - 1)
        else:
            x_ctr, y_ctr = self.ctr
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        if self.scale_major:
            ws = (w * w_ratios[:, None] * self.scales[None, :]).reshape(-1)
            hs = (h * h_ratios[:, None] * self.scales[None, :]).reshape(-1)
        else:
            ws = (w * self.scales[:, None] * w_ratios[None, :]).reshape(-1)
            hs = (h * self.scales[:, None] * h_ratios[None, :]).reshape(-1)
        base = np.stack(
            [
                x_ctr - 0.5 * (ws - 1),
                y_ctr - 0.5 * (hs - 1),
                x_ctr + 0.5 * (ws - 1),
                y_ctr + 0.5 * (hs - 1),
            ],
            axis=-1,
        )
        return np.round(base).astype(np.float32)

    def grid_anchors(self, featmap_size: Tuple[int, int], stride: int) -> jnp.ndarray:
        return grid_anchors(self.base_anchors, featmap_size, stride)

    def valid_flags(
        self, featmap_size: Tuple[int, int], valid_size: Tuple[int, int]
    ) -> jnp.ndarray:
        return valid_flags(featmap_size, valid_size, self.num_base_anchors)


def grid_anchors(base_anchors, featmap_size, stride) -> jnp.ndarray:
    """(feat_h*feat_w*A, 4) anchors; row-major over locations, A contiguous."""
    feat_h, feat_w = featmap_size
    base = jnp.asarray(base_anchors, jnp.float32)
    shift_x = jnp.arange(feat_w, dtype=jnp.float32) * stride
    shift_y = jnp.arange(feat_h, dtype=jnp.float32) * stride
    sx = jnp.tile(shift_x, feat_h)
    sy = jnp.repeat(shift_y, feat_w)
    shifts = jnp.stack([sx, sy, sx, sy], axis=-1)  # (K, 4)
    all_anchors = base[None, :, :] + shifts[:, None, :]
    return all_anchors.reshape(-1, 4)


def valid_flags(featmap_size, valid_size, num_base_anchors) -> jnp.ndarray:
    """Flags for anchors whose center location is inside the valid region
    (handles ÷32-padded batches where images have differing true sizes)."""
    feat_h, feat_w = featmap_size
    valid_h, valid_w = valid_size
    vx = jnp.arange(feat_w) < valid_w
    vy = jnp.arange(feat_h) < valid_h
    valid = (vy[:, None] & vx[None, :]).reshape(-1)
    return jnp.repeat(valid, num_base_anchors)
