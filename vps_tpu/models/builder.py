"""build_detector(cfg, train_cfg, test_cfg) — registry-driven construction
(reference /root/reference/mmdet/models/builder.py:44-45)."""

from __future__ import annotations

from vps_tpu.registry import DETECTORS, build_from_cfg


def build_detector(cfg, train_cfg=None, test_cfg=None):
    return build_from_cfg(
        cfg, DETECTORS, dict(train_cfg=train_cfg, test_cfg=test_cfg)
    )
