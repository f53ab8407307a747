# VPSNet-Track ablation (tracking, no flow fusion) — reference
# configs/cityscapes/track.py.
_base_ = "fusetrack.py"

from vps_tpu import zoo  # noqa: E402

model = zoo.fusetrack_model_cfg(depth=50)
model["type"] = "PanopticTrack"
model.pop("extra_neck")
