# VPSNet-Fuse ablation (flow fusion, no tracking) — reference
# configs/cityscapes/fuse.py.
_base_ = "fusetrack.py"

from vps_tpu import zoo  # noqa: E402

model = zoo.fusetrack_model_cfg(depth=50)
model["type"] = "PanopticFuse"
model.pop("track_head")
